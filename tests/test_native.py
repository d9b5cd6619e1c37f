"""Native C++ kernels must match the numpy reference implementations."""
import numpy as np
import pytest

from locityper_tpu import native, sim
from locityper_tpu.seq import dna
from locityper_tpu.seq import kmers as K

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestNativeKmers:
    def test_canonical_kmers_parity(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            seq = sim.random_genome(rng, 500)
            if trial % 2:
                seq[rng.integers(0, 500, 10)] = 4  # sprinkle Ns
            for k in (15, 25, 31):
                nk, nf, nv = native.canonical_kmers(seq, k)
                pk, pf, pv = K._canonical_kmers_numpy(seq, k)
                np.testing.assert_array_equal(nv, pv)
                np.testing.assert_array_equal(nk, pk)
                # forward flags only matter at valid positions
                np.testing.assert_array_equal(nf[nv], pf[pv])

    def test_minimizers32_parity(self):
        rng = np.random.default_rng(1)
        for trial in range(6):
            seq = sim.random_genome(rng, 800)
            if trial % 2:
                seq[rng.integers(0, 800, 20)] = 4
            np_pos, np_hash, np_fwd = K.minimizers32(seq, 15, 10)
            nt_pos, nt_hash, nt_fwd = native.minimizers32(seq, 15, 10)
            np.testing.assert_array_equal(nt_pos, np_pos)
            np.testing.assert_array_equal(nt_hash, np_hash)
            np.testing.assert_array_equal(nt_fwd, np_fwd)


class TestNativeFastq:
    def test_parse_buffer(self):
        buf = (b"@read1 extra\nACGT\n+\nIIII\n"
               b"@read2\nGGGTTT\n+\nIIIIII\n")
        codes, lens, names, consumed, max_seen = native.parse_fastq_buffer(
            buf, 8, 10)
        assert names == ["read1", "read2"]
        assert lens.tolist() == [4, 6]
        assert dna.decode(codes[0][:4]) == "ACGT"
        assert dna.decode(codes[1][:6]) == "GGGTTT"
        assert consumed == len(buf)
        assert max_seen == 6

    def test_incomplete_record(self):
        buf = b"@read1\nACGT\n+\nIIII\n@read2\nGGG"
        codes, lens, names, consumed, max_seen = native.parse_fastq_buffer(
            buf, 8, 10)
        assert names == ["read1"]
        assert consumed == 19  # only the first record is complete

    def test_max_seen_reports_clipping(self):
        buf = b"@long\n" + b"A" * 20 + b"\n+\n" + b"I" * 20 + b"\n"
        codes, lens, names, consumed, max_seen = native.parse_fastq_buffer(
            buf, 8, 10)
        assert lens.tolist() == [8]       # stored length is clipped...
        assert max_seen == 20             # ...but the true length surfaces
