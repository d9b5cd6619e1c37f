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


def test_chunk_boundary_framing(tmp_path):
    """Silent-truncation regression (round 5, found at 100-locus scale):
    when a record's trailing newline lands EXACTLY on the parser chunk
    boundary, the orphan '\\n' at the next chunk's head made the native
    parser consume nothing and the stream ended after ~13k of 1M pairs.
    Sweep chunk sizes so every record/boundary alignment occurs."""
    import numpy as np
    from locityper_tpu.seq import fastx

    rng = np.random.default_rng(5)
    n = 40
    reads1, reads2, names = [], [], []
    with open(tmp_path / "a1.fq", "w") as f1, \
            open(tmp_path / "a2.fq", "w") as f2:
        for i in range(n):
            L = int(rng.integers(3, 20))
            r1 = rng.integers(0, 4, L, dtype=np.int8)
            r2 = rng.integers(0, 4, L + 1, dtype=np.int8)
            names.append(f"rd{i:03d}")
            reads1.append(r1)
            reads2.append(r2)
            fastx.write_fastq(f1, fastx.Read(names[-1], r1))
            fastx.write_fastq(f2, fastx.Read(names[-1], r2))

    def collect():
        got_names, got1, got2 = [], [], []
        for nm, m1, l1, m2, l2, count in fastx.fast_paired_batches(
                str(tmp_path / "a1.fq"), str(tmp_path / "a2.fq"),
                batch=7, max_len=192):
            for j in range(count):
                got_names.append(nm[j])
                got1.append(m1[j, :l1[j]].copy())
                got2.append(m2[j, :l2[j]].copy())
        return got_names, got1, got2

    orig = fastx._CHUNK_BYTES
    try:
        for chunk in list(range(24, 90)) + [1 << 22]:
            fastx._CHUNK_BYTES = chunk
            got_names, got1, got2 = collect()
            assert got_names == names, f"chunk={chunk}: lost records"
            for a, b in zip(got1, reads1):
                np.testing.assert_array_equal(a, b)
            for a, b in zip(got2, reads2):
                np.testing.assert_array_equal(a, b)
    finally:
        fastx._CHUNK_BYTES = orig
