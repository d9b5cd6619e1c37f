"""Unit tests for model-layer internals."""
import numpy as np
import pytest

from locityper_tpu import sim
from locityper_tpu.model.locs import HapMinimizerIndex
from locityper_tpu.seq.contigs import ContigSet


class TestCandidatesBatch:
    def test_matches_scalar_path(self):
        rng = np.random.default_rng(0)
        locus = sim.simulate_locus(rng, length=3000, n_haps=4, divergence=0.02)
        cset = ContigSet("x", locus.hap_names, locus.haplotypes)
        idx = HapMinimizerIndex(cset, 15, 10)
        reads = sim.simulate_paired_reads(
            rng, locus.haplotypes[:2], depth=3.0)
        mates = reads.reads1[:50] + reads.reads2[:50]
        batch = idx.candidates_batch(mates, 10, 48, 2, 3)
        for i, m in enumerate(mates):
            scalar = idx.candidates(m, 10, 48, 2, 3)
            assert sorted(batch[i]) == sorted(scalar), f"mate {i}"

    def test_empty_and_unmatched(self):
        rng = np.random.default_rng(1)
        locus = sim.simulate_locus(rng, length=2000, n_haps=2)
        cset = ContigSet("x", locus.hap_names, locus.haplotypes)
        idx = HapMinimizerIndex(cset, 15, 10)
        bg = sim.random_genome(rng, 150)
        out = idx.candidates_batch([bg, locus.haplotypes[0][100:250]], 10, 48, 2, 3)
        assert out[0] == []
        assert len(out[1]) >= 1


class TestAnchorVotesNative:
    def test_native_matches_numpy_exactly(self, monkeypatch):
        """Native anchor_votes must reproduce the numpy grouping path
        bit-for-bit, including output order and diag rounding."""
        from locityper_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(5)
        locus = sim.simulate_locus(rng, length=4000, n_haps=6,
                                   divergence=0.03)
        cset = ContigSet("x", locus.hap_names, locus.haplotypes)
        idx = HapMinimizerIndex(cset, 15, 10)
        reads = sim.simulate_paired_reads(rng, locus.haplotypes[:3],
                                          depth=4.0,
                                          errors=sim.ErrorModel(0.01, 0.001,
                                                                0.001))
        mates = reads.reads1[:120] + reads.reads2[:120] \
            + [sim.random_genome(rng, 150) for _ in range(20)]
        nat = idx.candidates_batch_flat(mates, 10, 48, 2, 3)
        monkeypatch.setattr(native, "available", lambda: False)
        ref = idx.candidates_batch_flat(mates, 10, 48, 2, 3)
        for a, b, name in zip(nat, ref, ("read", "hap", "orient", "diag")):
            np.testing.assert_array_equal(a, b, err_msg=name)
