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
