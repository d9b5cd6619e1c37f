"""Locus boundary expansion (add.rs:330-477 counterpart)."""
import numpy as np
import pytest

from locityper_tpu import sim
from locityper_tpu.commands.boundary import expand_locus, find_best_boundary
from locityper_tpu.seq.counts import GenomeKmerCounter


def make_genome(seed=0, n=60000, repeat_at=None, repeat_len=3000):
    rng = np.random.default_rng(seed)
    g = sim.random_genome(rng, n)
    if repeat_at is not None:
        # Duplicate a chunk so its k-mers are non-unique.
        src = g[1000:1000 + repeat_len]
        g[repeat_at:repeat_at + repeat_len] = src
    counter = GenomeKmerCounter(25)
    counter.add_seq(g)
    counter.finalize()
    return g, counter


class TestFindBestBoundary:
    def test_unique_region_picks_near_locus(self):
        g, counter = make_genome()
        # Left boundary for a locus starting at 30000; everything unique ->
        # the distance penalty should keep the boundary at the inner start.
        start, end = 25000, 30001
        counts = counter.seq_counts(g[start:30000 + 500])
        b = find_best_boundary(True, start, end, [], 25, counts, 5000)
        assert b == 30000

    def test_variant_blocks_boundary(self):
        g, counter = make_genome()
        start, end = 29990, 30001
        counts = counter.seq_counts(g[start:30000 + 500])
        # Variant covering the whole candidate range (start == end case).
        assert find_best_boundary(True, 29995, 29995, [(29990, 30001)], 25,
                                  counts, 5000) is None
        # Variant in the middle: boundary avoids it.
        b = find_best_boundary(True, start, end, [(29994, 29998)], 25,
                               counts, 5000)
        assert b is not None
        assert not (29994 <= b < 29998)

    def test_repeat_pushes_boundary_out(self):
        # Locus start sits inside a duplicated (non-unique) region: the
        # boundary should move left into unique sequence.
        g, counter = make_genome(repeat_at=29000, repeat_len=2000)
        start, end = 26000, 30001
        counts = counter.seq_counts(g[start:30000 + 500])
        b = find_best_boundary(True, start, end, [], 25, counts, 4000)
        assert b is not None
        assert b < 29000  # escaped the repeat


class TestExpandLocus:
    def test_noop_for_unique_locus(self):
        g, counter = make_genome()
        res = expand_locus(g, 30000, 34000, counter)
        assert res is not None
        s, e = res
        assert s == 30000 and e == 34000

    def test_expands_away_from_repeat(self):
        g, counter = make_genome(repeat_at=29500, repeat_len=1500)
        res = expand_locus(g, 30000, 34000, counter, allowed_expansion=6000)
        assert res is not None
        s, e = res
        assert s < 29500          # moved out of the repeat
        assert e == 34000

    def test_n_runs_limit_expansion(self):
        g, counter = make_genome()
        g2 = g.copy()
        g2[27000:27100] = 4       # N block left of the locus
        res = expand_locus(g2, 30000, 34000, counter, allowed_expansion=6000)
        assert res is not None
        s, e = res
        assert s >= 27100
