"""Background-region windows: creation and filtering.

Counterpart of reference bg/windows.rs: windows of `window_size` bp centered
in the region (minus boundaries); windows are dropped when their padded
neighbourhood contains Ns or when less than `uniq_kmer_perc`% of its k-mers
have genome count ≤ 1 (:44-100).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..seq import dna


@dataclass
class BgWindows:
    region_start: int                 # window grid start (absolute)
    window_size: int
    neighb_size: int
    starts: np.ndarray                # absolute window starts
    gc: np.ndarray                    # GC% per window neighbourhood
    keep: np.ndarray                  # bool per window

    def __len__(self):
        return self.starts.size

    def keep_middle(self, middles: np.ndarray) -> np.ndarray:
        """True where an alignment middle falls into a kept window."""
        w = (middles - self.region_start) // self.window_size
        ok = (middles >= self.region_start) & (w < self.starts.size)
        out = np.zeros(middles.shape, dtype=bool)
        out[ok] = self.keep[w[ok]]
        return out

    @classmethod
    def create(cls, region_seq: np.ndarray, region_start: int,
               genome_kmer_counts: np.ndarray, kmer_k: int,
               window_size: int, neighb_size: int, boundary_size: int,
               uniq_kmer_frac: float = 0.9) -> "BgWindows":
        """genome_kmer_counts: genome-wide count per k-mer position of the
        region sequence (GenomeKmerCounter.seq_counts)."""
        n = region_seq.size
        assert n >= window_size + 2 * boundary_size, "Region too short"
        n_windows = (n - 2 * boundary_size) // window_size
        sum_len = n_windows * window_size
        local_start = (n - sum_len) // 2
        starts = local_start + window_size * np.arange(n_windows)

        left_pad = (neighb_size - window_size) // 2
        right_pad = neighb_size - window_size - left_pad
        gc = np.full(n_windows, np.nan)
        keep = np.zeros(n_windows, dtype=bool)
        for i, s in enumerate(starts):
            lo = max(int(s) - left_pad, 0)
            hi = min(int(s) + window_size + right_pad, n)
            neighb = region_seq[lo:hi]
            if dna.has_n(neighb):
                continue
            gc[i] = dna.gc_content(neighb)
            hi2 = max(hi + 1 - kmer_k, lo + 1)
            counts = genome_kmer_counts[lo:hi2]
            inv_quant1 = float(np.mean(counts <= 1)) if counts.size else 0.0
            keep[i] = inv_quant1 >= uniq_kmer_frac
        return cls(region_start + local_start, window_size, neighb_size,
                   region_start + starts, gc, keep)
