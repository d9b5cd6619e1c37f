"""Genotyping model: read×haplotype likelihoods, windows, assignment tensors."""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LN10 = float(np.log(10.0))


@dataclass
class Params:
    """Model parameters (counterpart of reference model/mod.rs:63-198)."""
    boundary_size: int = 200
    lik_skew: float = 0.85
    prob_diff: float = 2.0 * LN10             # ln-space; log10 = 2 by default
    unmapped_penalty: float = -10.0 * LN10    # per-tech (model/mod.rs:55-60)
    complexity_k: int = 5
    poor_compl: float = 0.5
    poor_compl_edit: float = 0.7
    compl_weight_breakpoint: float = 0.5      # WeightCalculator(0.5, 4)
    compl_weight_power: float = 4.0
    kmers_weight_breakpoint: float = 0.2      # WeightCalculator(0.2, 4)
    kmers_weight_power: float = 4.0
    kmer_soft_thresh: int = 5
    kmer_hard_thresh: int = 1
    min_weight: float = 0.001
    tweak: int | None = None                  # None = auto: min(w/2, 200, boundary-1)
    alt_cn: tuple = (0.3, 2.0, 3.0, 4.0, 5.0)
    filt_diff: float = 100.0 * LN10
    prob_thresh: float = -4.0 * LN10
    dont_skip: bool = False
    # How many best genotypes get their read assignments written as real
    # BGZF BAM (model/bam.rs parity) / readable SAM.gz.  Both can be set:
    # each genotype's records are generated once and teed to both formats.
    out_bams: int = 0
    out_sams: int = 0
    # Alignment candidate search: band width of the DP kernel.  Long reads
    # accumulate indel drift along the diagonal, so the band scales with
    # technology (None = auto: 48 short reads, 160 long reads).
    band: int | None = None
    # MAX_USED_ALNS lives as a constant in model/locs.py (locs.rs:733).
    min_anchor_votes: int = 2

    @property
    def depth_contrib(self) -> float:
        return 1.0 + self.lik_skew

    @property
    def aln_contrib(self) -> float:
        return 1.0 - self.lik_skew

    def set_tweak_size(self, window_size: int) -> None:
        """(model/mod.rs:179-197)."""
        if self.tweak is None:
            self.tweak = min(int(round(window_size * 0.5)), 200,
                             max(self.boundary_size - 1, 0))
        assert self.tweak < self.boundary_size
