"""Dense per-locus tensors for the device solver.

Bridges model/locs.py (ragged per-read candidate lists) to ops/solver.py
(fixed-shape [H, R, Kh] tensors).  Counterpart of the reference's
GenotypeAlignments construction (model/assgn.rs:38-84), done once per locus
instead of once per genotype — genotype assembly happens on device as
gathers.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .locs import AllAlignments

NEG = -1e30


@dataclass
class LocusTensors:
    hap_prob: np.ndarray        # [H, R, Kh] f32, NEG = no candidate
    hap_mid: np.ndarray         # [H, R, Kh, 2] int32, -1 = unmapped mate
    unmapped_prob: np.ndarray   # [R_pad] f32
    n_haps: int
    n_reads: int                # REAL read count (arrays may be padded)
    kh: int

    @classmethod
    def build(cls, all_alns: AllAlignments, kh: int = 10,
              pad_reads: bool = True) -> "LocusTensors":
        """pad_reads: round R up to a power of two (min 64) with dummy
        always-unmapped reads so the solver compiles once per bucket, not
        once per locus.  Dummies have only the unmapped candidate (trivial),
        are never proposed as moves, and add a constant 0 to the likelihood.
        """
        H = all_alns.n_haps
        R_real = len(all_alns.reads)
        R = R_real
        if pad_reads:
            R = 64
            while R < R_real:
                R *= 2
        prob = np.full((H, R, kh), NEG, np.float32)
        mid = np.full((H, R, kh, 2), -1, np.int32)
        unm = np.zeros(R, np.float32)
        for r, ra in enumerate(all_alns.reads):
            unm[r] = ra.unmapped_prob
            slot = {}
            for c in ra.cands:      # sorted by (hap, -prob)
                s = slot.get(c.hap, 0)
                if s >= kh:
                    continue
                prob[c.hap, r, s] = c.ln_prob
                mid[c.hap, r, s, 0] = c.middle1
                mid[c.hap, r, s, 1] = c.middle2
                slot[c.hap] = s + 1
        return cls(prob, mid, unm, H, R_real, kh)
