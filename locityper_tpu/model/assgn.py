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

        Array-native path: candidate arrays are already grouped by
        (read, hap) with probs descending, so the slot index is the rank
        within each run — one vectorized scatter, no per-read Python.
        """
        H = all_alns.n_haps
        if hasattr(all_alns, "used_candidates"):
            cr, ch, cp, cm1, cm2 = all_alns.used_candidates()
            R_real = all_alns.n_used
            unm_used = all_alns.unmapped[all_alns.used_mask]
        else:   # object-path oracle (tests)
            return cls._build_from_objects(all_alns, kh, pad_reads)
        R = R_real
        if pad_reads:
            R = 64
            while R < R_real:
                R *= 2
        prob = np.full((H, R, kh), NEG, np.float32)
        mid = np.full((H, R, kh, 2), -1, np.int32)
        unm = np.zeros(R, np.float32)
        unm[:R_real] = unm_used
        if cr.size:
            gnew = np.ones(cr.size, bool)
            gnew[1:] = (cr[1:] != cr[:-1]) | (ch[1:] != ch[:-1])
            gstart = np.nonzero(gnew)[0]
            gsize = np.diff(np.concatenate([gstart, [cr.size]]))
            slot = np.arange(cr.size) - np.repeat(gstart, gsize)
            sel = slot < kh
            prob[ch[sel], cr[sel], slot[sel]] = cp[sel]
            mid[ch[sel], cr[sel], slot[sel], 0] = cm1[sel]
            mid[ch[sel], cr[sel], slot[sel], 1] = cm2[sel]
        return cls(prob, mid, unm, H, R_real, kh)

    @classmethod
    def _build_from_objects(cls, all_alns, kh: int = 10,
                            pad_reads: bool = True) -> "LocusTensors":
        """Per-read oracle twin of `build` over ReadAlns objects."""
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
