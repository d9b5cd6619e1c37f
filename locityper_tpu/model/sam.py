"""Output alignments of reads under a called genotype (SAM text).

Counterpart of reference model/bam.rs (which writes BAM via htslib; this
sandbox has no htslib/pysam, so we emit spec-conformant SAM that samtools
can convert).  Each recruited read is reported at its most frequently chosen
location across solver attempts, with:
    MAPQ  from the assignment frequency (count_to_prob, bam.rs:54)
    XF:f  fraction of attempts choosing this location
    XW:f  read weight
Positions are the alignment middles tracked by the model (full per-base
CIGARs are a host-side traceback planned for the next round; the likelihood
model never needs them, SURVEY.md §7).
"""
from __future__ import annotations

import numpy as np

from ..utils.io import smart_create


def assignment_frequencies(assignments: np.ndarray, n_slots: int):
    """assignments [A, R] slot indices -> (top_slot [R], freq [R])."""
    A, R = assignments.shape
    counts = np.zeros((R, n_slots), np.int32)
    for a in range(A):
        counts[np.arange(R), assignments[a]] += 1
    top = counts.argmax(axis=1)
    freq = counts[np.arange(R), top] / A
    return top, freq


def write_sam(path, gt, tensors, hap_names, hap_lens, read_names,
              assignments: np.ndarray, read_weights=None) -> None:
    """Writes one SAM file for genotype `gt` = (h1, h2).

    tensors: model.assgn.LocusTensors; assignments: [A, R] final slot per
    attempt from the solver (slot layout: [0..Kh) = h1, [Kh..2Kh) = h2,
    2Kh = unmapped).
    """
    kh = tensors.kh
    n_slots = 2 * kh + 1
    top, freq = assignment_frequencies(assignments, n_slots)
    with smart_create(path) as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        for h in sorted(set(gt)):
            f.write(f"@SQ\tSN:{hap_names[h]}\tLN:{hap_lens[h]}\n")
        f.write("@PG\tID:locityper-tpu\tPN:locityper-tpu\n")
        for r, name in enumerate(read_names):
            slot = int(top[r])
            p = float(freq[r])
            mapq = min(int(round(-10.0 * np.log10(max(1.0 - p, 1e-6)))), 60)
            if slot == 2 * kh:
                f.write(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\t"
                        f"XF:f:{p:.3f}\n")
                continue
            hap = gt[0] if slot < kh else gt[1]
            k = slot if slot < kh else slot - kh
            mid1 = int(tensors.hap_mid[hap, r, k, 0])
            mid2 = int(tensors.hap_mid[hap, r, k, 1])
            pos = mid1 if mid1 >= 0 else mid2
            flag = 0 if mid1 >= 0 else 4
            tags = f"XF:f:{p:.3f}"
            if read_weights is not None:
                tags += f"\tXW:f:{read_weights[r]:.3f}"
            f.write(f"{name}\t{flag}\t{hap_names[hap]}\t{max(pos, 0) + 1}\t"
                    f"{mapq}\t*\t*\t0\t0\t*\t*\t{tags}\n")
