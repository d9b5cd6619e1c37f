"""Output alignments of reads under a called genotype (SAM text).

Counterpart of reference model/bam.rs (which writes BAM via htslib; this
sandbox has no htslib/pysam, so we emit spec-conformant SAM that samtools
can convert).  Each recruited read pair is reported at its most frequently
chosen location across solver attempts, one record per mapped mate, with:
    CIGAR from the host traceback kernel re-run at the stored window
          (ops/traceback.py; exact same DP as the scoring kernel)
    MAPQ  from the assignment frequency (count_to_prob, bam.rs:54)
    XF:f  fraction of attempts choosing this location
    XW:f  read weight
"""
from __future__ import annotations

import numpy as np

from ..ops import align as A
from ..ops import traceback as T
from ..seq import dna
from ..utils.io import smart_create

_SAM_OPS = "=XIDS"


def assignment_frequencies(assignments: np.ndarray, n_slots: int):
    """assignments [A, R] slot indices -> (top_slot [R], freq [R])."""
    A_, R = assignments.shape
    counts = np.zeros((R, n_slots), np.int32)
    for a in range(A_):
        counts[np.arange(R), assignments[a]] += 1
    top = counts.argmax(axis=1)
    freq = counts[np.arange(R), top] / A_
    return top, freq


def _slot_to_cand(ra, hap: int, k: int, kh: int):
    """Replays LocusTensors.build's slot assignment to find the PairCand
    behind (hap, slot k)."""
    s = 0
    for c in ra.cands:
        if c.hap != hap:
            continue
        if s == k:
            return c
        s += 1
        if s >= kh:
            break
    return None


def _mate_record(codes, aln, hap_seq, score_vec, band):
    """Regenerates the mate's CIGAR at the stored window.  Returns
    (pos0, cigar_str, seq_str, reverse, end0) or None."""
    if aln is None or codes is None:
        return None
    oriented = codes if aln.fwd else dna.revcomp(codes)
    win = A.extract_windows(hap_seq, np.array([aln.ws]),
                            oriented.size + band)[0]
    out = T.align_cigar(oriented, win, band, score_vec)
    if out is None:
        return None
    ops, lens, info, _ = out
    start_p, end_p = int(info[0]), int(info[1])
    cig = "".join(f"{int(l)}{_SAM_OPS[int(o)]}" for o, l in zip(ops, lens))
    return (aln.ws + start_p, cig, dna.decode(oriented), not aln.fwd,
            aln.ws + end_p)


def write_all_sam(path, all_alns, read_pairs, hap_names, hap_lens, hap_seqs,
                  score_vec, band: int = 48) -> None:
    """Writes ALL candidate alignments of every modeled read to every
    haplotype (the reference's `--stop-after map` aln.bam stage,
    genotype.rs:1023-1074): one record per mapped mate per candidate, with
    traceback CIGARs; secondary candidates (per read, beyond its best one)
    carry FLAG 0x100.  XL:f is the candidate's pair ln-probability."""
    with smart_create(path) as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        for h, name in enumerate(hap_names):
            f.write(f"@SQ\tSN:{name}\tLN:{hap_lens[h]}\n")
        f.write("@PG\tID:locityper-tpu\tPN:locityper-tpu\n")
        for ra in all_alns.reads:
            c1, c2 = read_pairs[ra.read_ix]
            best = max((c.ln_prob for c in ra.cands), default=0.0)
            for c in ra.cands:
                sec = 0 if c.ln_prob >= best else 0x100
                rec1 = _mate_record(c1, c.aln1, hap_seqs[c.hap], score_vec,
                                    band)
                rec2 = _mate_record(c2, c.aln2, hap_seqs[c.hap], score_vec,
                                    band)
                paired = c2 is not None
                for mate_ix, rec, other in ((0, rec1, rec2), (1, rec2, rec1)):
                    if rec is None:
                        continue
                    pos0, cig, seq, rev, end0 = rec
                    flag = sec
                    if paired:
                        flag |= 0x1 | (0x40 if mate_ix == 0 else 0x80)
                        if other is None:
                            flag |= 0x8
                        else:
                            if other[3]:
                                flag |= 0x20
                            if other[3] != rev:
                                flag |= 0x2
                    if rev:
                        flag |= 0x10
                    rnext, pnext = ("=", other[0] + 1) if (paired and other) \
                        else ("*", 0)
                    f.write(f"{ra.name}\t{flag}\t{hap_names[c.hap]}\t"
                            f"{max(pos0, 0) + 1}\t0\t{cig}\t{rnext}\t{pnext}"
                            f"\t0\t{seq}\t*\tXL:f:{c.ln_prob:.3f}\t"
                            f"XW:f:{ra.weight:.3f}\n")


def write_sam(path, gt, tensors, hap_names, hap_lens, read_names,
              assignments: np.ndarray, read_weights=None, all_alns=None,
              read_pairs=None, hap_seqs=None, score_vec=None,
              band: int = 48) -> None:
    """Writes one SAM file for genotype `gt` = (h_0..h_{P-1}), any ploidy.

    tensors: model.assgn.LocusTensors; assignments: [A, R] final slot per
    attempt from the solver (slot layout: [s·Kh..(s+1)·Kh) = hap copy s,
    P·Kh = unmapped).  When `all_alns`/`read_pairs`/`hap_seqs`/`score_vec`
    are provided, records carry real CIGAR/POS/SEQ re-derived by the host
    traceback kernel; otherwise positions fall back to alignment middles.
    """
    kh = tensors.kh
    ploidy = len(gt)
    n_slots = ploidy * kh + 1
    top, freq = assignment_frequencies(assignments, n_slots)
    full = (all_alns is not None and read_pairs is not None
            and hap_seqs is not None and score_vec is not None)
    with smart_create(path) as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        for h in sorted(set(gt)):
            f.write(f"@SQ\tSN:{hap_names[h]}\tLN:{hap_lens[h]}\n")
        f.write("@PG\tID:locityper-tpu\tPN:locityper-tpu\n")
        for r, name in enumerate(read_names):
            slot = int(top[r])
            p = float(freq[r])
            mapq = min(int(round(-10.0 * np.log10(max(1.0 - p, 1e-6)))), 60)
            tags = f"XF:f:{p:.3f}"
            if read_weights is not None:
                tags += f"\tXW:f:{read_weights[r]:.3f}"
            if slot == ploidy * kh:
                f.write(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\t{tags}\n")
                continue
            hap = gt[slot // kh]
            k = slot % kh
            cand = None
            if full:
                cand = _slot_to_cand(all_alns.reads[r], hap, k, kh)
            if cand is not None:
                c1, c2 = read_pairs[all_alns.reads[r].read_ix]
                rec1 = _mate_record(c1, cand.aln1, hap_seqs[hap], score_vec,
                                    band)
                rec2 = _mate_record(c2, cand.aln2, hap_seqs[hap], score_vec,
                                    band)
                paired = c2 is not None
                for mate_ix, rec, other in ((0, rec1, rec2), (1, rec2, rec1)):
                    if rec is None:
                        continue
                    pos0, cig, seq, rev, end0 = rec
                    tlen = 0
                    if other is not None:
                        lo = min(pos0, other[0])
                        hi = max(end0, other[4])
                        tlen = (hi - lo) if pos0 <= other[0] else (lo - hi)
                    flag = 0
                    if paired:
                        flag |= 0x1 | (0x40 if mate_ix == 0 else 0x80)
                        if other is None:
                            flag |= 0x8
                        else:
                            if other[3]:
                                flag |= 0x20
                            if other[3] != rev:
                                flag |= 0x2
                    if rev:
                        flag |= 0x10
                    rnext, pnext = ("=", other[0] + 1) if (paired and other) \
                        else ("*", 0)
                    f.write(f"{name}\t{flag}\t{hap_names[hap]}\t"
                            f"{max(pos0, 0) + 1}\t{mapq}\t{cig}\t{rnext}\t"
                            f"{pnext}\t{tlen}\t{seq}\t*\t{tags}\n")
                if rec1 is not None or rec2 is not None:
                    continue
            # Fallback: middle-position record without CIGAR.
            mid1 = int(tensors.hap_mid[hap, r, k, 0])
            mid2 = int(tensors.hap_mid[hap, r, k, 1])
            pos = mid1 if mid1 >= 0 else mid2
            flag = 0 if mid1 >= 0 else 4
            f.write(f"{name}\t{flag}\t{hap_names[hap]}\t{max(pos, 0) + 1}\t"
                    f"{mapq}\t*\t*\t0\t0\t*\t*\t{tags}\n")
