"""`align` command: pairwise haplotype alignment producing PAF.

Counterpart of reference command/align.rs + seq/dist.rs: all-vs-all
haplotype alignment.  The reference chains LCSk++ anchors and fills gaps
with WFA (dist.rs:195-243); here each pair is aligned with the batched
banded kernel at the minimizer-consensus diagonal (wide band), with a
minimizer-Jaccard pre-filter for hopeless pairs (dist.rs:16-40).
"""
from __future__ import annotations

from itertools import combinations
from pathlib import Path

import numpy as np

from ..ops import align as A
from ..ops import traceback as T
from ..seq import fastx
from ..seq.kmers import jaccard_distance, minimizers, sorted_minimizer_set
from ..utils.io import smart_create
from ..utils.logging import get_logger

logger = get_logger("align")


def add_args(p):
    p.add_argument("-i", "--input", required=True, help="Haplotype FASTA")
    p.add_argument("-o", "--output", required=True, help="Output PAF(.gz)")
    p.add_argument("--max-div", type=float, default=0.5,
                   help="Skip pairs with minimizer divergence above this")
    p.add_argument("--band", type=int, default=256)
    p.add_argument("-A", "--all-pairs", action="store_true",
                   help="Align all pairs (default: all-vs-all anyway)")
    return p


def consensus_diagonal(seq1, seq2, k=15, w=10):
    """Most-voted diagonal from shared minimizers (seeding stage of
    dist.rs:115-133 without full chaining)."""
    p1, v1, _ = minimizers(seq1, k, w)
    p2, v2, _ = minimizers(seq2, k, w)
    order2 = np.argsort(v2, kind="stable")
    v2s, p2s = v2[order2], p2[order2]
    lo = np.searchsorted(v2s, v1, "left")
    hi = np.searchsorted(v2s, v1, "right")
    diags = []
    for t in range(v1.size):
        for e in range(int(lo[t]), int(hi[t])):
            diags.append(int(p2s[e]) - int(p1[t]))
    if not diags:
        return None
    diags = np.array(diags)
    # Vote in 64bp buckets, then average the winning bucket.
    buckets, counts = np.unique(diags // 64, return_counts=True)
    win = buckets[np.argmax(counts)]
    sel = diags[diags // 64 == win]
    return int(np.mean(sel))


def align_pair(seq1, seq2, score_vec, band):
    """Aligns seq1 (query) against seq2 (target) at the consensus diagonal
    with full traceback (host kernel, ops/traceback.py — the WFA/cigar role
    of dist.rs:195-243)."""
    diag = consensus_diagonal(seq1, seq2)
    if diag is None:
        return None
    L = seq1.size
    base = diag - band // 2
    # The window covers seq2 with the consensus diagonal centered in the band.
    win = A.extract_windows(seq2, np.array([base]), L + band)[0]
    out = T.align_cigar(seq1, win, band, score_vec)
    if out is None:
        return None
    ops, lens, info, score = out
    start_p, end_p, n_mism, n_ins, n_del, n_clip = (int(x) for x in info)
    # Trim CIGAR head/tail soft-clip into query interval; clamp the target
    # interval to real sequence (the window pads outside with 4s).
    q_start = int(lens[0]) if len(ops) and ops[0] == 4 else 0
    q_end = L - (int(lens[-1]) if len(ops) and ops[-1] == 4 else 0)
    return dict(ops=ops, lens=lens, score=score, n_mism=n_mism, n_ins=n_ins,
                n_del=n_del, n_clip=n_clip, q_start=q_start, q_end=q_end,
                t_start=base + start_p, t_end=base + end_p)


def paf_row(name1, seq1, name2, seq2, r):
    L1, L2 = seq1.size, seq2.size
    matches = (r["q_end"] - r["q_start"]) - r["n_mism"] - r["n_ins"]
    aln_len = matches + r["n_mism"] + r["n_ins"] + r["n_del"]
    edit = r["n_mism"] + r["n_ins"] + r["n_del"]
    dv = edit / max(aln_len, 1)
    # cg:Z: excludes soft-clips (PAF convention: query interval covers them).
    cg = "".join(f"{int(l)}{T.OP_CHARS[int(o)]}"
                 for o, l in zip(r["ops"], r["lens"]) if int(o) != 4)
    return (f"{name1}\t{L1}\t{r['q_start']}\t{r['q_end']}\t+\t{name2}\t{L2}"
            f"\t{max(r['t_start'], 0)}\t{min(r['t_end'], L2)}\t{matches}"
            f"\t{aln_len}\t60\tNM:i:{edit}\tAS:f:{r['score']:.2f}"
            f"\tdv:f:{dv:.6f}\tcg:Z:{cg}")


def run(args):
    named = [(r.name, r.seq) for r in fastx.read_fastx_auto(args.input)]
    logger.info("Aligning %d haplotypes all-vs-all", len(named))
    sets = [sorted_minimizer_set(s, 15, 10) for _, s in named]
    sc = A.Scores.from_error_rates(0.01, 0.002, 0.002)
    score_vec = np.array(sc.astuple(), np.float32)
    n_rows = 0
    with smart_create(args.output) as f:
        for i, j in combinations(range(len(named)), 2):
            _, div = jaccard_distance(sets[i], sets[j])
            if div > args.max_div:
                continue
            r = align_pair(named[i][1], named[j][1], score_vec, args.band)
            if r is None:
                continue
            f.write(paf_row(named[i][0], named[i][1], named[j][0],
                            named[j][1], r) + "\n")
            n_rows += 1
    logger.info("Wrote %d PAF rows to %s", n_rows, args.output)
    return 0
