"""Host-side banded traceback alignment producing extended CIGARs.

Role in the reference: WFA2-lib (seq/wfa.rs:121-347) + the CIGAR machinery
(seq/cigar.rs) produce per-base op strings for PAF cg:Z: tags
(seq/dist.rs:273-321) and output BAMs (model/bam.rs).  The device kernels
(ops/align.py, ops/align_pallas.py) deliberately carry only op COUNTS —
the likelihood model never needs per-base ops — so CIGAR production is a
host concern, served by the native C++ kernel (native/kernels.cpp
banded_align_cigar) with an exact-recurrence numpy fallback here.

Both paths implement the SAME recurrence and tie-breaking as the device
kernel, so scores agree with `ops.align.align_batch` and the op counts are
consistent with the reported payloads.
"""
from __future__ import annotations

import numpy as np

from .. import native

NEG = -1e30
OP_CHARS = "=XIDS"


def cigar_string(ops: np.ndarray, lens: np.ndarray) -> str:
    return "".join(f"{int(l)}{OP_CHARS[int(o)]}" for o, l in zip(ops, lens))


def _align_cigar_numpy(query: np.ndarray, twin: np.ndarray, band: int,
                       score_vec: np.ndarray):
    """Fallback twin of native banded_align_cigar (vectorized per row)."""
    m_sc, x_sc, i_sc, d_sc, c_sc = (float(s) for s in score_vec)
    qlen = query.size
    if qlen == 0 or twin.size < qlen + band:
        return None
    j_idx = np.arange(band)
    prev = np.zeros(band, np.float32)
    move = np.zeros((qlen + 1, band), np.uint8)    # base move 0/1/2
    djump = np.zeros((qlen + 1, band), np.int32)
    best_score, best_i, best_j = NEG, 0, 0
    for i in range(1, qlen + 1):
        r_c = query[i - 1]
        h_c = twin[i - 1:i - 1 + band]
        sub = np.where(h_c == r_c, np.float32(m_sc), np.float32(x_sc))
        sub = np.where((h_c < 4) & (r_c < 4), sub, np.float32(NEG))
        cur = prev + sub
        mv = np.zeros(band, np.uint8)
        ins_s = np.concatenate([prev[1:], [np.float32(NEG)]]) + np.float32(i_sc)
        take = ins_s > cur
        cur = np.where(take, ins_s, cur)
        mv = np.where(take, 1, mv).astype(np.uint8)
        clip_s = np.float32(c_sc) * np.float32(i)
        take = clip_s > cur
        cur = np.where(take, clip_s, cur)
        mv = np.where(take, 2, mv).astype(np.uint8)
        # Deletion pass (sequential; ties keep the local base).  All
        # arithmetic strictly f32 to match the native kernel's tie breaks.
        jdel = (j_idx.astype(np.float32) * np.float32(d_sc)).astype(np.float32)
        run = cur[0]
        origin = 0
        for j in range(1, band):
            adj = np.float32(cur[j] - jdel[j])
            if adj >= run:
                run = adj
                origin = j
            else:
                cur[j] = np.float32(run + jdel[j])
                djump[i, j] = j - origin
                mv[j] = mv[origin]
        move[i] = mv
        cand = cur + np.float32(c_sc) * np.float32(qlen - i)
        jb = int(np.argmax(cand))
        if float(cand[jb]) > best_score:
            best_score, best_i, best_j = float(cand[jb]), i, jb
        prev = cur
    if best_score <= NEG / 2:
        return None
    ops, lens = [], []

    def push(op, ln):
        if ops and ops[-1] == op:
            lens[-1] += ln
        else:
            ops.append(op)
            lens.append(ln)

    n_mism = n_ins = n_del = n_clip = 0
    if best_i < qlen:
        push(4, qlen - best_i)
        n_clip += qlen - best_i
    i, j = best_i, best_j
    start_p = 0
    while i > 0:
        dj = int(djump[i, j])
        if dj:
            push(3, dj)
            n_del += dj
            j -= dj
        mv = int(move[i, j])
        if mv == 0:
            mism = query[i - 1] != twin[i - 1 + j]
            push(1 if mism else 0, 1)
            n_mism += int(mism)
            i -= 1
        elif mv == 1:
            push(2, 1)
            n_ins += 1
            i -= 1
            j += 1
        else:
            push(4, i)
            n_clip += i
            start_p = i + j
            i, j = 0, -1
    if j >= 0:
        start_p = j
    ops_a = np.array(ops[::-1], np.int32)
    lens_a = np.array(lens[::-1], np.int32)
    info = np.array([start_p, best_i + best_j, n_mism, n_ins, n_del, n_clip],
                    np.int32)
    return ops_a, lens_a, info, best_score


def align_cigar(query: np.ndarray, twin: np.ndarray, band: int,
                score_vec: np.ndarray, max_cells: int = 1 << 28):
    """Banded traceback alignment of `query` against a target window `twin`
    (length >= qlen + band, pad code 4).  Returns (ops, lens, info, score)
    or None; native C++ when available, numpy fallback otherwise."""
    if (query.size + 1) * band > max_cells:
        return None
    if native.available():
        return native.banded_align_cigar(query.astype(np.int8), twin.astype(np.int8),
                                         band, score_vec, max_cells)
    return _align_cigar_numpy(query.astype(np.int8), twin.astype(np.int8),
                              band, np.asarray(score_vec, np.float32))
