"""Exact ILP read assignment via scipy's bundled HiGHS.

Counterpart of the reference's optional HiGHS/Gurobi solvers
(solvers/highs.rs:38-134, gurobi.rs): binary variable per read-location with
one-hot per-read rows, per-window depth encoded as a one-hot over depth
values coupled to the assignment sums, objective = aln_contrib·Σ x·lnp +
depth_contrib·Σ y·lnP(depth).

Role here: an exact *verification oracle* for the massively parallel
annealer (the reference keeps ILP optional for the same reason,
SURVEY.md §2.2) and an optional `ilp` stage for small genotype sets.
Windows are deterministic (tweak = 0) so the objective matches the device
solver's likelihood exactly.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import LinearConstraint, milp
from scipy.sparse import lil_matrix

from ..ops.solver import DEPTH_CAP, NEG, REG_WINDOW_SHIFT, BOUNDARY_WINDOW, \
    UNMAPPED_WINDOW, MIN_WINDOW_WEIGHT


def assemble_genotype_host(gt, tensors, pack, bayes, prob_diff):
    """Host (numpy, deterministic) twin of ops/solver._gather_candidates +
    window mapping with tweak = 0, for ANY ploidy P = len(gt)
    (genotype.rs:1077-1108).  Returns (probs [R, K = P·Kh + 1],
    wins [R, K, 2], valid [R, K], win_gc [W], win_weight [W])."""
    P = len(gt)
    ps = [tensors.hap_prob[h] for h in gt]
    ms = [tensors.hap_mid[h] for h in gt]
    unm = (tensors.unmapped_prob if tensors.unmapped_prob.ndim == 1
           else tensors.unmapped_prob[gt[0]])
    R = ps[0].shape[0]
    probs = np.concatenate(ps + [unm[:, None]], axis=1)
    mids = np.concatenate(ms + [np.full((R, 1, 2), -1, ms[0].dtype)], axis=1)
    slots = np.concatenate(
        [np.full_like(p, s, dtype=np.int32) for s, p in enumerate(ps)]
        + [np.zeros((R, 1), np.int32)], axis=1)
    best = unm
    for p in ps:
        best = np.maximum(best, p.max(1))
    valid = probs >= (best - prob_diff)[:, None]
    probs = np.where(valid, probs, NEG)

    wsize = pack.window_size
    max_w = pack.max_windows
    hap = np.array(gt)[np.clip(slots, 0, P - 1)]
    n = pack.n_windows[hap][..., None]
    reg = pack.reg_start[hap][..., None]
    wshift = (REG_WINDOW_SHIFT + slots * max_w)[..., None]
    w = (mids - reg) // wsize
    inside = (mids >= reg) & (w >= 0) & (w < n)
    wins = np.where(inside, w + wshift, BOUNDARY_WINDOW)
    wins = np.where(mids < 0, UNMAPPED_WINDOW, wins).astype(np.int32)

    W = 2 + P * max_w
    win_gc = np.zeros(W, np.int32)
    win_weight = np.zeros(W, np.float32)
    for s in range(P):
        h = gt[s]
        nw = pack.n_windows[h]
        starts = pack.reg_start[h] + wsize * np.arange(max_w)
        pos = np.clip(starts, 0, pack.contig_len[h] - 1)
        gc = pack.gc_at[h, pos]
        wt = pack.weight_at[h, pos]
        active = np.arange(max_w) < nw
        wt = np.where(active, wt, 0.0)
        wt = np.where(wt < MIN_WINDOW_WEIGHT, 0.0, wt)
        off = 2 + s * max_w
        win_gc[off:off + max_w] = gc
        win_weight[off:off + max_w] = wt
    return probs, wins, valid, win_gc, win_weight


def likelihood_of_assignment(assignment, probs, wins, win_gc, win_weight,
                             bayes, depth_contrib, aln_contrib):
    """Objective value for a full assignment (assgn.rs:346-354)."""
    R = probs.shape[0]
    aln = probs[np.arange(R), assignment].sum()
    W = win_gc.size
    depth = np.zeros(W, np.int64)
    w_asg = wins[np.arange(R), assignment]
    np.add.at(depth, w_asg.reshape(-1), 1)
    d = np.minimum(depth, DEPTH_CAP - 1)
    dep = float(np.sum(win_weight * bayes[win_gc, d]))
    return depth_contrib * dep + aln_contrib * float(aln)


def solve_ilp(gt, tensors, pack, bayes, params, time_limit=60.0):
    """Exact max-likelihood assignment for one genotype; returns
    (assignment [R], likelihood)."""
    probs, wins, valid, win_gc, win_weight = assemble_genotype_host(
        gt, tensors, pack, bayes, params.prob_diff)
    R, K = probs.shape
    W = win_gc.size

    # Variables: x[r, k] for valid candidates; y[w, d] depth one-hots for
    # non-trivial windows.
    x_index = {}
    for r in range(R):
        for k in range(K):
            if valid[r, k]:
                x_index[(r, k)] = len(x_index)
    nx = len(x_index)

    # Max depth per window = number of (read, cand) pairs touching it ×2.
    touch = [set() for _ in range(W)]
    for (r, k) in x_index:
        for m in range(2):
            touch[wins[r, k, m]].add(r)
    nontrivial = [w for w in range(W) if win_weight[w] > 0]
    y_index = {}
    for w in nontrivial:
        dmax = 2 * len(touch[w])
        for d in range(dmax + 1):
            y_index[(w, d)] = nx + len(y_index)
    nvar = nx + len(y_index)

    c = np.zeros(nvar)
    for (r, k), i in x_index.items():
        c[i] = -params.aln_contrib * probs[r, k]
    for (w, d), i in y_index.items():
        dd = min(d, DEPTH_CAP - 1)
        c[i] = -params.depth_contrib * win_weight[w] * bayes[win_gc[w], dd]

    rows = []
    # One-hot per read.
    A = lil_matrix((0, nvar))
    cons = []
    a_eq = lil_matrix((R, nvar))
    for (r, k), i in x_index.items():
        a_eq[r, i] = 1.0
    cons.append(LinearConstraint(a_eq.tocsr(), 1.0, 1.0))
    # One-hot per window + depth coupling.
    n_w = len(nontrivial)
    a_hot = lil_matrix((n_w, nvar))
    a_dep = lil_matrix((n_w, nvar))
    for wi, w in enumerate(nontrivial):
        for (ww, d), i in y_index.items():
            if ww == w:
                a_hot[wi, i] = 1.0
                a_dep[wi, i] = float(d)
        for (r, k), i in x_index.items():
            cnt = int(wins[r, k, 0] == w) + int(wins[r, k, 1] == w)
            if cnt:
                a_dep[wi, i] -= float(cnt)
    cons.append(LinearConstraint(a_hot.tocsr(), 1.0, 1.0))
    cons.append(LinearConstraint(a_dep.tocsr(), 0.0, 0.0))

    res = milp(c, constraints=cons, integrality=np.ones(nvar),
               options=dict(time_limit=time_limit))
    assert res.success, f"ILP failed: {res.message}"
    xsol = res.x[:nx]
    assignment = np.zeros(R, np.int32)
    for (r, k), i in x_index.items():
        if xsol[i] > 0.5:
            assignment[r] = k
    lik = likelihood_of_assignment(assignment, probs, wins, win_gc,
                                   win_weight, bayes, params.depth_contrib,
                                   params.aln_contrib)
    return assignment, lik
