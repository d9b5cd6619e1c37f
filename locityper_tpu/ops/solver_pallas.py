"""Pallas TPU kernel for the read-assignment annealer.

The XLA sequential chain (ops/solver.py) costs ~0.24 ms/step because every
step round-trips the chain state through HBM.  This kernel keeps the whole
state of TB = 128 chains (lanes) resident in VMEM for the entire run.

Layouts are strictly 2D (Mosaic rejects 3D reductions):
  probs   [K·R, TB] f32   candidate ln-probs, k-major blocks of R rows,
                          PRE-PERMUTED so valid candidates occupy slots
                          [0, vcount)
  winpk   [K·R, TB] i32   window pair packed w1 | w2 << 16
  wtabf   [W·D, TB] f32   weight·lnBayes(depth) flattened (w·D + d)
  vcount, nt_ixs [R, TB]; ntc [1, TB]
  state:  assgn [R, TB] i32, depth [W, TB] i32,
          cache [W, TB] f32 = wtabf at the CURRENT depth of each window
          (so an unchanged window costs a cheap [W, TB] gather, and only
          moved windows pay the [W·D, TB] flat table lookup).

Per-lane "gathers" (unsupported by Mosaic) are masked reductions:
value at per-lane row r = Σ_rows (iota == r)·x.  RNG: pltpu.prng_random_bits
(NOTE: stubbed to zeros in interpret mode — dynamics are validated on
hardware against the exact ILP optimum).

Semantics mirror ops/solver._chain (random other candidate of a random
non-trivial read; Metropolis under linear cooling; greedy polish after);
the final likelihood is recomputed from the end state.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .solver import (NEG, SolverConfig, _compact_valid, _gather_candidates,
                     _read_windows, _window_tables)

HI16 = 1 << 16
M16 = 0xFFFF


def _u01(shape):
    """Uniform [0,1) f32 from raw PRNG bits (bitcast: the raw bits may come
    back as signed int32, and an arithmetic shift would sign-extend)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic cannot cast uint32->f32; the top 24 bits fit in positive int32.
    top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _randint(shape, bound):
    """Uniform integers in [0, bound) (bound: array, >0)."""
    u = _u01(shape)
    return jnp.minimum((u * bound.astype(jnp.float32)).astype(jnp.int32),
                       bound - 1)


def _kernel(seed_ref, cool_ref, probs_ref, winpk_ref, vcount_ref, nt_ref,
            ntc_ref, wtabf_ref, assgn0_ref, depth0_ref, cache0_ref,
            lik_out, assgn_out,
            *, R: int, K: int, W: int, TB: int, n_steps: int,
            anneal_steps: int, dc: float, ac: float, D_TAB: int,
            plato: int = 0, ln_init_prob: float = -0.6931472):
    """plato > 0 enables the reference's plateau semantics
    (stoch.rs:196-240): a per-lane counter of consecutive non-accepted
    (anneal phase) / non-improving (polish phase) moves freezes a lane at
    `plato` and the whole block exits early once every lane is frozen.
    Likelihood diffs within min_diff = 1e-6·max|Δ| count as float noise
    (minimum_allowed_diff, stoch.rs:27-29; 1e-6 not 1e-10 — the kernel
    accumulates in f32).  plato = 0 keeps the fixed-step walk."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, TB), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
    iota_wd = jax.lax.broadcasted_iota(jnp.int32, (W * D_TAB, TB), 0)

    vcount = vcount_ref[:]
    ntc = ntc_ref[:]
    start_temp = cool_ref[:]         # [1, TB] per-chain T0 (stoch.rs:195-226)
    assgn = assgn0_ref[:]
    depth = depth0_ref[:]
    cache = cache0_ref[:]
    wtabf = wtabf_ref[:]

    def sel_r(arr2, r):
        """arr2 [R, TB] at per-lane row r -> [1, TB]."""
        return jnp.sum(jnp.where(iota_r == r, arr2, 0), axis=0)[None, :]

    def sel_rf(arr2, r):
        return jnp.sum(jnp.where(iota_r == r, arr2, 0.0), axis=0)[None, :]

    # Per-lane float-noise floor (stoch.rs:27-29): start_temp was set as
    # -max_abs / ln(init_prob), so max_abs = start_temp * (-ln_init_prob).
    min_diff = jnp.maximum(start_temp * jnp.float32(-ln_init_prob) * 1e-6,
                           1e-10) if plato else jnp.zeros_like(start_temp)

    def step(s, carry):
        assgn, depth, cache, stale = carry
        t = _randint((1, TB), ntc)
        r = sel_r(nt_ref[:], t)
        rmask = iota_r == r
        cur = jnp.sum(jnp.where(rmask, assgn, 0), axis=0)[None, :]
        vc = jnp.sum(jnp.where(rmask, vcount, 0), axis=0)[None, :]
        i = 1 + _randint((1, TB), jnp.maximum(vc - 1, 1))
        new = jnp.where(i <= cur, i - 1, i)

        # Candidate data: loop over static k blocks, select by slot.
        p_cur = jnp.zeros((1, TB), jnp.float32)
        p_new = jnp.zeros((1, TB), jnp.float32)
        wp_cur = jnp.zeros((1, TB), jnp.int32)
        wp_new = jnp.zeros((1, TB), jnp.int32)
        for k in range(K):
            pk = sel_rf(probs_ref[k * R:(k + 1) * R], r)
            wk = sel_r(winpk_ref[k * R:(k + 1) * R], r)
            p_cur = jnp.where(cur == k, pk, p_cur)
            p_new = jnp.where(new == k, pk, p_new)
            wp_cur = jnp.where(cur == k, wk, wp_cur)
            wp_new = jnp.where(new == k, wk, wp_new)

        w1 = wp_cur & M16
        w2 = (wp_cur >> 16) & M16
        w3 = wp_new & M16
        w4 = (wp_new >> 16) & M16

        # Shared-window cascade (assgn.rs:259-284).
        c1 = jnp.full((1, TB), -1, jnp.int32)
        e21 = w2 == w1
        c2 = jnp.where(e21, 0, -1)
        c1 = c1 + jnp.where(e21, -1, 0)
        e31, e32 = w3 == w1, w3 == w2
        c3 = jnp.where(e31 | e32, 0, 1)
        c1 = c1 + jnp.where(e31, 1, 0)
        c2 = c2 + jnp.where(~e31 & e32, 1, 0)
        e41, e42, e43 = w4 == w1, w4 == w2, w4 == w3
        c4 = jnp.where(e41 | e42 | e43, 0, 1)
        c1 = c1 + jnp.where(e41, 1, 0)
        c2 = c2 + jnp.where(~e41 & e42, 1, 0)
        c3 = c3 + jnp.where(~e41 & ~e42 & e43, 1, 0)

        def atomic(w, c):
            """Returns (delta, new_val) for window w with depth change c."""
            wmask = iota_w == w
            d0 = jnp.sum(jnp.where(wmask, depth, 0), axis=0)[None, :]
            cur_v = jnp.sum(jnp.where(wmask, cache, 0.0), axis=0)[None, :]
            d1 = jnp.clip(d0 + c, 0, D_TAB - 1)
            idx = w * D_TAB + d1
            new_v = jnp.sum(jnp.where(iota_wd == idx, wtabf, 0.0),
                            axis=0)[None, :]
            delta = jnp.where(c == 0, 0.0, new_v - cur_v)
            return delta, new_v

        dd1, nv1 = atomic(w1, c1)
        dd2, nv2 = atomic(w2, c2)
        dd3, nv3 = atomic(w3, c3)
        dd4, nv4 = atomic(w4, c4)
        delta = ac * (p_new - p_cur) + dc * (dd1 + dd2 + dd3 + dd4)

        s_rem = jnp.maximum(anneal_steps - s, 0).astype(jnp.float32)
        temp = start_temp * s_rem / max(anneal_steps, 1)
        u = _u01((1, TB))
        if plato:
            # Reference accept rules (stoch.rs:211-240): anneal phase
            # tests delta - min_diff (>= 0 or Metropolis); polish phase
            # accepts strictly improving moves only.  Frozen lanes
            # (stale >= plato) stop moving but keep drawing in lockstep.
            diffm = delta - min_diff
            metro = (temp > 0) & (u <= jnp.exp(
                diffm / jnp.maximum(temp, 1e-30)))
            # Boolean algebra, not jnp.where: Mosaic cannot legalize
            # select on i1 vectors (arith.select<i1> — kernel hazard list
            # in BENCH_NOTES).
            in_anneal = s < anneal_steps
            acc_phase = ((in_anneal & ((diffm >= 0) | metro))
                         | (~in_anneal & (delta > min_diff)))
            accept = acc_phase & (stale < plato)
            stale = jnp.where(accept, 0, stale + 1)
        else:
            metro = (temp > 0) & (u <= jnp.exp(
                delta / jnp.maximum(temp, 1e-30)))
            accept = (delta >= 0) | metro
        inc = jnp.where(accept, 1, 0)

        depth = depth + ((iota_w == w3).astype(jnp.int32)
                         + (iota_w == w4) - (iota_w == w1)
                         - (iota_w == w2)) * inc
        for w, c, nv in ((w1, c1, nv1), (w2, c2, nv2), (w3, c3, nv3),
                         (w4, c4, nv4)):
            upd = (iota_w == w) & accept & (c != 0)
            cache = jnp.where(upd, nv, cache)
        assgn = jnp.where(rmask & accept, new, assgn)
        return assgn, depth, cache, stale

    stale0 = jnp.zeros((1, TB), jnp.int32)
    if plato:
        # Block-level early exit: once EVERY lane in the block is frozen
        # (or the step budget is spent) the remaining steps are no-ops —
        # stop paying for them.  Grid blocks exit independently.  The
        # exit condition (a cross-lane min + scalar compare) is checked
        # every CHECK steps, not every step: per-step checking measured
        # ~8% slower than the fixed fori walk (BENCH_NOTES r5), while
        # quantized checking is free and costs at most CHECK extra steps.
        CHECK = 128

        def w_cond(carry):
            s, _, _, _, stale = carry
            return jnp.logical_and(s < n_steps, jnp.min(stale) < plato)

        def w_body(carry):
            s, assgn, depth, cache, stale = carry

            def inner(ds, c):
                a, d, ch, st = c
                return step(s + ds, (a, d, ch, st))

            assgn, depth, cache, stale = jax.lax.fori_loop(
                0, jnp.minimum(CHECK, n_steps - s), inner,
                (assgn, depth, cache, stale))
            return s + CHECK, assgn, depth, cache, stale

        _, assgn, depth, cache, _ = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), assgn, depth, cache, stale0))
    else:
        def f_body(s, carry):
            assgn, depth, cache, stale = carry
            return step(s, (assgn, depth, cache, stale))

        assgn, depth, cache, _ = jax.lax.fori_loop(
            0, n_steps, f_body, (assgn, depth, cache, stale0))

    # Final likelihood from the end state: depth part = Σ cache (cache holds
    # the exact current table value per window); aln part = Σ_r
    # probs[r, assgn[r]] as K masked column-reduces.  (The old per-read
    # fori_loop of R sequential [1, TB] selects was ~0.1-0.2 s/call at
    # R=512 — it, not the annealing steps, dominated HLA stage-1 time;
    # BENCH_NOTES round 5.)
    dep = jnp.sum(cache, axis=0)[None, :]
    aln = jnp.zeros((1, TB), jnp.float32)
    for k in range(K):
        aln = aln + jnp.sum(
            jnp.where(assgn == k, probs_ref[k * R:(k + 1) * R], 0.0),
            axis=0)[None, :]
    lik_out[:] = dc * dep + ac * aln
    assgn_out[:] = assgn


def _permute_k(x, vorder):
    """x[..., vorder] as K static masked selects — the candidate axis is
    tiny (K = P·Kh+1), and per-element XLA gathers are the dominant cost
    of chain preparation on relay-attached chips (BENCH_NOTES r3)."""
    K = x.shape[-1]
    out = None
    for j in range(K):
        term = jnp.where(vorder == j, x[..., j][..., None], 0)
        out = term if out is None else out + term
    return out


def _prepare_chains(key, genotypes, attempts, hap_prob, hap_mid,
                    unmapped_prob, pack_nwin, pack_regstart, pack_len, gc_at,
                    weight_at, bayes, cfg: SolverConfig, max_windows: int,
                    random_init: bool, k_eff: int | None = None,
                    init_assgn=None):
    """Builds per-chain tensors (XLA, one-time per stage).

    Split in two vmaps: the expensive candidate gather/permute depends only
    on the GENOTYPE and is computed once and repeated across attempts;
    only the randomly-tweaked window tables and the chain init are
    per-attempt (the key-dependent part)."""
    D_TAB = cfg.d_tab

    def per_gt(gt):
        probs, mids, slots, valid = _gather_candidates(
            hap_prob, hap_mid, unmapped_prob, gt, cfg.prob_diff)
        vorder, vcount = _compact_valid(valid)
        probs_p = _permute_k(probs, vorder)
        # Permute mids/slots here too: _read_windows is elementwise over
        # [R, K], so permuted inputs give permuted outputs — the
        # per-attempt path then needs no K² selects at all.
        mids_p = jnp.stack([_permute_k(mids[..., 0], vorder),
                            _permute_k(mids[..., 1], vorder)], axis=-1)
        slots_p = _permute_k(slots, vorder)
        if k_eff is not None and k_eff < probs_p.shape[-1]:
            # Valid-first permutation: every valid candidate sits below
            # the host-computed cap (solve.py _candidate_k_cap), so the
            # dropped tail is all-NEG padding — bit-identical walks with
            # a smaller per-step candidate loop and VMEM feed.
            probs_p = probs_p[:, :k_eff]
            mids_p = mids_p[:, :k_eff]
            slots_p = slots_p[:, :k_eff]
        nontrivial = vcount > 1
        ntc = jnp.maximum(jnp.sum(nontrivial), 1).astype(jnp.int32)
        nt_ixs = jnp.argsort(~nontrivial, stable=True).astype(jnp.int32)
        vp = jnp.where(probs_p > NEG / 2, probs_p, jnp.nan)
        spread = jnp.nanmax(vp, 1) - jnp.nanmin(vp, 1)
        max_abs = jnp.nan_to_num(jnp.nanmax(spread), nan=1.0) \
            * cfg.aln_contrib + 10.0
        start_temp = jnp.maximum(-max_abs / jnp.log(cfg.init_prob), 1e-5)
        # probs feed emitted directly in kernel layout ([K*R] k-major,
        # chain axis LAST via vmap out_axes): the old [C, R, K] ->
        # [K*R, C] transpose of the two K*R-row feeds was ~0.2 s per
        # 512-lane call at HLA shapes — the dominant stage-1 cost
        # (step/chunk-count independent; BENCH_NOTES round 5).
        probs_feed = probs_p.T.reshape(-1)
        return (probs_feed, probs_p, mids_p, slots_p, vcount, nt_ixs, ntc,
                start_temp)

    G = genotypes.shape[0]
    (probs_feed_g, probs_g, mids_g, slots_g, vcount_g, nt_g, ntc_g,
     temp_g) = jax.vmap(per_gt, out_axes=(-1, 0, 0, 0, 0, 0, 0, 0))(
        genotypes)

    rep = lambda x: jnp.repeat(x, attempts, axis=0)  # noqa: E731
    gts_rep = rep(genotypes)
    keys_flat = jax.random.split(key, G * attempts)

    def per_attempt(k, gt, probs_p, mids, slots, vcount, init_row=None):
        kw, kr = jax.random.split(k)
        win_gc, win_weight = _window_tables(
            kw, gt, pack_nwin, pack_regstart, pack_len, gc_at, weight_at,
            cfg.window_size, cfg.tweak, max_windows)
        wins = _read_windows(kr, gt, mids, slots, pack_nwin, pack_regstart,
                             cfg.window_size, cfg.tweak, max_windows)
        winpk = wins[..., 0] | (wins[..., 1] << 16)
        # bayes row lookup as a one-hot matmul (exact: one unit term per
        # row) — the [W] row gather lowered to slow per-element gathers
        # on this chip (BENCH_NOTES round 5).
        onehot = (win_gc[:, None]
                  == jnp.arange(bayes.shape[0])[None, :]).astype(bayes.dtype)
        wtab = win_weight[:, None] * (onehot @ bayes[:, :D_TAB])  # [W, D]
        if init_row is not None:
            # Caller-provided warm start (e.g. the previous stage's best
            # assignment, permuted slot space); clipped to the valid set.
            assgn0 = jnp.clip(init_row.astype(jnp.int32), 0,
                              jnp.maximum(vcount - 1, 0))
        elif random_init:
            u = jax.random.uniform(jax.random.fold_in(kw, 7),
                                   (vcount.shape[0],))
            assgn0 = jnp.minimum((u * vcount).astype(jnp.int32),
                                 jnp.maximum(vcount - 1, 0))
        else:
            assgn0 = jnp.argmax(probs_p, axis=1).astype(jnp.int32)
        wp0 = jnp.sum(jnp.where(
            assgn0[:, None] == jnp.arange(winpk.shape[1])[None, :],
            winpk, 0), axis=1)
        w1_0 = wp0 & M16
        w2_0 = (wp0 >> 16) & M16
        W = wtab.shape[0]
        wix = jnp.arange(W, dtype=jnp.int32)
        depth0 = (jnp.sum(w1_0[:, None] == wix[None, :], axis=0)
                  + jnp.sum(w2_0[:, None] == wix[None, :], axis=0)
                  ).astype(jnp.int32)
        cache0 = jnp.take_along_axis(
            wtab, jnp.clip(depth0, 0, D_TAB - 1)[:, None], axis=1)[:, 0]
        # The two big per-attempt feeds also leave in kernel layout
        # (chain axis last; see per_gt).
        return winpk.T.reshape(-1), wtab.reshape(-1), assgn0, depth0, cache0

    out_ax = (-1, -1, 0, 0, 0)
    if init_assgn is not None:
        init_flat = init_assgn.reshape(G * attempts, -1)
        winpk_feed, wtab_feed, assgn0, depth0, cache0 = jax.vmap(
            per_attempt, out_axes=out_ax)(
            keys_flat, gts_rep, rep(probs_g), rep(mids_g), rep(slots_g),
            rep(vcount_g), init_flat)
    else:
        winpk_feed, wtab_feed, assgn0, depth0, cache0 = jax.vmap(
            per_attempt, out_axes=out_ax)(
            keys_flat, gts_rep, rep(probs_g), rep(mids_g), rep(slots_g),
            rep(vcount_g))
    rep_last = lambda x: jnp.repeat(x, attempts, axis=-1)  # noqa: E731
    return (rep_last(probs_feed_g), winpk_feed, rep(vcount_g), rep(nt_g),
            rep(ntc_g), wtab_feed, rep(temp_g), assgn0, depth0, cache0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_attempts", "max_windows", "random_init",
                     "n_steps", "tb", "k_eff", "plato"))
def solve_genotypes_pallas(key, genotypes, hap_prob, hap_mid, unmapped_prob,
                           pack_nwin, pack_regstart, pack_len, gc_at,
                           weight_at, bayes, cfg: SolverConfig,
                           n_attempts: int, max_windows: int,
                           n_steps: int | None = None,
                           random_init: bool = True, tb: int = 128,
                           k_eff: int | None = None, plato: int = 0,
                           init_assgn=None):
    """Pallas counterpart of ops.solver.solve_genotypes.
    Returns (liks [G, A], assignments [G, A, R] in PERMUTED slot space —
    see _prepare_chains; use liks for ranking).

    init_assgn: optional [G, A, R] warm-start assignments in the SAME
    permuted slot space the kernel returns (stage-to-stage seeding —
    slot permutations are deterministic per genotype, so a previous
    stage's output rows feed directly).

    tb: chains per grid block (lane-block width).  Grid blocks run
    SEQUENTIALLY on the core, so wider blocks trade per-step vector work
    for fewer sequential passes — chip-measured in
    extra/profile_solver_tb.py."""
    TB = tb
    G = genotypes.shape[0]
    C = G * n_attempts
    pad = (-C) % TB
    n_steps = n_steps or (cfg.anneal_steps + cfg.polish_steps)

    kp, kk = jax.random.split(key)
    (probs_t, winpk_t, vcount, nt_ixs, ntc, wtabf_t, start_temp, assgn0,
     depth0, cache0) = _prepare_chains(
        kp, genotypes, n_attempts, hap_prob, hap_mid, unmapped_prob,
        pack_nwin, pack_regstart, pack_len, gc_at, weight_at, bayes, cfg,
        max_windows, random_init, k_eff=k_eff, init_assgn=init_assgn)
    # The K*R- and W*D-row feeds arrive in kernel layout (chain axis
    # LAST — see _prepare_chains); only the small R/W-row state arrays
    # are transposed here (~1 MB per call).
    if pad:
        def padc(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

        def padl(x):
            return jnp.concatenate(
                [x, jnp.repeat(x[..., -1:], pad, axis=-1)], axis=-1)
        probs_t, winpk_t, wtabf_t = map(padl, (probs_t, winpk_t, wtabf_t))
        (vcount, nt_ixs, ntc, start_temp, assgn0, depth0, cache0) = map(
            padc, (vcount, nt_ixs, ntc, start_temp, assgn0, depth0,
                   cache0))
    Cp = C + pad
    R = vcount.shape[1]
    K = probs_t.shape[0] // R
    D_TAB = cfg.d_tab
    W = wtabf_t.shape[0] // D_TAB

    vcount_t = jnp.transpose(vcount, (1, 0))
    nt_t = jnp.transpose(nt_ixs, (1, 0))
    ntc_t = ntc[None, :]
    assgn0_t = jnp.transpose(assgn0, (1, 0))
    depth0_t = jnp.transpose(depth0, (1, 0))
    cache0_t = jnp.transpose(cache0, (1, 0))
    seed = jax.random.randint(kk, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    cool = start_temp[None, :].astype(jnp.float32)      # [1, Cp] per chain

    kernel = functools.partial(
        _kernel, R=R, K=K, W=W, TB=TB, n_steps=n_steps,
        anneal_steps=cfg.anneal_steps, dc=float(cfg.depth_contrib),
        ac=float(cfg.aln_contrib), D_TAB=D_TAB,
        plato=(plato if plato and plato < n_steps else 0),
        ln_init_prob=float(np.log(cfg.init_prob)))
    grid = (Cp // TB,)

    def vspec(rows):
        return pl.BlockSpec((rows, TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    lik, assgn = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec(1),
            vspec(K * R), vspec(K * R), vspec(R), vspec(R), vspec(1),
            vspec(W * D_TAB), vspec(R), vspec(W), vspec(W),
        ],
        out_specs=[vspec(1), vspec(R)],
        out_shape=[
            jax.ShapeDtypeStruct((1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((R, Cp), jnp.int32),
        ],
    )(seed, cool, probs_t, winpk_t, vcount_t, nt_t, ntc_t, wtabf_t,
      assgn0_t, depth0_t, cache0_t)
    liks = lik[0, :C].reshape(G, n_attempts)
    assgn = jnp.transpose(assgn[:, :C], (1, 0)).reshape(G, n_attempts, R)
    return liks, assgn
