"""Pallas annealer kernel: engine equivalence + TPU-only dynamics checks.

CPU CI runs the deterministic paths (n_steps=0) through the interpreter —
this exercises the kernel's data plumbing (candidate gathers, depth-table
cache, final-likelihood recompute) at depths ABOVE the old 32-row table
clamp.  The stochastic dynamics need hardware PRNG and run only on TPU
(bench sessions); they check the exact ILP optimum and seed determinism.
"""
import numpy as np
import pytest

import jax

from locityper_tpu.model import Params
from locityper_tpu.model.assgn import LocusTensors
from locityper_tpu.model.windows import ContigInfoPack
from locityper_tpu.mathx.distr import NBinom
from locityper_tpu.ops.solver import (SolverConfig, build_bayes_table,
                                      solve_genotypes)
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas

_ON_TPU = jax.default_backend() not in ("cpu",)


def deep_problem(seed=0, n_reads=30, n_haps=3, kh=3):
    """Like test_ilp.small_problem but with every candidate middle inside
    ONE window, driving that window's depth to ~2·n_reads (=60) — above the
    old hard D_TAB=32 clamp, below the new default d_tab=64."""
    rng = np.random.default_rng(seed)
    hap_len = 1500
    hap_prob = rng.normal(-4.0, 2.0, (n_haps, n_reads, kh)).astype(np.float32)
    hap_prob[rng.random((n_haps, n_reads, kh)) < 0.2] = -1e30
    # All middles inside window 0 of each haplotype ([350, 450)).
    mid = rng.integers(360, 440, (n_haps, n_reads, kh, 2)).astype(np.int32)
    unm = np.full(n_reads, -30.0, np.float32)
    tensors = LocusTensors(hap_prob, mid, unm, n_haps, n_reads, kh)
    window = 100
    n_win = 8
    pack = ContigInfoPack(
        n_haps=n_haps, max_len=hap_len, max_windows=32,
        n_windows=np.full(n_haps, n_win, np.int32),
        reg_start=np.full(n_haps, (hap_len - n_win * window) // 2, np.int32),
        contig_len=np.full(n_haps, hap_len, np.int32),
        window_size=window,
        gc_at=rng.integers(35, 60, (n_haps, hap_len)).astype(np.int32),
        weight_at=rng.uniform(0.6, 1.0, (n_haps, hap_len)).astype(np.float32))
    bayes = build_bayes_table([NBinom(4.0, 0.45)] * 101, [0.3, 2.0, 3.0], 2.0)
    params = Params(tweak=0)
    return tensors, pack, bayes, params


def _run_pallas(key, gts, tensors, pack, bayes, cfg, **kw):
    args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes)
    if _ON_TPU:
        return solve_genotypes_pallas(key, gts, *args, cfg, **kw)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return solve_genotypes_pallas(key, gts, *args, cfg, **kw)


class TestHighDepthEquivalence:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_pallas_matches_seq_at_depth_above_32(self, seed):
        """Deterministic path (0 steps, argmax init, tweak=0): the Pallas
        final likelihood must equal the XLA engine's at window depth ~60.
        Guards the d_tab parameterization (old kernel clamped at 32)."""
        tensors, pack, bayes, params = deep_problem(seed)
        gt = np.array([(0, 2)], np.int32)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        want, _ = solve_genotypes(
            jax.random.PRNGKey(seed), gt, tensors.hap_prob, tensors.hap_mid,
            tensors.unmapped_prob, pack.n_windows, pack.reg_start,
            pack.contig_len, pack.gc_at, pack.weight_at, bayes, cfg,
            n_attempts=1, max_windows=pack.max_windows, random_init=False)
        got, _ = _run_pallas(jax.random.PRNGKey(seed), gt, tensors, pack,
                             bayes, cfg, n_attempts=1,
                             max_windows=pack.max_windows, n_steps=0,
                             random_init=False)
        want = float(np.asarray(want)[0, 0])
        got = float(np.asarray(got)[0, 0])
        assert got == pytest.approx(want, abs=1e-3), (got, want)

    def test_depth_exceeds_old_clamp(self):
        """Sanity: the constructed problem really puts depth > 32 in a
        window (otherwise the test above proves nothing)."""
        tensors, pack, bayes, params = deep_problem(0)
        # argmax-init assignment piles both mates of every read into
        # window 0 of each chosen haplotype: depth = 2 * n_reads = 60.
        assert 2 * tensors.n_reads > 32

    def test_d_tab_too_small_detected(self):
        """With d_tab=32 the same comparison must FAIL — proves the test
        has teeth (engines diverge exactly when depth saturates)."""
        tensors, pack, bayes, params = deep_problem(0)
        gt = np.array([(0, 2)], np.int32)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size, d_tab=32)
        want, _ = solve_genotypes(
            jax.random.PRNGKey(0), gt, tensors.hap_prob, tensors.hap_mid,
            tensors.unmapped_prob, pack.n_windows, pack.reg_start,
            pack.contig_len, pack.gc_at, pack.weight_at, bayes, cfg,
            n_attempts=1, max_windows=pack.max_windows, random_init=False)
        got, _ = _run_pallas(jax.random.PRNGKey(0), gt, tensors, pack,
                             bayes, cfg, n_attempts=1,
                             max_windows=pack.max_windows, n_steps=0,
                             random_init=False)
        assert abs(float(np.asarray(got)[0, 0])
                   - float(np.asarray(want)[0, 0])) > 1e-3


class TestPlateauExit:
    def test_plato_while_loop_plumbing(self):
        """plato > 0 switches the kernel to the reference's plateau
        semantics (stoch.rs:196-240) behind a while_loop.  The interpreter
        stubs the PRNG to zeros, so from an argmax init with strict
        improving-only polish acceptance the lane freezes and the block
        exits early — the likelihood must equal the 0-step (init state)
        likelihood, and the call must terminate far before n_steps."""
        tensors, pack, bayes, params = deep_problem(0)
        gt = np.array([(0, 2)], np.int32)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        base, _ = _run_pallas(jax.random.PRNGKey(0), gt, tensors, pack,
                              bayes, cfg, n_attempts=1,
                              max_windows=pack.max_windows, n_steps=0,
                              random_init=False)
        got, _ = _run_pallas(jax.random.PRNGKey(0), gt, tensors, pack,
                             bayes, cfg, n_attempts=1,
                             max_windows=pack.max_windows, n_steps=4000,
                             random_init=False, plato=25)
        base = float(np.asarray(base)[0, 0])
        got = float(np.asarray(got)[0, 0])
        # Stubbed PRNG proposes the same (read, slot) move every step: it
        # is either accepted once (improving) or never — then the plateau
        # counter freezes the lane.  Likelihood stays >= the init state.
        assert np.isfinite(got) and got >= base - 1e-3

    def test_plato_disabled_when_too_large(self):
        """plato >= n_steps degrades to the fixed-step fori path."""
        tensors, pack, bayes, params = deep_problem(1)
        gt = np.array([(1, 2)], np.int32)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        a, _ = _run_pallas(jax.random.PRNGKey(1), gt, tensors, pack,
                           bayes, cfg, n_attempts=1,
                           max_windows=pack.max_windows, n_steps=0,
                           random_init=False, plato=100)
        b, _ = _run_pallas(jax.random.PRNGKey(1), gt, tensors, pack,
                           bayes, cfg, n_attempts=1,
                           max_windows=pack.max_windows, n_steps=0,
                           random_init=False)
        assert float(np.asarray(a)[0, 0]) == float(np.asarray(b)[0, 0])


class TestSeededInit:
    def test_init_assgn_plumbing(self):
        """init_assgn (warm start, permuted slot space): seeding with the
        argmax rows must reproduce the random_init=False result exactly
        at 0 steps — same init state, same final likelihood."""
        tensors, pack, bayes, params = deep_problem(2)
        gt = np.array([(0, 1)], np.int32)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        base, assgn = _run_pallas(jax.random.PRNGKey(2), gt, tensors, pack,
                                  bayes, cfg, n_attempts=2,
                                  max_windows=pack.max_windows, n_steps=0,
                                  random_init=False)
        seeded, _ = _run_pallas(jax.random.PRNGKey(99), gt, tensors, pack,
                                bayes, cfg, n_attempts=2,
                                max_windows=pack.max_windows, n_steps=0,
                                random_init=True,
                                init_assgn=np.asarray(assgn))
        np.testing.assert_allclose(np.asarray(seeded), np.asarray(base),
                                   rtol=0, atol=1e-4)

    def test_scheme_parse_init_prev(self):
        from locityper_tpu.solvers.solve import Scheme
        sch = Scheme.parse(["greedy:i=5k,a=1", "anneal:i=20,a=20,init=prev"])
        assert not sch.stages[0].seed_prev
        assert sch.stages[1].seed_prev
        assert not Scheme.default().stages[1].seed_prev


def test_stage_plato_mapping():
    """_stage_plato: anneal uses the polish budget; greedy converts
    reference iterations (of `sample` reads) to single-read steps."""
    from locityper_tpu.solvers.solve import Scheme, Stage, _stage_plato
    st = Scheme.default().stages
    assert _stage_plato(st[0]) == 100 * 10          # greedy
    assert _stage_plato(st[1]) == 10000             # anneal
    assert _stage_plato(Stage.parse("anneal:n=3000,p=2000")) == 2000


@pytest.mark.skipif(not _ON_TPU, reason="Pallas PRNG needs TPU hardware")
class TestPallasDynamicsTPU:
    """Promoted from extra/validate_pallas_solver.py (VERDICT r1 item 10)."""

    def test_reaches_ilp_optimum(self):
        from test_ilp import small_problem
        from locityper_tpu.solvers.ilp import solve_ilp
        tensors, pack, bayes, params = small_problem(0)
        gt = (0, 2)
        _, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
        cfg = SolverConfig(anneal_steps=4000, polish_steps=4000,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        liks, _ = _run_pallas(jax.random.PRNGKey(0),
                              np.array([gt], np.int32), tensors, pack,
                              bayes, cfg, n_attempts=8,
                              max_windows=pack.max_windows)
        best = float(np.max(np.asarray(liks)))
        assert best == pytest.approx(ilp_lik, abs=0.05)
        assert best <= ilp_lik + 0.05

    def test_seed_determinism(self):
        from test_ilp import small_problem
        tensors, pack, bayes, params = small_problem(1)
        gts = np.array([(0, 1), (0, 2)], np.int32)
        cfg = SolverConfig(anneal_steps=2000, polish_steps=2000,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        a, _ = _run_pallas(jax.random.PRNGKey(7), gts, tensors, pack, bayes,
                           cfg, n_attempts=4, max_windows=pack.max_windows)
        b, _ = _run_pallas(jax.random.PRNGKey(7), gts, tensors, pack, bayes,
                           cfg, n_attempts=4, max_windows=pack.max_windows)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not _ON_TPU, reason="stochastic dynamics need TPU PRNG")
def test_stage1_survivors_greedy_vs_polish_at_scale():
    """VERDICT r2 item 4, measured on-chip at stage-1 scale (5050
    genotypes): the Pallas polish walk's survivor set must overlap the
    reference greedy's (stoch.rs:36-145) at least as well as the greedy
    overlaps ITSELF across seeds — measured 19/20 for both comparisons
    (greedy(11) vs greedy(12/13): 19/20; polish vs greedy: 19/20) — and
    both must retain the true genotype.  Exact set equality is
    unattainable even greedy-vs-greedy (the rank-20 boundary member is
    seed-dependent), so the Pallas walk remains the TPU default for
    greedy stages (solvers/solve.py) with this test as the evidence."""
    from locityper_tpu import mathx
    from locityper_tpu.solvers.solve import (Prediction, discard_improbable,
                                             run_filter)

    rng = np.random.default_rng(3)
    n_haps, n_reads, kh = 100, 160, 4
    # Reads "come from" haps 7 and 23: those columns score high.
    hap_prob = rng.normal(-12.0, 1.5,
                          (n_haps, n_reads, kh)).astype(np.float32)
    src = np.where(rng.random(n_reads) < 0.5, 7, 23)
    for r in range(n_reads):
        hap_prob[src[r], r, 0] = rng.normal(-2.0, 0.3)
    hap_prob[rng.random((n_haps, n_reads, kh)) < 0.3] = -1e30
    mid = rng.integers(360, 1200, (n_haps, n_reads, kh, 2)).astype(np.int32)
    unm = np.full(n_reads, -25.0, np.float32)
    tensors = LocusTensors(hap_prob, mid, unm, n_haps, n_reads, kh)
    hap_len = 1600
    window = 100
    pack = ContigInfoPack(
        n_haps=n_haps, max_len=hap_len, max_windows=16,
        n_windows=np.full(n_haps, 12, np.int32),
        reg_start=np.full(n_haps, 200, np.int32),
        contig_len=np.full(n_haps, hap_len, np.int32),
        window_size=window,
        gc_at=rng.integers(35, 60, (n_haps, hap_len)).astype(np.int32),
        weight_at=np.ones((n_haps, hap_len), np.float32))
    bayes = build_bayes_table([NBinom(4.0, 0.45)] * 101, [0.3, 2.0, 3.0],
                              2.0)
    gts = np.array([(a, b) for a in range(n_haps)
                    for b in range(a, n_haps)], np.int32)
    assert len(gts) == 5050
    priors = np.zeros(len(gts))
    best_aln = np.maximum(hap_prob.max(axis=2), unm[None, :])
    ixs = run_filter(gts, priors, best_aln, 50.0, 5000)

    cfg_g = SolverConfig(tweak=0, window_size=window, greedy_sample=10,
                         plato_size=100)
    cfg_p = SolverConfig(tweak=0, window_size=window, anneal_steps=0,
                         polish_steps=8000)

    def survivors(engine_fn, cfg, seed=11, chunk=1024):
        key = jax.random.PRNGKey(seed)
        preds = {}
        for s in range(0, ixs.size, chunk):
            sub = ixs[s:s + chunk]
            liks, _ = engine_fn(jax.random.fold_in(key, s), gts[sub], cfg)
            liks = np.asarray(liks, np.float64)
            for i, ix in enumerate(sub):
                m, v = mathx.mean_variance(liks[i])
                preds[int(ix)] = Prediction(m, v, liks.shape[1])
        return set(discard_improbable(ixs, preds, gts, 0.01, 20).tolist())

    args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes)

    def greedy(k, g, cfg):
        return solve_genotypes(k, g, *args, cfg, n_attempts=1,
                               max_windows=pack.max_windows,
                               random_init=False)

    def polish(k, g, cfg):
        return solve_genotypes_pallas(k, g, *args, cfg, n_attempts=1,
                                      max_windows=pack.max_windows,
                                      n_steps=cfg.polish_steps,
                                      random_init=False)

    s_greedy = survivors(greedy, cfg_g)
    s_polish = survivors(polish, cfg_p)
    true_ix = int(np.nonzero((gts[:, 0] == 7) & (gts[:, 1] == 23))[0][0])
    assert true_ix in s_greedy and true_ix in s_polish
    # Seed-to-seed baseline of the reference greedy itself.
    s_greedy2 = survivors(greedy, cfg_g, seed=12)
    base = len(s_greedy & s_greedy2)
    cross = len(s_greedy & s_polish)
    assert base >= 18, (sorted(s_greedy), sorted(s_greedy2))
    assert cross >= min(base, 19) - 1, \
        (cross, base, sorted(s_greedy), sorted(s_polish))
