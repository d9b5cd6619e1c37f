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
