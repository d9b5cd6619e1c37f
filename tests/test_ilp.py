"""ILP exact solver as optimality oracle for the parallel annealer."""
import numpy as np
import pytest

import jax

from locityper_tpu.model import Params
from locityper_tpu.model.assgn import LocusTensors
from locityper_tpu.model.windows import ContigInfoPack
from locityper_tpu.ops.solver import SolverConfig, build_bayes_table, solve_genotypes
from locityper_tpu.solvers.ilp import (assemble_genotype_host,
                                       likelihood_of_assignment, solve_ilp)
from locityper_tpu.mathx.distr import NBinom


def small_problem(seed=0, n_reads=40, n_haps=3, kh=3):
    rng = np.random.default_rng(seed)
    hap_len = 1500
    hap_prob = rng.normal(-4.0, 2.0, (n_haps, n_reads, kh)).astype(np.float32)
    hap_prob[rng.random((n_haps, n_reads, kh)) < 0.35] = -1e30
    mid = rng.integers(0, hap_len, (n_haps, n_reads, kh, 2)).astype(np.int32)
    mid[rng.random((n_haps, n_reads, kh, 2)) < 0.15] = -1
    unm = np.full(n_reads, -30.0, np.float32)
    tensors = LocusTensors(hap_prob, mid, unm, n_haps, n_reads, kh)

    window = 100
    n_win = 8
    max_w = 32   # bucketed
    pack = ContigInfoPack(
        n_haps=n_haps, max_len=hap_len, max_windows=max_w,
        n_windows=np.full(n_haps, n_win, np.int32),
        reg_start=np.full(n_haps, (hap_len - n_win * window) // 2, np.int32),
        contig_len=np.full(n_haps, hap_len, np.int32),
        window_size=window,
        gc_at=rng.integers(35, 60, (n_haps, hap_len)).astype(np.int32),
        weight_at=rng.uniform(0.6, 1.0, (n_haps, hap_len)).astype(np.float32))
    bayes = build_bayes_table([NBinom(4.0, 0.45)] * 101, [0.3, 2.0, 3.0], 2.0)
    params = Params(tweak=0)
    return tensors, pack, bayes, params


class TestIlp:
    def test_objective_consistency(self):
        tensors, pack, bayes, params = small_problem()
        gt = (0, 1)
        assignment, lik = solve_ilp(gt, tensors, pack, bayes, params)
        probs, wins, valid, win_gc, win_weight = assemble_genotype_host(
            gt, tensors, pack, bayes, params.prob_diff)
        # All chosen candidates are valid.
        assert valid[np.arange(len(assignment)), assignment].all()
        recomputed = likelihood_of_assignment(
            assignment, probs, wins, win_gc, win_weight, bayes,
            params.depth_contrib, params.aln_contrib)
        assert lik == pytest.approx(recomputed, rel=1e-9)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_annealer_reaches_ilp_optimum(self, seed):
        """The device annealer must match the exact ILP optimum on small
        problems (tweak = 0 makes the objective deterministic)."""
        tensors, pack, bayes, params = small_problem(seed)
        gt = (0, 2)
        _, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
        cfg = SolverConfig(anneal_steps=4000, polish_steps=4000,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size)
        liks, _ = solve_genotypes(
            jax.random.PRNGKey(seed), np.array([gt], np.int32),
            tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes, cfg, n_attempts=8,
            max_windows=pack.max_windows)
        best = float(np.max(np.asarray(liks)))
        # f32 device vs f64 host tolerance.
        assert best == pytest.approx(ilp_lik, abs=0.05), \
            f"anneal {best} vs ILP {ilp_lik}"
        assert best <= ilp_lik + 0.05  # cannot beat the exact optimum


class TestBatchedSolver:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_batched_reaches_ilp_optimum(self, seed):
        from locityper_tpu.ops.solver_batched import solve_genotypes_batched
        tensors, pack, bayes, params = small_problem(seed)
        gt = (0, 2)
        _, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size,
                           anneal_steps_b=500, move_thin=0.3)
        liks, _ = solve_genotypes_batched(
            jax.random.PRNGKey(seed), np.array([gt], np.int32),
            tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes, cfg, n_attempts=8,
            max_windows=pack.max_windows, n_steps=1000)
        best = float(np.max(np.asarray(liks)))
        assert best == pytest.approx(ilp_lik, abs=0.05), \
            f"batched {best} vs ILP {ilp_lik}"
        assert best <= ilp_lik + 0.05


class TestReferenceGreedy:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_greedy_reaches_ilp_optimum(self, seed):
        """The reference-greedy chain (sample-best + plateau,
        stoch.rs:36-145) must reach the exact ILP optimum on small
        problems, starting from the best assignment."""
        tensors, pack, bayes, params = small_problem(seed)
        gt = (0, 2)
        _, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size,
                           greedy_sample=10, plato_size=100)
        liks, assgns = solve_genotypes(
            jax.random.PRNGKey(seed), np.array([gt], np.int32),
            tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes, cfg, n_attempts=4,
            max_windows=pack.max_windows, random_init=False)
        best = float(np.max(np.asarray(liks)))
        assert best == pytest.approx(ilp_lik, abs=0.05), \
            f"greedy {best} vs ILP {ilp_lik}"
        assert best <= ilp_lik + 0.05

    def test_plateau_terminates(self):
        """A trivial problem (every read has one candidate) must terminate
        via the plateau rule, not the iteration cap."""
        import time
        tensors, pack, bayes, params = small_problem(3)
        gt = (0, 1)
        cfg = SolverConfig(anneal_steps=0, polish_steps=0,
                           depth_contrib=params.depth_contrib,
                           aln_contrib=params.aln_contrib,
                           prob_diff=params.prob_diff,
                           tweak=0, window_size=pack.window_size,
                           greedy_sample=10, plato_size=50)
        t0 = time.time()
        liks, _ = solve_genotypes(
            jax.random.PRNGKey(0), np.array([gt], np.int32),
            tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
            pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
            pack.weight_at, bayes, cfg, n_attempts=2,
            max_windows=pack.max_windows, random_init=False)
        np.asarray(liks)
        assert np.isfinite(np.asarray(liks)).all()
        assert time.time() - t0 < 120     # plateau, not the 100k cap
