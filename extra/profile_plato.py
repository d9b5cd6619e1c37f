"""Chip A/B: plateau early-exit (plato>0, reference stoch.rs semantics)
vs fixed-step annealing chains — interleaved per round (BENCH_NOTES r4
methodology: relay drift is slow, so alternate A/B within one session).

Checks (1) the plato kernel still reaches the ILP optimum, (2) likelihood
parity with the fixed-step kernel, (3) wall-time saving per stage call.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
from locityper_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from test_ilp import small_problem                         # noqa: E402
from locityper_tpu.solvers.ilp import solve_ilp            # noqa: E402
from locityper_tpu.ops.solver import SolverConfig          # noqa: E402
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas  # noqa: E402

# 1) ILP-optimality with plato on.
tensors, pack, bayes, params = small_problem(0)
gt = (0, 2)
_, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
cfg = SolverConfig(anneal_steps=4000, polish_steps=4000,
                   depth_contrib=params.depth_contrib,
                   aln_contrib=params.aln_contrib,
                   prob_diff=params.prob_diff, tweak=0,
                   window_size=pack.window_size)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
        pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
        pack.weight_at, bayes)
for plato in (0, 4000):
    liks, _ = solve_genotypes_pallas(
        jax.random.PRNGKey(0), np.array([gt], np.int32), *args, cfg,
        n_attempts=8, max_windows=pack.max_windows, plato=plato)
    best = float(np.max(np.asarray(liks)))
    print(f"small plato={plato}: best={best:.4f} ilp={ilp_lik:.4f} "
          f"gap={ilp_lik - best:.5f}", flush=True)

# 2) Interleaved A/B at stage-2-like scale (36 gts x 8 attempts, 30k steps).
tensors, pack, bayes, params = small_problem(0, n_reads=512, n_haps=8, kh=4)
gts = np.array([(a, b) for a in range(8) for b in range(a, 8)], np.int32)
G, A = gts.shape[0], 8
cfg = SolverConfig(anneal_steps=20000, polish_steps=10000,
                   depth_contrib=params.depth_contrib,
                   aln_contrib=params.aln_contrib,
                   prob_diff=params.prob_diff, tweak=50,
                   window_size=pack.window_size)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
        pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
        pack.weight_at, bayes)


def run(plato, seed):
    liks, _ = solve_genotypes_pallas(
        jax.random.PRNGKey(seed), gts, *args, cfg, n_attempts=A,
        max_windows=pack.max_windows, plato=plato)
    return np.asarray(liks)


for plato in (0, 10000):
    t0 = time.perf_counter()
    run(plato, 0)
    print(f"compile plato={plato}: {time.perf_counter() - t0:.1f}s",
          flush=True)

walls = {0: [], 10000: []}
liks_by = {}
for rnd in range(4):
    for plato in (0, 10000):
        t0 = time.perf_counter()
        lk = run(plato, 1)
        walls[plato].append(time.perf_counter() - t0)
        liks_by[plato] = lk
for plato, ws in walls.items():
    print(f"plato={plato}: walls {['%.3f' % w for w in ws]} "
          f"best {np.median(ws):.3f}s", flush=True)
d = liks_by[10000].max(axis=1) - liks_by[0].max(axis=1)
print(f"per-gt best-lik delta (plato - fixed): min {d.min():.4f} "
      f"median {np.median(d):.4f} max {d.max():.4f}")
argmax_same = int(np.argmax(liks_by[10000].max(1))) == int(
    np.argmax(liks_by[0].max(1)))
print(f"argmax genotype identical: {argmax_same}")

# 3) Greedy-stage shape (polish-only from argmax init): the expected
# plateau-exit win — most lanes stop improving within a couple thousand
# steps of an 8000-step budget.
cfg_g = SolverConfig(anneal_steps=0, polish_steps=8000,
                     depth_contrib=params.depth_contrib,
                     aln_contrib=params.aln_contrib,
                     prob_diff=params.prob_diff, tweak=50,
                     window_size=pack.window_size)
gts_big = np.repeat(gts, 15, axis=0)[:512]          # stage-1-like chunk


def run_g(plato, seed):
    liks, _ = solve_genotypes_pallas(
        jax.random.PRNGKey(seed), gts_big, *args, cfg_g, n_attempts=1,
        max_windows=pack.max_windows, random_init=False, plato=plato)
    return np.asarray(liks)


for plato in (0, 1000):
    t0 = time.perf_counter()
    run_g(plato, 0)
    print(f"greedy compile plato={plato}: {time.perf_counter() - t0:.1f}s",
          flush=True)
gwalls = {0: [], 1000: []}
gliks = {}
for rnd in range(4):
    for plato in (0, 1000):
        t0 = time.perf_counter()
        lk = run_g(plato, 1)
        gwalls[plato].append(time.perf_counter() - t0)
        gliks[plato] = lk
for plato, ws in gwalls.items():
    print(f"greedy plato={plato}: walls {['%.3f' % w for w in ws]} "
          f"median {np.median(ws):.3f}s", flush=True)
gd = gliks[1000][:, 0] - gliks[0][:, 0]
print(f"greedy per-gt lik delta: min {gd.min():.4f} "
      f"median {np.median(gd):.4f} max {gd.max():.4f}")
order_same = np.array_equal(np.argsort(-gliks[1000][:, 0])[:20],
                            np.argsort(-gliks[0][:, 0])[:20])
print(f"top-20 survivor order identical: {order_same}")
