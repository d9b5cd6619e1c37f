import numpy as np, time
import jax
from locityper_tpu.cli import _enable_compile_cache
_enable_compile_cache()
import sys; sys.path.insert(0, '/root/repo/tests')
from test_ilp import small_problem
from locityper_tpu.solvers.ilp import solve_ilp
from locityper_tpu.ops.solver import SolverConfig, solve_genotypes
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas

# 1) Optimality check vs ILP (small problem).
tensors, pack, bayes, params = small_problem(0)
gt = (0, 2)
_, ilp_lik = solve_ilp(gt, tensors, pack, bayes, params)
cfg = SolverConfig(anneal_steps=4000, polish_steps=4000,
    depth_contrib=params.depth_contrib, aln_contrib=params.aln_contrib,
    prob_diff=params.prob_diff, tweak=0, window_size=pack.window_size)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob, pack.n_windows,
        pack.reg_start, pack.contig_len, pack.gc_at, pack.weight_at, bayes)
liks, _ = solve_genotypes_pallas(jax.random.PRNGKey(0), np.array([gt],np.int32),
    *args, cfg, n_attempts=8, max_windows=pack.max_windows)
best = float(np.max(np.asarray(liks)))
print(f"small: pallas best={best:.4f}  ilp={ilp_lik:.4f}  gap={ilp_lik-best:.5f}", flush=True)

# 2) Throughput at realistic scale.
tensors, pack, bayes, params = small_problem(0, n_reads=512, n_haps=8, kh=4)
gts = np.array([(a,b) for a in range(8) for b in range(a,8)], np.int32)
G, A = gts.shape[0], 8
cfg = SolverConfig(anneal_steps=20000, polish_steps=10000,
    depth_contrib=params.depth_contrib, aln_contrib=params.aln_contrib,
    prob_diff=params.prob_diff, tweak=50, window_size=pack.window_size)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob, pack.n_windows,
        pack.reg_start, pack.contig_len, pack.gc_at, pack.weight_at, bayes)

def bench(name, fn):
    t0=time.perf_counter()
    liks = fn()
    b = float(np.max(np.asarray(liks)))
    print(f"{name}: compile+1 {time.perf_counter()-t0:.1f}s best={b:.1f}", flush=True)
    t0=time.perf_counter(); reps=3
    for _ in range(reps):
        s = float(np.asarray(fn()).sum())
    dt=(time.perf_counter()-t0)/reps
    print(f"{name}: steady {dt:.3f}s for {G}x{A} 30k-step chains ({dt/G*1000:.1f} ms/gt)", flush=True)

bench("pallas", lambda: solve_genotypes_pallas(jax.random.PRNGKey(1), gts, *args, cfg,
      n_attempts=A, max_windows=pack.max_windows)[0])
bench("xla-seq", lambda: solve_genotypes(jax.random.PRNGKey(1), gts, *args, cfg,
      n_attempts=A, max_windows=pack.max_windows)[0])
