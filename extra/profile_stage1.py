"""Interleaved A/B: is the HLA stage-1 solve leg step-bound or
dispatch-bound?  (Round 5: cutting greedy polish 8000->3000 steps did not
move the warm solve wall — suspicion: 25k genotypes / 512-gt chunks = 49
relay kernel launches dominate.)

Measures, interleaved per round (BENCH_NOTES r4 methodology):
  a) 512-lane call, 8000 steps      (the current stage-1 chunk)
  b) 512-lane call, 0 steps         (pure launch + prepare overhead)
  c) 2048-lane call, 8000 steps     (4x fewer launches per stage)
  d) 4 x 512-lane calls, 8000 steps (dispatch-all-then-fetch, as solve.py)
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
from test_ilp import small_problem                          # noqa: E402
from locityper_tpu.ops.solver import SolverConfig           # noqa: E402
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas  # noqa: E402

tensors, pack, bayes, params = small_problem(0, n_reads=512, n_haps=8, kh=4)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
        pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
        pack.weight_at, bayes)
base_gts = np.array([(a, b) for a in range(8) for b in range(a, 8)],
                    np.int32)
gts512 = np.repeat(base_gts, 15, axis=0)[:512]
gts2048 = np.repeat(base_gts, 57, axis=0)[:2048]


def cfg(steps):
    return SolverConfig(anneal_steps=0, polish_steps=steps,
                        depth_contrib=params.depth_contrib,
                        aln_contrib=params.aln_contrib,
                        prob_diff=params.prob_diff, tweak=50,
                        window_size=pack.window_size)


def run(gts, steps, seed=1, n_steps=None):
    liks, _ = solve_genotypes_pallas(
        jax.random.PRNGKey(seed), gts, *args, cfg(steps), n_attempts=1,
        max_windows=pack.max_windows, random_init=False,
        n_steps=n_steps if n_steps is not None else steps)
    return liks


def run4(steps):
    outs = [run(gts512, steps, seed=s) for s in range(4)]   # queue all
    return [float(np.asarray(o).sum()) for o in outs]       # then fetch


VARIANTS = {
    "512x8000": lambda: float(np.asarray(run(gts512, 8000)).sum()),
    "512x0": lambda: float(np.asarray(run(gts512, 0)).sum()),
    "2048x8000": lambda: float(np.asarray(run(gts2048, 8000)).sum()),
    "4x512x8000": lambda: sum(run4(8000)),
}

for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    fn()
    print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)

walls = {k: [] for k in VARIANTS}
for rnd in range(5):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        fn()
        walls[name].append(time.perf_counter() - t0)
for name, ws in walls.items():
    print(f"{name}: median {np.median(ws):.3f}s  walls "
          f"{['%.3f' % w for w in ws]}", flush=True)
