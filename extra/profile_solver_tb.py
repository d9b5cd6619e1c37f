"""Interleaved A/B of the Pallas solver's lane-block width (tb) and
depth-table size (d_tab) at stage-1 panel scale (round 4).

Grid blocks run sequentially on the core, so the solve phase is
(C/tb) x n_steps sequential step iterations; per-step vector work is
O(rows x tb) where rows ~ K*R + 4*W*d_tab.  Wider tb halves the passes,
smaller d_tab shrinks the dominant masked-gather term — both are
worthless if the kernel is already VPU-throughput-bound, hence the A/B.

Usage: python extra/profile_solver_tb.py [n_gts] [rounds]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.cli import _enable_compile_cache  # noqa: E402
from locityper_tpu.utils.malloc import tune_host_allocator  # noqa: E402

_enable_compile_cache()
tune_host_allocator()

import jax  # noqa: E402

from locityper_tpu.model import Params  # noqa: E402
from locityper_tpu.model.assgn import LocusTensors  # noqa: E402
from locityper_tpu.model.windows import ContigInfoPack  # noqa: E402
from locityper_tpu.mathx.distr import NBinom  # noqa: E402
from locityper_tpu.ops.solver import (SolverConfig,  # noqa: E402
                                      build_bayes_table)
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas  # noqa: E402
import dataclasses  # noqa: E402

N_GTS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def production_problem(seed=0, n_reads=512, n_haps=12, kh=10,
                       hap_len=4500, n_win=40, max_w=64):
    """test_ilp.small_problem at the 100-locus panel's REAL shapes:
    ~4 kb haps, ~40 100-bp windows (bucketed 64), kh=10 (K=21)."""
    rng = np.random.default_rng(seed)
    hap_prob = rng.normal(-4.0, 2.0, (n_haps, n_reads, kh)).astype(np.float32)
    hap_prob[rng.random((n_haps, n_reads, kh)) < 0.35] = -1e30
    mid = rng.integers(0, hap_len, (n_haps, n_reads, kh, 2)).astype(np.int32)
    mid[rng.random((n_haps, n_reads, kh, 2)) < 0.15] = -1
    unm = np.full(n_reads, -30.0, np.float32)
    tensors = LocusTensors(hap_prob, mid, unm, n_haps, n_reads, kh)
    pack = ContigInfoPack(
        n_haps=n_haps, max_len=hap_len, max_windows=max_w,
        n_windows=np.full(n_haps, n_win, np.int32),
        reg_start=np.full(n_haps, (hap_len - n_win * 100) // 2, np.int32),
        contig_len=np.full(n_haps, hap_len, np.int32),
        window_size=100,
        gc_at=rng.integers(35, 60, (n_haps, hap_len)).astype(np.int32),
        weight_at=rng.uniform(0.6, 1.0, (n_haps, hap_len)).astype(np.float32))
    bayes = build_bayes_table([NBinom(4.0, 0.45)] * 101, [0.3, 2.0, 3.0], 2.0)
    return tensors, pack, bayes, Params(tweak=0)


tensors, pack, bayes, params = production_problem()
base = np.array([(a, b) for a in range(12) for b in range(a, 12)], np.int32)
reps = -(-N_GTS // base.shape[0])
gts = np.tile(base, (reps, 1))[:N_GTS]
cfg64 = SolverConfig(anneal_steps=0, polish_steps=8000,
                     depth_contrib=params.depth_contrib,
                     aln_contrib=params.aln_contrib,
                     prob_diff=params.prob_diff, tweak=50,
                     window_size=pack.window_size)
cfg32 = dataclasses.replace(cfg64, d_tab=32)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
        pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
        pack.weight_at, bayes)
print(json.dumps(dict(stage="setup", n_gts=int(gts.shape[0]),
                      n_reads=512, K=21, W=int(pack.max_windows))),
      flush=True)


def make(cfg, tb):
    def fn():
        liks, _ = solve_genotypes_pallas(
            jax.random.PRNGKey(1), gts, *args, cfg, n_attempts=1,
            max_windows=pack.max_windows, random_init=False, tb=tb)
        return np.asarray(liks)
    return fn


VARIANTS = [("tb128_d64", make(cfg64, 128)), ("tb256_d64", make(cfg64, 256)),
            ("tb128_d32", make(cfg32, 128)), ("tb256_d32", make(cfg32, 256)),
            ("tb512_d32", make(cfg32, 512))]

ref = None
results = {}
for name, fn in VARIANTS:
    t0 = time.perf_counter()
    try:
        out = fn()
    except Exception as e:
        print(json.dumps(dict(stage="warm", variant=name,
                              error=str(e)[:200])), flush=True)
        results[name] = None
        continue
    results[name] = out
    if ref is None:
        ref = out
    print(json.dumps(dict(stage="warm", variant=name,
                          s=round(time.perf_counter() - t0, 1),
                          max_abs_diff=float(np.max(np.abs(out - ref))))),
          flush=True)

times = {name: [] for name, _ in VARIANTS if results[name] is not None}
for r in range(ROUNDS):
    for name, fn in VARIANTS:
        if results[name] is None:
            continue
        t0 = time.perf_counter()
        fn()
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    med = sorted(ts)[len(ts) // 2]
    print(json.dumps(dict(variant=name, s_best=round(min(ts), 3),
                          s_med=round(med, 3),
                          ms_per_gt=round(med / gts.shape[0] * 1000, 2))),
          flush=True)
