"""Verify + time the Pallas solver's k_eff candidate-slot cap (round 4).

The valid-first permutation puts every live candidate below
P*max_valid+1, so slicing the [R, K] feeds there must be BIT-IDENTICAL
(the kernel PRNG stream is K-independent) while shrinking the per-step
candidate loop.  This asserts exact equality at a realistic shape where
max_v is small, then times k_eff=None vs 9 interleaved.

Usage: python extra/profile_keff.py [n_gts] [rounds]
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

from extra.profile_solver_tb import production_problem  # noqa: E402
from locityper_tpu.model.assgn import LocusTensors  # noqa: E402
from locityper_tpu.ops.solver import NEG, SolverConfig  # noqa: E402
from locityper_tpu.ops.solver_pallas import solve_genotypes_pallas  # noqa: E402
from locityper_tpu.solvers.solve import _candidate_k_cap  # noqa: E402

N_GTS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

tensors, pack, bayes, params = production_problem()
# Thin the candidate set to a realistic max_v (<=4 live slots per hap):
# keep the best 4 finite slots per (hap, read), NEG the rest.
hp = tensors.hap_prob.copy()
order = np.argsort(-hp, axis=2)
rank = np.empty_like(order)
np.put_along_axis(rank, order, np.arange(hp.shape[2])[None, None, :],
                  axis=2)
hp[rank >= 4] = NEG * 2
tensors = LocusTensors(hp, tensors.hap_mid, tensors.unmapped_prob,
                       tensors.n_haps, tensors.n_reads, tensors.kh)
k_cap = _candidate_k_cap(tensors, 2)
print(json.dumps(dict(stage="setup", k_full=2 * tensors.kh + 1,
                      k_cap=k_cap)), flush=True)

base = np.array([(a, b) for a in range(12) for b in range(a, 12)], np.int32)
gts = np.tile(base, (-(-N_GTS // base.shape[0]), 1))[:N_GTS]
cfg = SolverConfig(anneal_steps=0, polish_steps=8000,
                   depth_contrib=params.depth_contrib,
                   aln_contrib=params.aln_contrib,
                   prob_diff=params.prob_diff, tweak=50,
                   window_size=pack.window_size)
args = (tensors.hap_prob, tensors.hap_mid, tensors.unmapped_prob,
        pack.n_windows, pack.reg_start, pack.contig_len, pack.gc_at,
        pack.weight_at, bayes)


def run(k_eff):
    liks, assgn = solve_genotypes_pallas(
        jax.random.PRNGKey(1), gts, *args, cfg, n_attempts=1,
        max_windows=pack.max_windows, random_init=False, k_eff=k_eff)
    return np.asarray(liks), np.asarray(assgn)

l_full, a_full = run(None)
l_cap, a_cap = run(k_cap)
ident = (np.array_equal(l_full, l_cap), np.array_equal(a_full, a_cap))
print(json.dumps(dict(stage="parity", liks_identical=ident[0],
                      assgn_identical=ident[1],
                      max_lik_diff=float(np.max(np.abs(l_full - l_cap))))),
      flush=True)
assert ident[0] and ident[1], "k_eff cap changed results"

times = {"k_full": [], "k_cap": []}
for r in range(ROUNDS):
    for name, k in (("k_full", None), ("k_cap", k_cap)):
        t0 = time.perf_counter()
        run(k)
        times[name].append(time.perf_counter() - t0)
for name, ts in times.items():
    med = sorted(ts)[len(ts) // 2]
    print(json.dumps(dict(variant=name, s_best=round(min(ts), 3),
                          s_med=round(med, 3))), flush=True)
