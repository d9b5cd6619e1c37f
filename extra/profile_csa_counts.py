"""Chip A/B (round 4): bit-sliced CSA counter reduce vs naive per-bit
bitmap extraction in the recruit kernel.

BENCH_NOTES round 3 measured the [B, S, n_loci] bit-extraction reduce as
the next single-chip ceiling at high locus counts (64-locus kernel
~312-325 ms, extraction-dominated).  _bit_column_counts replaces it with
a carry-save adder tree over whole 32-lane words (~12 word-ops per input
word, independent of the per-word lane count).  This script times the
FULL recruit_pairs_batch at several locus counts with the CSA path
forced on/off to place the CSA_MIN_LOCI crossover.

One JSON line per measurement.  Timing by forced np.asarray fetch
(block_until_ready is unreliable through the axon relay).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.cli import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import jax                      # noqa: E402

from locityper_tpu import sim                         # noqa: E402
from locityper_tpu.seq import dna                     # noqa: E402
from locityper_tpu.seq.contigs import ContigSet       # noqa: E402
from locityper_tpu.seq.counts import KmerCounts       # noqa: E402
from locityper_tpu.seq.recruit import (RecruitParams,  # noqa: E402
                                       TargetIndex)
from locityper_tpu.ops import recruit as R            # noqa: E402

rng = np.random.default_rng(0)
genome = sim.random_genome(rng, 400_000)
err = sim.ErrorModel(0.002, 0.0002, 0.0002)
B = 16384
L = 152


def build(n_loci):
    p = RecruitParams(match_frac=0.5)
    idx = TargetIndex(p)
    loci = []
    for i in range(n_loci):
        locus = sim.simulate_locus(rng, f"L{i}", length=2500, n_haps=6)
        kc = KmerCounts(p.minimizer_k, [
            np.zeros(max(h.size - p.minimizer_k + 1, 0), np.uint16)
            for h in locus.haplotypes])
        idx.add_locus(ContigSet(f"L{i}", locus.hap_names, locus.haplotypes),
                      kc)
        loci.append(locus)
    idx.finalize()
    return idx, loci


def mk(loci):
    m1 = np.full((B, L), 4, np.int8)
    m2 = np.full((B, L), 4, np.int8)
    for i in range(B):
        if i % 4 == 0:
            h = loci[i % len(loci)].haplotypes[i % 6]
            s = int(rng.integers(0, h.size - 400))
            a = err.apply(rng, h[s:s + 150])[:150]
            b = err.apply(rng, dna.revcomp(h[s + 250:s + 400]))[:150]
            m1[i, :a.size] = a
            m2[i, :b.size] = b
        else:
            s = int(rng.integers(0, genome.size - 400))
            m1[i, :150] = genome[s:s + 150]
            m2[i, :150] = genome[s + 250:s + 400]
    return m1, m2


import functools


for n_loci in (4, 16, 64):
    idx, loci = build(n_loci)
    dev = R.DeviceIndex.from_index(idx)
    m1, m2 = mk(loci)
    cfg = dev.cfg
    d1, d2 = jax.device_put(m1), jax.device_put(m2)
    ta, tb = dev.device_args()

    # Two independent jit objects so both variants stay cached at once:
    # CSA_MIN_LOCI is read at TRACE time, so set it, trace (first call),
    # then restore.  Interleaved timing (A/B/A/B per round) cancels the
    # chip's 2-5x run-to-run variance, which a time-A-then-time-B layout
    # cannot (the first version of this script produced non-monotonic
    # garbage that way).
    body = R.recruit_pairs_batch.__wrapped__
    fns = {}
    results = {}
    for name, thresh in (("naive", 10 ** 9), ("csa", 1)):
        R.CSA_MIN_LOCI = thresh
        f = jax.jit(functools.partial(body, cfg))
        results[name] = np.asarray(f(d1, d2, ta, tb))   # trace + warm
        fns[name] = f
    same = bool(np.array_equal(results["naive"], results["csa"]))
    print(json.dumps(dict(stage="parity", n_loci=n_loci, identical=same)),
          flush=True)
    assert same, "CSA decisions differ from naive!"

    times = {"naive": [], "csa": []}
    for _round in range(12):
        for name, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(d1, d2, ta, tb))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        best = min(ts)
        med = sorted(ts)[len(ts) // 2]
        print(json.dumps(dict(
            stage="pairs_kernel", path=name, n_loci=n_loci,
            keys=int(dev.keys.size), lookup=cfg.lookup, B=B,
            ms_best=round(1e3 * best, 1), ms_med=round(1e3 * med, 1),
            pairs_per_s=round(B / best))), flush=True)
