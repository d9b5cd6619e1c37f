"""Interleaved A/B: packed 4-bit single-upload vs int8 two-upload recruit
dispatch, with and without async D2H, at production shapes (round 4).

The recruit dispatch leg runs ~306 ms/batch at 32k pairs while the kernel
alone is ~135 ms; H2D during sustained kernel activity is the suspect
(relay queueing).  Variants, interleaved per round (chip drift is slow —
BENCH_NOTES r4 methodology):

  base       run_pairs_async (2x 6.3 MB int8 device_put)
  base+d2h   + copy_to_host_async right after dispatch
  pack       run_pairs_async_packed (1x 6.3 MB uint32 device_put)
  pack+d2h   both

Usage: python extra/profile_packed_h2d.py [n_loci] [n_batches] [rounds]
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

from locityper_tpu import sim  # noqa: E402
from locityper_tpu.ops import recruit as R  # noqa: E402
from locityper_tpu.seq.contigs import ContigSet  # noqa: E402
from locityper_tpu.seq.counts import (GenomeKmerCounter,  # noqa: E402
                                      off_target_counts)
from locityper_tpu.seq.recruit import RecruitParams, TargetIndex  # noqa: E402

N_LOCI = int(sys.argv[1]) if len(sys.argv) > 1 else 100
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 12
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
B, L, RL = 32768, 192, 150

rng = np.random.default_rng(0)
loci = [sim.simulate_locus(rng, f"B{i}", length=4000, n_haps=6,
                           divergence=0.015) for i in range(N_LOCI)]
genome = np.concatenate([l.haplotypes[0] for l in loci])
counter = GenomeKmerCounter(25)
counter.add_seq(genome)
counter.finalize()
rp = RecruitParams(match_frac=0.5)
idx = TargetIndex(rp)
for l in loci:
    kc = off_target_counts(counter, l.haplotypes, l.haplotypes[0])
    idx.add_locus(ContigSet(l.name, l.hap_names, l.haplotypes), kc)
idx.finalize()
dev = R.DeviceIndex.from_index(idx)
print(json.dumps(dict(stage="setup", keys=int(idx.keys.size),
                      n_loci=N_LOCI, lookup=dev.cfg.lookup)), flush=True)

# Pre-generate distinct batches: half on-locus reads, half random.
batches = []
for bi in range(4):
    m1 = np.full((B, L), 4, np.int8)
    m2 = np.full((B, L), 4, np.int8)
    n_on = B // 2
    hap = loci[bi % N_LOCI].haplotypes[0]
    starts = rng.integers(0, hap.size - RL, n_on)
    for i, s in enumerate(starts):
        m1[i, :RL] = hap[s:s + RL]
        m2[i, :RL] = (3 - hap[s:s + RL])[::-1]
    m1[n_on:, :RL] = rng.integers(0, 4, (B - n_on, RL), dtype=np.int8)
    m2[n_on:, :RL] = rng.integers(0, 4, (B - n_on, RL), dtype=np.int8)
    batches.append((m1, m2))

# Host pack cost alone.
t0 = time.perf_counter()
for m1, m2 in batches:
    R.pack_reads_host(m1, m2)
print(json.dumps(dict(stage="host_pack_ms_per_batch",
                      ms=round((time.perf_counter() - t0) / 4 * 1000, 1))),
      flush=True)


def run(dispatch, d2h_async: bool):
    t0 = time.perf_counter()
    pend = []
    for i in range(NB):
        m1, m2 = batches[i % 4]
        res = dispatch(m1, m2)
        if d2h_async:
            res.copy_to_host_async()
        pend.append(res)
        while len(pend) > 3:
            np.asarray(pend.pop(0))
    while pend:
        np.asarray(pend.pop(0))
    return time.perf_counter() - t0


VARIANTS = [
    ("base", lambda m1, m2: R.run_pairs_async(dev, m1, m2), False),
    ("base+d2h", lambda m1, m2: R.run_pairs_async(dev, m1, m2), True),
    ("pack", lambda m1, m2: R.run_pairs_async_packed(dev, m1, m2), False),
    ("pack+d2h", lambda m1, m2: R.run_pairs_async_packed(dev, m1, m2), True),
]

# Parity + warm/compile every variant once.
ref = None
for name, fn, _ in VARIANTS:
    t0 = time.perf_counter()
    out = np.asarray(fn(*batches[0]))
    if ref is None:
        ref = out
    assert np.array_equal(out, ref), f"{name} decisions differ"
    print(json.dumps(dict(stage="warm", variant=name,
                          s=round(time.perf_counter() - t0, 1))), flush=True)

times = {name: [] for name, _, _ in VARIANTS}
for r in range(ROUNDS):
    for name, fn, d2h in VARIANTS:
        times[name].append(run(fn, d2h))
for name, ts in times.items():
    best = min(ts)
    med = sorted(ts)[len(ts) // 2]
    print(json.dumps(dict(variant=name, s_best=round(best, 3),
                          s_med=round(med, 3),
                          ms_per_batch=round(med / NB * 1000, 1),
                          pairs_per_s=round(NB * B / med))), flush=True)
