"""H2D / pipeline overlap probe (round 4).

Questions this answers on the real chip:
1. Does device_put of batch i+1 overlap the kernel of batch i in the
   production dispatch pattern (async put -> dispatch -> fetch i-1)?
2. Is the 120-180 ms/batch H2D cost bandwidth or per-RPC latency
   (one combined [2B, L] upload vs two [B, L] uploads vs 4-bit packed)?
3. What the steady-state pipelined pairs/s actually is, kernel+transfers
   included, at several pipeline depths.
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
B, L = int(sys.argv[1]) if len(sys.argv) > 1 else 16384, 152

p = RecruitParams(match_frac=0.5)
idx = TargetIndex(p)
loci = []
for i in range(4):
    locus = sim.simulate_locus(rng, f"L{i}", length=2500, n_haps=6)
    kc = KmerCounts(p.minimizer_k, [
        np.zeros(max(h.size - p.minimizer_k + 1, 0), np.uint16)
        for h in locus.haplotypes])
    idx.add_locus(ContigSet(f"L{i}", locus.hap_names, locus.haplotypes), kc)
    loci.append(locus)
idx.finalize()
dev = R.DeviceIndex.from_index(idx)
ta, tb = dev.device_args()

m1 = np.full((B, L), 4, np.int8)
m2 = np.full((B, L), 4, np.int8)
for i in range(B):
    s = int(rng.integers(0, genome.size - 400))
    m1[i, :150] = genome[s:s + 150]
    m2[i, :150] = genome[s + 250:s + 400]
both = np.concatenate([m1, m2], axis=0)

# --- 2: upload shapes -------------------------------------------------
def t_upload(make, n=8):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        xs = make()
        for x in (xs if isinstance(xs, tuple) else (xs,)):
            x.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return dict(ms_best=round(1e3 * min(ts), 1),
                ms_med=round(1e3 * sorted(ts)[len(ts) // 2], 1))

packed = ((both[:, 0::2].astype(np.uint8) & 0xF)
          | (both[:, 1::2].astype(np.uint8) << 4))
for name, make in [
    ("two_int8", lambda: (jax.device_put(m1), jax.device_put(m2))),
    ("one_int8_2B", lambda: jax.device_put(both)),
    ("one_4bit_2B", lambda: jax.device_put(packed)),
]:
    print(json.dumps(dict(stage="h2d", layout=name, **t_upload(make))),
          flush=True)

# --- 1+3: pipelined throughput at depths ------------------------------
run = R.recruit_pairs_batch
cfg = dev.cfg
d1, d2 = jax.device_put(m1), jax.device_put(m2)
np.asarray(run(cfg, d1, d2, ta, tb))          # compile + warm

N_BATCH = 10
for depth in (1, 2, 3):
    for _round in range(3):
        pending = []
        t0 = time.perf_counter()
        for i in range(N_BATCH):
            x1 = jax.device_put(m1)
            x2 = jax.device_put(m2)
            pending.append(run(cfg, x1, x2, ta, tb))
            while len(pending) > depth:
                np.asarray(pending.pop(0))
        while pending:
            np.asarray(pending.pop(0))
        dt = time.perf_counter() - t0
        print(json.dumps(dict(
            stage="pipeline", depth=depth, n_batches=N_BATCH, B=B,
            ms_per_batch=round(1e3 * dt / N_BATCH, 1),
            pairs_per_s=round(N_BATCH * B / dt))), flush=True)
