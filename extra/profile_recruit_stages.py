"""Per-stage recruit-kernel profile on the real chip (round-3 item 3).

Times each stage of recruit_pairs_batch in isolation — Pallas hash+mask
front end, compaction argsort, sorted-table lookup, bitmap extraction —
plus the full kernel at several batch sizes and the flat D2H fetch cost,
to decide where the next win is.  One JSON line per measurement.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from locityper_tpu import sim
from locityper_tpu.seq import dna
from locityper_tpu.seq.contigs import ContigSet
from locityper_tpu.seq.counts import GenomeKmerCounter, off_target_counts
from locityper_tpu.seq.recruit import RecruitParams, TargetIndex
from locityper_tpu.ops import recruit as R

rng = np.random.default_rng(0)
genome = sim.random_genome(rng, 500_000)
counter = GenomeKmerCounter(25)
counter.add_seq(genome)
counter.finalize()
idx = TargetIndex(RecruitParams(match_frac=0.5))
loci = []
for i in range(4):
    locus = sim.simulate_locus(rng, f"L{i}", length=4000, n_haps=6)
    kc = off_target_counts(counter, locus.haplotypes, np.empty(0, np.int8))
    idx.add_locus(ContigSet(f"L{i}", locus.hap_names, locus.haplotypes), kc)
    loci.append(locus)
idx.finalize()
dev = R.DeviceIndex.from_index(idx)
cfg = dev.cfg
keys, fm, bm, rm = map(jax.device_put, (dev.keys_signed, dev.fw_mask,
                                        dev.bw_mask, dev.rare_mask))
print(json.dumps(dict(stage="index", keys=int(idx.keys.size),
                      loci=idx.n_loci)), flush=True)

err = sim.ErrorModel(0.002, 0.0002, 0.0002)


def mk(B, L=152):
    m1 = np.full((B, L), 4, np.int8)
    m2 = np.full((B, L), 4, np.int8)
    for i in range(B):
        if i % 4 == 0:
            l = loci[i % 4]
            h = l.haplotypes[i % 6]
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


def bench(name, fn, *args, iters=12, **extra):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps(dict(stage=name, ms=round(1e3 * dt, 2), **extra)),
          flush=True)
    return out


B = 8192
m1, m2 = mk(B)
both = jax.device_put(np.concatenate([m1, m2], axis=0))

# -- stage 1: hash + minimizer mask (Pallas)
hm = jax.jit(lambda r: R._hash_mask(r, cfg.k, cfg.w))
h, is_fw, mask = bench("hash_mask", hm, both, n_reads=2 * B)

# -- stage 2: compaction argsort
P = h.shape[1]
S = min(P, max(4 * (P // (cfg.w + 1)) + 16, 16))


@jax.jit
def compact(h, is_fw, mask):
    order = jnp.argsort(~mask, axis=1, stable=True)[:, :S]
    return (jnp.take_along_axis(h, order, axis=1),
            jnp.take_along_axis(is_fw, order, axis=1),
            jnp.take_along_axis(mask, order, axis=1))


hc, fc, mc = bench("compact_argsort", compact, h, is_fw, mask, S=int(S))

# -- stage 3: sorted-table lookup
M = keys.shape[0]


@jax.jit
def lookup(hc, mc):
    i = jnp.searchsorted(keys, hc.reshape(-1), method="sort")
    i = jnp.minimum(i.reshape(hc.shape), M - 1)
    return i, (keys[i] == hc) & mc


idxs, found = bench("searchsorted", lookup, hc, mc,
                    queries=int(hc.size))


# -- stage 4: bitmap extraction + counts
@jax.jit
def extract(idxs, found, fc):
    fmask = jnp.where(found, fm[idxs, 0], 0)
    bmask = jnp.where(found, bm[idxs, 0], 0)
    rmask = rm[idxs, 0]
    m_fwdir = jnp.where(fc, fmask, bmask)
    m_bwdir = jnp.where(fc, bmask, fmask)
    bits = jnp.arange(cfg.n_loci, dtype=jnp.uint32)
    rare_b = ((rmask[..., None] >> bits) & 1) != 0
    fw_hit = ((m_fwdir[..., None] >> bits) & 1) != 0
    bw_hit = ((m_bwdir[..., None] >> bits) & 1) != 0
    return jnp.stack([jnp.sum(bw_hit & ~rare_b, axis=1),
                      jnp.sum(fw_hit & ~rare_b, axis=1),
                      jnp.sum(bw_hit & rare_b, axis=1),
                      jnp.sum(fw_hit & rare_b, axis=1)], axis=-1)


bench("bitmap_extract", extract, idxs, found, fc)

# -- full kernel at several batch sizes + D2H fetch latency
for BB in (4096, 8192, 16384, 32768):
    a, b = mk(BB)
    da, db = jax.device_put(a), jax.device_put(b)

    def full(da=da, db=db):
        return R.recruit_pairs_batch(cfg, da, db, *map(jax.device_put, dev.tables()))

    hits = bench(f"full_pairs_B{BB}", full, iters=8,
                 pairs_per_s=None)
    # dispatch+fetch (what the pipeline actually pays per batch)
    full()  # warm
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        _ = np.asarray(full())
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps(dict(stage=f"full+fetch_B{BB}",
                          ms=round(1e3 * dt, 2),
                          pairs_per_s=int(BB / dt))), flush=True)
