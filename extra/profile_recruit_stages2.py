"""Honest per-stage profile of the recruit pairs kernel (round 4).

Methodology fixes over profile_recruit_stages.py / profile_csa_stage.py:
- every variant is INTERLEAVED round-robin per timing round — the chip's
  2-5x run-to-run variance is slow drift, so A-then-B layouts produce
  garbage (BENCH_NOTES round 4);
- every variant returns a TINY checksum — fetching real intermediates
  costs up to seconds of relay D2H and swamps compute;
- stage costs come from nested-prefix differences of the same program,
  so XLA fusion across stage boundaries is preserved.

Also times the real H2D (device_put of one batch) and D2H (decision
fetch) legs the pipeline pays per batch.
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
import jax.numpy as jnp         # noqa: E402

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
N_LOCI = int(sys.argv[1]) if len(sys.argv) > 1 else 4


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


idx, loci = build(N_LOCI)
dev = R.DeviceIndex.from_index(idx)
cfg = dev.cfg
m1, m2 = mk(loci)
d1, d2 = jax.device_put(m1), jax.device_put(m2)
ta, tb = dev.device_args()


def _front(reads):
    """hash+mask+compact, shared by all prefixes."""
    h, is_fw, mask = R._hash_mask(reads, cfg.k, cfg.w)
    total = jnp.sum(mask, axis=1).astype(jnp.int32)
    Bb, P = h.shape
    S = min(P, max(4 * (P // (cfg.w + 1)) + 16, 16))
    order = jnp.argsort(~mask, axis=1, stable=True)[:, :S]
    h = jnp.take_along_axis(h, order, axis=1)
    is_fw = jnp.take_along_axis(is_fw, order, axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    return h, is_fw, mask, total


def v_hashmask(r1, r2, ta, tb):
    both = jnp.concatenate([r1, r2], axis=0)
    h, is_fw, mask = R._hash_mask(both, cfg.k, cfg.w)
    return h.sum() + is_fw.sum() + mask.sum()


def v_compact(r1, r2, ta, tb):
    both = jnp.concatenate([r1, r2], axis=0)
    h, is_fw, mask, total = _front(both)
    return h.sum() + is_fw.sum() + mask.sum() + total.sum()


def v_lookup(r1, r2, ta, tb):
    both = jnp.concatenate([r1, r2], axis=0)
    h, is_fw, mask, total = _front(both)
    found, rows = R._lookup_rows(cfg, h, mask, ta, tb)
    return found.sum() + total.sum()


def v_rows(r1, r2, ta, tb):
    both = jnp.concatenate([r1, r2], axis=0)
    h, is_fw, mask, total = _front(both)
    found, rows = R._lookup_rows(cfg, h, mask, ta, tb)
    return found.sum() + jnp.sum(
        jax.lax.bitcast_convert_type(rows, jnp.int32)) + total.sum()


def _decide(c, t):
    fw_n, bw_n, fw_d, bw_d, rare = R._numer_denoms(c[:B], t[:B])
    fw_n2, bw_n2, fw_d2, bw_d2, rare2 = R._numer_denoms(c[B:], t[B:])
    return (fw_n.sum() + bw_n.sum() + fw_d.sum() + bw_d.sum()
            + fw_n2.sum() + bw_n2.sum())


def v_full_naive(r1, r2, ta, tb):
    both = jnp.concatenate([r1, r2], axis=0)
    h, is_fw, mask, total = _front(both)
    found, rows = R._lookup_rows(cfg, h, mask, ta, tb)
    G = cfg.n_groups
    per_group = []
    for g in range(G):
        fmask = jnp.where(found, rows[..., 1 + g], 0)
        bmask = jnp.where(found, rows[..., 1 + G + g], 0)
        rmask = rows[..., 1 + 2 * G + g]
        m_fwdir = jnp.where(is_fw, fmask, bmask)
        m_bwdir = jnp.where(is_fw, bmask, fmask)
        n_here = min(32, cfg.n_loci - 32 * g)
        bits = jnp.arange(n_here, dtype=jnp.uint32)
        rare_b = ((rmask[..., None] >> bits) & 1) != 0
        fw_hit = ((m_fwdir[..., None] >> bits) & 1) != 0
        bw_hit = ((m_bwdir[..., None] >> bits) & 1) != 0
        per_group.append(jnp.stack(
            [jnp.sum(bw_hit & ~rare_b, axis=1),
             jnp.sum(fw_hit & ~rare_b, axis=1),
             jnp.sum(bw_hit & rare_b, axis=1),
             jnp.sum(fw_hit & rare_b, axis=1)], axis=-1))
    c = jnp.concatenate(per_group, axis=1).astype(jnp.int32)
    return _decide(c, total)


def _naive_reduce(found, rows, is_fw):
    G = cfg.n_groups
    per_group = []
    for g in range(G):
        fmask = jnp.where(found, rows[..., 1 + g], 0)
        bmask = jnp.where(found, rows[..., 1 + G + g], 0)
        rmask = rows[..., 1 + 2 * G + g]
        m_fwdir = jnp.where(is_fw, fmask, bmask)
        m_bwdir = jnp.where(is_fw, bmask, fmask)
        n_here = min(32, cfg.n_loci - 32 * g)
        bits = jnp.arange(n_here, dtype=jnp.uint32)
        rare_b = ((rmask[..., None] >> bits) & 1) != 0
        fw_hit = ((m_fwdir[..., None] >> bits) & 1) != 0
        bw_hit = ((m_bwdir[..., None] >> bits) & 1) != 0
        per_group.append(jnp.stack(
            [jnp.sum(bw_hit & ~rare_b, axis=1),
             jnp.sum(fw_hit & ~rare_b, axis=1),
             jnp.sum(bw_hit & rare_b, axis=1),
             jnp.sum(fw_hit & rare_b, axis=1)], axis=-1))
    return jnp.concatenate(per_group, axis=1).astype(jnp.int32)


def v_fused_naive(r1, r2, ta, tb):
    """Fused Pallas front end -> lookup -> NAIVE XLA reduce."""
    both = jnp.concatenate([r1, r2], axis=0)
    Bb, L = both.shape
    P = L - cfg.k + 1
    S = min(P, max(4 * (P // (cfg.w + 1)) + 16, 16))
    h, is_fw, mask, total = R._front_compact_pallas(both, cfg.k, cfg.w, S)
    found, rows = R._lookup_rows(cfg, h, mask, ta, tb)
    c = _naive_reduce(found, rows, is_fw)
    return _decide(c, total)


VARIANTS = [
    ("hashmask", v_hashmask),
    ("compact", v_compact),
    ("lookup", v_lookup),
    ("rows", v_rows),
    ("full_naive", v_full_naive),
    ("full_fused", v_full_fused),
    ("fused_naive", v_fused_naive),
]

fns = {}
warm = {}
for name, f in VARIANTS:
    jf = jax.jit(f)
    warm[name] = np.asarray(jf(d1, d2, ta, tb))     # compile + warm
    fns[name] = jf
assert np.array_equal(warm["full_naive"], warm["full_fused"]), \
    "fused front end diverges from the argsort path"
assert np.array_equal(warm["full_naive"], warm["fused_naive"]), \
    "fused front + naive reduce diverges"
print(json.dumps(dict(stage="parity", identical=True)), flush=True)

times = {name: [] for name, _ in VARIANTS}
times["h2d"] = []
times["d2h"] = []
times["d2h_packed"] = []
G = cfg.n_groups
packed_dec = jax.device_put(np.zeros((B, G), np.uint32))
dec = jax.jit(lambda a, b, x, y: R.recruit_pairs_batch.__wrapped__(
    cfg, a, b, x, y))
dec_out = dec(d1, d2, ta, tb)
np.asarray(dec_out)
for _round in range(10):
    for name, _ in VARIANTS:
        t0 = time.perf_counter()
        np.asarray(fns[name](d1, d2, ta, tb))
        times[name].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    x1 = jax.device_put(m1)
    x2 = jax.device_put(m2)
    x1.block_until_ready(), x2.block_until_ready()
    times["h2d"].append(time.perf_counter() - t0)
    out = dec(x1, x2, ta, tb)
    _ = np.asarray(fns["compact"](x1, x2, ta, tb))   # sync compute
    t0 = time.perf_counter()
    np.asarray(out)
    times["d2h"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(packed_dec)
    times["d2h_packed"].append(time.perf_counter() - t0)

for name in list(dict(VARIANTS)) + ["h2d", "d2h", "d2h_packed"]:
    ts = times[name]
    print(json.dumps(dict(
        stage=name, n_loci=N_LOCI, keys=int(dev.keys.size),
        lookup=cfg.lookup, B=B,
        ms_best=round(1e3 * min(ts), 1),
        ms_med=round(1e3 * sorted(ts)[len(ts) // 2], 1))), flush=True)
