"""Isolated chip A/B of the counter reduce alone (round 4): naive
per-bit extraction vs bit-sliced CSA tree, from pre-staged device inputs
(found/tbl/is_fw) — no lookup, no D2H of inputs, output fetched to sync.
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

from locityper_tpu.ops import recruit as R            # noqa: E402
from locityper_tpu.ops.recruit import _Cfg             # noqa: E402

rng = np.random.default_rng(0)
B, S = 32768, 64


def naive(cfg, found, tbl, is_fw):
    G = cfg.n_groups
    per_group = []
    for g in range(G):
        fmask = jnp.where(found, tbl[..., 1 + g], 0)
        bmask = jnp.where(found, tbl[..., 1 + G + g], 0)
        rmask = tbl[..., 1 + 2 * G + g]
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


for n_loci in (4, 32, 64, 128):
    G = max(-(-n_loci // 32), 1)
    cfg = _Cfg(n_loci, G, 15, 10, 1, 2, "sorted", 0, 0)
    found = jax.device_put(rng.random((B, S)) < 0.3)
    tbl = jax.device_put(
        rng.integers(0, 2 ** 32, size=(B, S, 1 + 3 * G), dtype=np.uint32))
    is_fw = jax.device_put(rng.random((B, S)) < 0.5)

    f_naive = jax.jit(lambda f, t, i, c=cfg: naive(c, f, t, i))
    f_csa = jax.jit(lambda f, t, i, c=cfg: R._counters_csa(c, f, t, i))
    out_n = np.asarray(f_naive(found, tbl, is_fw))
    out_c = np.asarray(f_csa(found, tbl, is_fw))
    assert np.array_equal(out_n, out_c), f"mismatch at n_loci={n_loci}"
    # Time via a tiny checksum output: fetching the full [B, n_loci, 4]
    # counts costs up to seconds of D2H over the relay (67 MB at 128
    # loci) and swamps the compute difference.
    f_naive_ck = jax.jit(
        lambda f, t, i, c=cfg: naive(c, f, t, i).sum(axis=(0, 1)))
    f_csa_ck = jax.jit(
        lambda f, t, i, c=cfg: R._counters_csa(c, f, t, i).sum(axis=(0, 1)))
    for name, fn in (("naive", f_naive_ck), ("csa", f_csa_ck)):
        np.asarray(fn(found, tbl, is_fw))
        t0 = time.perf_counter()
        for _ in range(16):
            out = np.asarray(fn(found, tbl, is_fw))
        dt = (time.perf_counter() - t0) / 16
        print(json.dumps(dict(stage="counter_reduce", path=name,
                              n_loci=n_loci, G=G, B=B, S=S,
                              ms=round(1e3 * dt, 2))), flush=True)
