"""Chip experiment (round 3): can a host-built displacement hash beat
the sorted-table lookup in the recruit kernel?

Current kernel cost per 1M queries (profile_recruit_stages.py):
searchsorted method='sort' ~23 ms + ONE packed-row gather ~27 ms.
Candidate: Pagh hash-and-displace -> exactly TWO dependent gathers
(small displacement table, then the packed row at a computed slot) and
NO sort.  Whether two gathers beat sort+gather depends entirely on how
XLA lowers each — measured here, not guessed.

Prints one JSON line per measurement.
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

C1 = np.uint32(0x9E3779B1)      # golden-ratio multipliers
C2 = np.uint32(0x85EBCA77)
C3 = np.uint32(0xC2B2AE3D)


def _slot(keys, d, shift_t):
    # Re-hash with the displacement as seed (multiply-shift, HIGH bits):
    # unlike XOR/add displacement, distinct keys colliding at one d are
    # separated at another.
    return ((keys ^ (d * C3)) * C2) >> shift_t


def build_disp_hash(keys: np.ndarray, rows: np.ndarray):
    """Hash-and-displace (Pagh 1999): returns (d_tab [Bk] int32,
    table_keys [T] uint32, table_rows [T, W]) such that for every key i
    slot(q) = ((q*C2) ^ d_tab[(q*C1) >> shift]) & (T-1) is unique.
    Build is host-side numpy; lookup is 2 gathers on device."""
    M = keys.size
    T = 1 << max(int(np.ceil(np.log2(M * 2.0))), 4)
    Bk = 1 << max(int(np.ceil(np.log2(M))), 4)
    shift = np.uint32(32 - int(np.log2(Bk)))
    shift_t = np.uint32(32 - int(np.log2(T)))
    b = ((keys * C1) >> shift).astype(np.int64)
    order = np.argsort(b, kind="stable")
    bs, starts = np.unique(b[order], return_index=True)
    groups = np.split(order, starts[1:])
    groups.sort(key=len, reverse=True)
    taken = np.zeros(T, bool)
    d_tab = np.zeros(Bk, np.uint32)
    mask = np.uint32(T - 1)
    for g in groups:
        gk = keys[g]
        d = np.uint32(0)
        while True:
            slots = _slot(gk, d, shift_t)
            if len(set(slots.tolist())) == len(g) and not taken[slots].any():
                break
            d += np.uint32(1)
            if d > 4 * T:
                raise RuntimeError("displacement search failed")
        taken[slots] = True
        d_tab[b[g[0]]] = d
    slots_all = _slot(keys, d_tab[b], shift_t)
    tk = np.zeros(T, np.uint32)
    tr = np.zeros((T, rows.shape[1]), rows.dtype)
    tk[slots_all] = keys
    tr[slots_all] = rows
    return d_tab, np.uint32(shift), np.uint32(shift_t), tk, tr


def main():
    rng = np.random.default_rng(0)
    Q = 1_048_576
    for M in (25_000, 250_000):
        keys = np.unique(rng.integers(0, 2**32, 2 * M, dtype=np.uint32))
        keys = keys[rng.permutation(keys.size)[:M]]
        G = 1
        rows = rng.integers(0, 2**32, (M, 1 + 3 * G), dtype=np.uint32)
        rows[:, 0] = keys
        # queries: half hits, half misses
        q = np.where(rng.random(Q) < 0.5,
                     keys[rng.integers(0, M, Q)],
                     rng.integers(0, 2**32, Q, dtype=np.uint32))

        t0 = time.perf_counter()
        d_tab, shift, shift_t, tk, tr = build_disp_hash(keys, rows)
        build_s = time.perf_counter() - t0

        keys_sorted = np.sort(keys)
        srt = np.argsort(rows[:, 0])
        rows_sorted = rows[srt]

        dq = jax.device_put(q)
        dks = jax.device_put(keys_sorted)
        drs = jax.device_put(rows_sorted)
        dd = jax.device_put(d_tab)
        dtk = jax.device_put(tk)
        dtr = jax.device_put(tr)

        @jax.jit
        def via_sort(q):
            i = jnp.searchsorted(dks, q, method="sort")
            i = jnp.minimum(i, M - 1)
            row = drs[i]
            found = row[:, 0] == q
            return jnp.where(found[:, None], row, 0).sum(axis=0,
                                                         dtype=jnp.uint32)

        @jax.jit
        def via_hash(q):
            b = (q * C1) >> shift
            d = dd[b]
            slot = ((q ^ (d * C3)) * C2) >> shift_t
            row = dtr[slot]
            found = row[:, 0] == q
            return jnp.where(found[:, None], row, 0).sum(axis=0,
                                                         dtype=jnp.uint32)

        a = np.asarray(via_sort(dq))
        bv = np.asarray(via_hash(dq))
        assert np.array_equal(a, bv), "lookup mismatch"

        for name, fn in (("searchsorted+gather", via_sort),
                         ("disp_hash 2 gathers", via_hash)):
            _ = np.asarray(fn(dq))
            best = None
            for _ in range(8):
                t0 = time.perf_counter()
                r = fn(dq)
                _ = np.asarray(r)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(json.dumps(dict(method=name, M=int(M), Q=int(Q),
                                  ms=round(1e3 * best, 2),
                                  build_s=round(build_s, 2))), flush=True)


if __name__ == "__main__":
    main()
