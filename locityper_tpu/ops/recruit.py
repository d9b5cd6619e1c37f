"""Device recruitment kernel: batched minimizer matching on TPU.

The device twin of seq/recruit.py's host engine (behavioral spec:
reference seq/recruit.rs): dense [B, L] read batches → canonical k-mers →
32-bit murmur3 minimizers (first-argmin per window, deduped) → sorted-table
binary search → per-locus direction/rarity counters → short-read and pair
decision rules.  Everything is int32/uint32 (TPU-native); the index is the
same TargetIndex the host builds (seq/recruit.py), shipped as flat arrays.

Decision rules are exact integer cross-multiplications of the rational
match-fraction threshold, matching the host path bit-for-bit.
"""
from __future__ import annotations

import functools
from collections import namedtuple
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..seq.recruit import (DIR_BW, DIR_FW, RARE_BIT, RARE_WORTH, RecruitParams,
                           TargetIndex)

UNDEF32 = jnp.uint32(0xFFFFFFFF)


_Cfg = namedtuple("_Cfg", "n_loci max_entries k w frac_p frac_q")


@dataclass(frozen=True, eq=False)
class DeviceIndex:
    """TargetIndex as device-friendly flat arrays."""
    keys: np.ndarray          # [M] uint32 sorted
    start: np.ndarray         # [M] int32 entry span start
    count: np.ndarray         # [M] int32 entry span length
    entry_locus: np.ndarray   # [E] int32
    entry_info: np.ndarray    # [E] int32
    n_loci: int
    max_entries: int
    k: int
    w: int
    frac_p: int               # match_frac = frac_p / frac_q
    frac_q: int

    @classmethod
    def from_index(cls, index: TargetIndex) -> "DeviceIndex":
        p = index.params
        frac = p.match_frac_rational
        starts = index.offsets[:-1].astype(np.int32)
        counts = np.diff(index.offsets).astype(np.int32)
        return cls(
            keys=index.keys.astype(np.uint32),
            start=starts, count=counts,
            entry_locus=index.entry_locus.astype(np.int32),
            entry_info=index.entry_info.astype(np.int32),
            n_loci=index.n_loci,
            max_entries=max(int(counts.max()) if counts.size else 1, 1),
            k=p.minimizer_k, w=p.minimizer_w,
            frac_p=frac.numerator, frac_q=frac.denominator)

    @property
    def cfg(self) -> "_Cfg":
        """Hashable scalar config for jit static args."""
        return _Cfg(self.n_loci, self.max_entries, self.k, self.w,
                    self.frac_p, self.frac_q)


def _canonical_hashes(reads, k: int):
    """[B, P] uint32 minimizer-space hashes; UNDEF32 where invalid."""
    B, L = reads.shape
    P = L - k + 1
    codes = reads.astype(jnp.int32)
    valid = codes < 4
    c = jnp.where(valid, codes, 0).astype(jnp.uint32)
    fw = jnp.zeros((B, P), jnp.uint32)
    rv = jnp.zeros((B, P), jnp.uint32)
    ok = jnp.ones((B, P), bool)
    for j in range(k):
        cj = jax.lax.dynamic_slice_in_dim(c, j, P, axis=1)
        vj = jax.lax.dynamic_slice_in_dim(valid, j, P, axis=1)
        fw = fw | (cj << jnp.uint32(2 * (k - 1 - j)))
        rv = rv | ((jnp.uint32(3) - cj) << jnp.uint32(2 * j))
        ok = ok & vj
    is_fw = fw <= rv
    kmer = jnp.where(is_fw, fw, rv)
    # murmur3 mix (seq/kmers.py murmur3_mix32).
    x = ~kmer
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    h = jnp.where(ok, x, UNDEF32)
    return h, is_fw


def _minimizer_mask(h, w: int):
    """[B, P] bool: position is a window first-argmin with a defined hash."""
    B, P = h.shape
    W = P - w + 1
    if W <= 0:
        return jnp.zeros_like(h, bool)
    # First-argmin per window: w shifted compares (ties keep earlier).
    best_v = jax.lax.dynamic_slice_in_dim(h, 0, W, axis=1)
    best_p = jnp.zeros((B, W), jnp.int32)
    for j in range(1, w):
        vj = jax.lax.dynamic_slice_in_dim(h, j, W, axis=1)
        take = vj < best_v
        best_v = jnp.where(take, vj, best_v)
        best_p = jnp.where(take, j, best_p)
    abs_p = best_p + jnp.arange(W, dtype=jnp.int32)[None, :]
    defined = best_v != UNDEF32
    mask = jnp.zeros((B, P), bool)
    mask = mask.at[jnp.arange(B)[:, None], abs_p].max(defined)
    return mask


def _mate_counters(reads, dev: DeviceIndex, keys, start, count, entry_locus,
                   entry_info):
    """Per-locus counters [B, n_loci, 4] = [bw_c, fw_c, bw_r, fw_r] and the
    minimizer totals [B]."""
    h, is_fw = _canonical_hashes(reads, dev.k)
    mask = _minimizer_mask(h, dev.w)
    total = jnp.sum(mask, axis=1).astype(jnp.int32)

    B, P = h.shape
    M = keys.shape[0]
    idx = jnp.searchsorted(keys, h.reshape(-1)).reshape(B, P)
    idx = jnp.minimum(idx, M - 1)
    found = (keys[idx] == h) & mask
    e_start = jnp.where(found, start[idx], 0)
    e_count = jnp.where(found, count[idx], 0)

    counts = jnp.zeros((B, dev.n_loci, 4), jnp.int32)
    E = entry_locus.shape[0]
    for e in range(dev.max_entries):
        ei = jnp.minimum(e_start + e, E - 1)
        live = found & (e < e_count)
        locus = entry_locus[ei]
        info = entry_info[ei]
        rare = (info & RARE_BIT) != 0
        dir_read = jnp.where(is_fw, DIR_FW, DIR_BW)      # read direction bit
        dir_anti = jnp.where(is_fw, DIR_BW, DIR_FW)
        fw_hit = live & ((info & dir_read) != 0)
        bw_hit = live & ((info & dir_anti) != 0)
        b_ix = jnp.broadcast_to(jnp.arange(B)[:, None], (B, P))
        slot = jnp.where(rare, 2, 0)
        counts = counts.at[b_ix, locus, slot].add(bw_hit)
        counts = counts.at[b_ix, locus, slot + 1].add(fw_hit)
    return counts, total


def _numer_denoms(counts, total):
    """fw/bw weighted numerators and denominators (recruit.rs:294-348)."""
    bw_c = counts[..., 0]
    fw_c = counts[..., 1]
    bw_r = counts[..., 2]
    fw_r = counts[..., 3]
    t = total[:, None]
    fw_n = RARE_WORTH * fw_r + fw_c
    bw_n = RARE_WORTH * bw_r + bw_c
    fw_d = RARE_WORTH * (t - fw_c) + fw_c
    bw_d = RARE_WORTH * (t - bw_c) + bw_c
    has_rare = (bw_r > 0) | (fw_r > 0)
    return fw_n, bw_n, fw_d, bw_d, has_rare


@functools.partial(jax.jit, static_argnames=("cfg",))
def recruit_short_batch(cfg, reads, keys, start, count,
                        entry_locus, entry_info):
    """[B, n_loci] bool decisions for short single-end reads.
    cfg: hashable scalar tuple (see DeviceIndex.cfg)."""
    dev = _Cfg(*cfg)
    counts, total = _mate_counters(reads, dev, keys, start, count,
                                   entry_locus, entry_info)
    fw_n, bw_n, fw_d, bw_d, has_rare = _numer_denoms(counts, total)
    use_fw = fw_n >= bw_n
    numer = jnp.where(use_fw, fw_n, bw_n)
    denom = jnp.maximum(jnp.where(use_fw, fw_d, bw_d), 1)
    passed = numer * dev.frac_q >= dev.frac_p * denom
    return has_rare & passed


@functools.partial(jax.jit, static_argnames=("cfg",))
def recruit_pairs_batch(cfg, reads1, reads2, keys, start, count,
                        entry_locus, entry_info):
    """[B, n_loci] bool decisions for read pairs (strand-consistent joint
    orientation, both mates must pass; recruit.rs:885-932)."""
    dev = _Cfg(*cfg)
    c1, t1 = _mate_counters(reads1, dev, keys, start, count, entry_locus,
                            entry_info)
    c2, t2 = _mate_counters(reads2, dev, keys, start, count, entry_locus,
                            entry_info)
    fw_n1, bw_n1, fw_d1, bw_d1, rare1 = _numer_denoms(c1, t1)
    fw_n2, bw_n2, fw_d2, bw_d2, rare2 = _numer_denoms(c2, t2)
    use_fw1 = fw_n1 + bw_n2 >= bw_n1 + fw_n2
    n1 = jnp.where(use_fw1, fw_n1, bw_n1)
    d1 = jnp.maximum(jnp.where(use_fw1, fw_d1, bw_d1), 1)
    n2 = jnp.where(use_fw1, bw_n2, fw_n2)
    d2 = jnp.maximum(jnp.where(use_fw1, bw_d2, fw_d2), 1)
    ok1 = n1 * dev.frac_q >= dev.frac_p * d1
    ok2 = n2 * dev.frac_q >= dev.frac_p * d2
    # Mate-1 must have at least one match at the locus (mate-2-only loci are
    # never inserted by the reference, recruit.rs:915-917).
    any1 = jnp.sum(c1, axis=-1) > 0
    return (rare1 | rare2) & ok1 & ok2 & any1


def run_short(dev: DeviceIndex, reads: np.ndarray):
    return np.asarray(recruit_short_batch(
        dev.cfg, reads, dev.keys, dev.start, dev.count, dev.entry_locus,
        dev.entry_info))


def run_pairs(dev: DeviceIndex, reads1: np.ndarray, reads2: np.ndarray):
    return np.asarray(recruit_pairs_batch(
        dev.cfg, reads1, reads2, dev.keys, dev.start, dev.count,
        dev.entry_locus, dev.entry_info))
