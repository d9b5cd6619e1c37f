"""Linguistic complexity: fraction of distinct k-mers in moving windows.

Counterpart of reference seq/compl.rs:115-140 (`linguistic_complexity`):
for window size w and k-mer size k (default 5), complexity at window start i
is  #distinct(kmers[i .. i+w-k+1]) / min(w-k+1, 4^k).

The reference uses an O(n) rolling hash-map update; here we use a sorted
sliding-window count via numpy (vectorized, still ~O(n w) worst case but with
tiny constants for w<=1000); device variant lives in ops/.
"""
from __future__ import annotations

import numpy as np

from .kmers import noncanonical_kmers_u32


def linguistic_complexity(seq, k: int, w: int) -> np.ndarray:
    """Complexity for every window start 0..n-w (inclusive); windows containing
    invalid bases get the distinct-count over valid k-mers only (the reference
    panics on Ns; our inputs may include them, so we degrade gracefully)."""
    kmers, valid = noncanonical_kmers_u32(seq, k)
    n_kmers = kmers.size
    win = w - k + 1
    if n_kmers < win or win <= 0:
        return np.empty(0, dtype=np.float64)
    mult = 1.0 / min(win, 1 << (2 * k))
    # Distinct count per window = # positions whose k-mer does not re-appear
    # earlier inside the same window = # positions with (prev occurrence
    # distance >= window) or no previous occurrence.
    order = np.argsort(kmers, kind="stable")
    sk = kmers[order]
    prev = np.full(n_kmers, -(10 ** 9), dtype=np.int64)
    same = sk[1:] == sk[:-1]
    prev[order[1:][same]] = order[:-1][same]
    idx = np.arange(n_kmers)
    dist_ok = (idx - prev) >= win          # previous occurrence outside window
    dist_ok &= valid
    # counts[i] = sum over j in [i, i+win) of "first occurrence in window".
    # A position j is a first-occurrence within window starting at i iff
    # prev[j] < i. For window i: count = #{j in [i,i+win): prev[j] < i}.
    # Compute via: for each j, it contributes to windows i in
    # (max(prev[j], j-win), j] — i.e. i <= j and i > prev[j] and i > j-win.
    starts = np.maximum(prev + 1, idx - win + 1)
    starts = np.clip(starts, 0, None)
    ends = idx + 1                          # contributes to i in [starts, ends)
    n_windows = n_kmers - win + 1
    diff = np.zeros(n_windows + 1, dtype=np.int64)
    s = np.clip(starts[valid], 0, n_windows)
    e = np.clip(ends[valid], 0, n_windows)
    np.add.at(diff, s, 1)
    np.add.at(diff, e, -1)
    counts = np.cumsum(diff[:-1])
    return counts * mult
