"""Genome-wide k-mer counting and per-locus off-target counts.

Replaces the reference's jellyfish subprocess (seq/counts.rs:253-363) with a
host-side sorted-array counter: all canonical k-mers of the genome are packed
into uint64 (k ≤ 31), sorted once, and per-sequence counts are obtained with
binary search — a vectorized O(log G) probe per k-mer.

`off_target_counts` mirrors seq/counts.rs:174-224: genome-wide counts minus
occurrences inside the locus region itself, so "count == 0" means the k-mer
is unique to the locus.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .kmers import canonical_kmers, UNDEF

MAX_COUNT = np.uint16(65535)


class GenomeKmerCounter:
    """Sorted canonical-k-mer multiset of a genome."""

    def __init__(self, k: int):
        assert 1 <= k <= 31
        self.k = k
        self._parts: list[np.ndarray] = []
        self._sorted: np.ndarray | None = None

    def add_seq(self, codes: np.ndarray) -> None:
        kmer, _, valid = canonical_kmers(codes, self.k)
        self._parts.append(kmer[valid])
        self._sorted = None

    def finalize(self) -> None:
        allk = (np.concatenate(self._parts) if self._parts
                else np.empty(0, dtype=np.uint64))
        allk.sort(kind="stable")
        self._sorted = allk
        self._parts = []

    def counts_of(self, kmers: np.ndarray) -> np.ndarray:
        """Occurrences of each query k-mer in the genome (uint16, saturating)."""
        if self._sorted is None:
            self.finalize()
        lo = np.searchsorted(self._sorted, kmers, side="left")
        hi = np.searchsorted(self._sorted, kmers, side="right")
        return np.minimum(hi - lo, int(MAX_COUNT)).astype(np.uint16)

    def seq_counts(self, codes: np.ndarray) -> np.ndarray:
        """Counts for every k-mer position of `codes`; invalid positions get
        MAX_COUNT (counts.rs:189-191: UNDEF k-mer is treated as max)."""
        kmer, _, valid = canonical_kmers(codes, self.k)
        c = self.counts_of(kmer)
        c[~valid] = MAX_COUNT
        return c


@dataclass
class KmerCounts:
    """Per-haplotype k-mer count arrays (counts.rs:31-250)."""
    k: int
    counts: list[np.ndarray]            # uint16, len = hap_len - k + 1 each

    def get(self, i: int) -> np.ndarray:
        return self.counts[i]

    def save_npz(self, path) -> None:
        np.savez_compressed(path, k=self.k, n=len(self.counts),
                            **{f"c{i}": c for i, c in enumerate(self.counts)})

    @classmethod
    def load_npz(cls, path) -> "KmerCounts":
        z = np.load(path)
        n = int(z["n"])
        return cls(int(z["k"]), [z[f"c{i}"] for i in range(n)])

    def thin_out(self, ixs) -> "KmerCounts":
        return KmerCounts(self.k, [self.counts[i] for i in ixs])


def off_target_counts(genome_counter: GenomeKmerCounter,
                      hap_seqs: list[np.ndarray],
                      target_seq: np.ndarray) -> KmerCounts:
    """Computes per-haplotype off-target counts (counts.rs:174-224):
    for k-mers occurring inside the target (reference locus) region, subtract
    those occurrences from the genome-wide count; other k-mers keep their
    genome-wide count.  A count of 0 marks a locus-unique k-mer.
    """
    k = genome_counter.k
    tk, _, tvalid = canonical_kmers(target_seq, k)
    tk = tk[tvalid]
    # Occurrences of each distinct target k-mer inside the target region.
    t_sorted = np.sort(tk)
    out = []
    for seq in hap_seqs:
        hk, _, hvalid = canonical_kmers(seq, k)
        genome = genome_counter.counts_of(hk).astype(np.int64)
        lo = np.searchsorted(t_sorted, hk, side="left")
        hi = np.searchsorted(t_sorted, hk, side="right")
        in_target = hi - lo
        c = np.where(in_target > 0, np.maximum(genome - in_target, 0), genome)
        c = np.where(hvalid, c, int(MAX_COUNT)).astype(np.uint16)
        out.append(c)
    return KmerCounts(k, out)
