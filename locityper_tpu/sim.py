"""Synthetic data generator: genomes, haplotype panels, reads.

The reference is validated against a downloadable dataset
(locityper.vercel.app); this sandbox has no egress, so correctness is
established on simulated loci where the true genotype is known — plus
unit-level oracles throughout tests/.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .seq import dna

BASES = np.arange(4, dtype=np.int8)


def random_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, 4, size=length, dtype=np.int8)


def mutate(rng: np.random.Generator, seq: np.ndarray, snp_rate: float = 0.01,
           indel_rate: float = 0.001, max_indel: int = 8) -> np.ndarray:
    """Derives a haplotype by applying random SNVs (density `snp_rate` per
    base) and short indels (density `indel_rate` per base)."""
    n = seq.size
    r = rng.random(n)
    # SNVs.
    snp = r < snp_rate
    out = np.where(snp, (seq + rng.integers(1, 4, n)) % 4, seq).astype(np.int8)
    # Indels: splice at event positions.
    pos = np.nonzero((r >= snp_rate) & (r < snp_rate + indel_rate))[0]
    if pos.size == 0:
        return out
    parts = []
    prev = 0
    for p in pos:
        length = int(rng.integers(1, max_indel + 1))
        if rng.random() < 0.5:   # deletion of `length` bases at p
            parts.append(out[prev:p])
            prev = min(p + length, n)
        else:                     # insertion of `length` random bases at p
            parts.append(out[prev:p])
            parts.append(rng.integers(0, 4, size=length, dtype=np.int8))
            prev = p
    parts.append(out[prev:])
    return np.concatenate(parts)


@dataclass
class SimLocus:
    """A simulated locus: haplotype panel + the true diploid genotype."""
    name: str
    haplotypes: list[np.ndarray]
    hap_names: list[str]
    true_genotype: tuple[int, int]


def simulate_locus(rng: np.random.Generator, name: str = "locus",
                   length: int = 4000, n_haps: int = 6,
                   divergence: float = 0.01) -> SimLocus:
    base = random_genome(rng, length)
    haps = [base]
    for _ in range(n_haps - 1):
        haps.append(mutate(rng, base, snp_rate=divergence, indel_rate=divergence / 10))
    order = rng.permutation(n_haps)
    haps = [haps[i] for i in order]
    gt = tuple(sorted(rng.choice(n_haps, size=2, replace=True).tolist()))
    return SimLocus(name, haps, [f"{name}*{i:02d}" for i in range(n_haps)], gt)


@dataclass
class ErrorModel:
    mismatch: float = 0.002
    insertion: float = 0.0002
    deletion: float = 0.0002

    def apply(self, rng: np.random.Generator, seq: np.ndarray) -> np.ndarray:
        out = []
        for c in seq:
            r = rng.random()
            if r < self.deletion:
                continue
            if r < self.deletion + self.insertion:
                out.append(int(rng.integers(0, 4)))
            if r < self.deletion + self.insertion + self.mismatch:
                out.append(int((c + rng.integers(1, 4)) % 4))
            else:
                out.append(int(c))
        return np.array(out, dtype=np.int8)


@dataclass
class SimReads:
    reads1: list[np.ndarray]
    reads2: list[np.ndarray]          # empty list entries for single-end
    names: list[str]
    source_hap: list[int]             # which haplotype each pair came from
    source_pos: list[int]


def simulate_paired_reads(rng: np.random.Generator, seqs: list[np.ndarray],
                          depth: float = 30.0, read_len: int = 150,
                          insert_mean: float = 400.0, insert_sd: float = 60.0,
                          errors: ErrorModel | None = None,
                          prefix: str = "rd") -> SimReads:
    """Simulates paired-end reads uniformly from `seqs` (e.g. the two true
    haplotypes) at the given per-haplotype depth."""
    errors = errors or ErrorModel()
    reads1, reads2, names, src, pos = [], [], [], [], []
    counter = 0
    for hap_ix, seq in enumerate(seqs):
        n_pairs = int(depth * seq.size / (2 * read_len) + 0.5)
        for _ in range(n_pairs):
            insert = max(int(rng.normal(insert_mean, insert_sd)), read_len)
            insert = min(insert, seq.size)
            start = int(rng.integers(0, max(seq.size - insert, 0) + 1))
            frag = seq[start:start + insert]
            r1 = errors.apply(rng, frag[:read_len])
            r2 = errors.apply(rng, dna.revcomp(frag[-read_len:]))
            if rng.random() < 0.5:
                r1, r2 = r2, r1  # strand swap: mate1 may be on either strand
            reads1.append(r1)
            reads2.append(r2)
            names.append(f"{prefix}{counter:06d}")
            src.append(hap_ix)
            pos.append(start)
            counter += 1
    return SimReads(reads1, reads2, names, src, pos)


def simulate_single_reads(rng: np.random.Generator, seqs: list[np.ndarray],
                          depth: float = 30.0, read_len_mean: int = 10000,
                          read_len_sd: int = 3000,
                          errors: ErrorModel | None = None,
                          prefix: str = "lr") -> SimReads:
    """Long single-end reads (HiFi/ONT-like)."""
    errors = errors or ErrorModel(mismatch=0.01, insertion=0.005, deletion=0.005)
    reads, names, src, pos = [], [], [], []
    counter = 0
    for hap_ix, seq in enumerate(seqs):
        target_bases = depth * seq.size
        covered = 0
        while covered < target_bases:
            L = max(int(rng.normal(read_len_mean, read_len_sd)), 300)
            L = min(L, seq.size)
            start = int(rng.integers(0, seq.size - L + 1))
            frag = seq[start:start + L]
            if rng.random() < 0.5:
                frag = dna.revcomp(frag)
            reads.append(errors.apply(rng, frag))
            names.append(f"{prefix}{counter:06d}")
            src.append(hap_ix)
            pos.append(start)
            covered += L
            counter += 1
    return SimReads(reads, [], names, src, pos)
