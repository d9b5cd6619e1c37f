"""Sequence containers: contig names/sets, genotypes, intervals.

Counterpart of reference seq/contigs.rs and seq/interv.rs, simplified to
Python dataclasses around numpy code arrays.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations_with_replacement

import numpy as np

from . import dna


class ContigNames:
    """Names and lengths with id lookup (contigs.rs:25-226)."""

    def __init__(self, tag: str, names: list[str], lengths: list[int]):
        assert len(names) == len(lengths)
        self.tag = tag
        self.names = list(names)
        self.lengths = np.asarray(lengths, dtype=np.int64)
        self._ids = {n: i for i, n in enumerate(names)}
        assert len(self._ids) == len(names), "Duplicate contig names"

    def __len__(self) -> int:
        return len(self.names)

    def id_of(self, name: str) -> int:
        return self._ids[name]

    def try_id_of(self, name: str):
        return self._ids.get(name)

    def name_of(self, cid: int) -> str:
        return self.names[cid]

    def len_of(self, cid: int) -> int:
        return int(self.lengths[cid])


class ContigSet:
    """Haplotype panel of a locus: names + code sequences (+ optional k-mer
    counts), counterpart of contigs.rs:265-404."""

    def __init__(self, tag: str, names: list[str], seqs: list[np.ndarray]):
        self.contigs = ContigNames(tag, names, [len(s) for s in seqs])
        self.seqs = [np.asarray(s, dtype=np.int8) for s in seqs]

    @property
    def tag(self) -> str:
        return self.contigs.tag

    def __len__(self) -> int:
        return len(self.seqs)

    @classmethod
    def from_strs(cls, tag: str, named_seqs: list[tuple[str, str]]) -> "ContigSet":
        names = [n for n, _ in named_seqs]
        seqs = [dna.encode(s) for _, s in named_seqs]
        return cls(tag, names, seqs)


@dataclass(frozen=True)
class Genotype:
    """Multiset of contig ids, named "hapA,hapB" (contigs.rs:407-457)."""
    ids: tuple[int, ...]

    def name(self, contigs: ContigNames) -> str:
        return ",".join(contigs.name_of(i) for i in self.ids)

    @property
    def ploidy(self) -> int:
        return len(self.ids)

    @staticmethod
    def generate_all(n_contigs: int, ploidy: int) -> list["Genotype"]:
        """Combinations with replacement (ext/vec.rs:322, genotype.rs:1102-1106)."""
        return [Genotype(c) for c in combinations_with_replacement(range(n_contigs), ploidy)]

    @staticmethod
    def parse(s: str, contigs: ContigNames) -> "Genotype":
        return Genotype(tuple(contigs.id_of(p) for p in s.split(",")))


@dataclass(frozen=True)
class Interval:
    """Half-open [start, end) interval on a contig (interv.rs:34-326)."""
    contig_id: int
    start: int
    end: int
    name: str = field(default="", compare=False)

    def __post_init__(self):
        assert 0 <= self.start < self.end

    def __len__(self) -> int:
        return self.end - self.start

    @property
    def middle(self) -> int:
        return (self.start + self.end) // 2

    def padded(self, pad: int, contig_len: int) -> "Interval":
        return Interval(self.contig_id, max(self.start - pad, 0),
                        min(self.end + pad, contig_len), self.name)

    @staticmethod
    def parse_bed(fields, contigs: ContigNames) -> "Interval":
        cid = contigs.id_of(fields[0])
        name = fields[3] if len(fields) > 3 else ""
        return Interval(cid, int(fields[1]), int(fields[2]), name)


def guess_genome_version(genome: dict) -> str | None:
    """Identifies the reference build from chr1's length
    (contigs.rs:244-255): CHM13 / GRCh38 / GRCh37, else None."""
    for key in ("chr1", "1"):
        if key in genome:
            n = genome[key].size if hasattr(genome[key], "size") else int(genome[key])
            return {248_387_328: "CHM13",
                    248_956_422: "GRCh38",
                    249_250_621: "GRCh37"}.get(n)
    return None
