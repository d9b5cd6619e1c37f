"""Background distributions estimated during preprocessing.

Counterpart of reference src/bg/: `BgDistr` bundles sequencing info, the
insert-size model, the error profile and the GC-conditional read-depth model,
serialized to a gzipped JSON (`distr.json.gz`) with the same field layout as
the reference's distr.gz (bg/mod.rs:147-177) for interop/A-B testing.
"""
from __future__ import annotations

import enum
import gzip
import json
from dataclasses import dataclass
from pathlib import Path

from .insertsz import InsertDistr
from .err_prof import ErrorProfile
from .depth import ReadDepth


class Technology(enum.Enum):
    """Sequencing technology with per-tech defaults (bg/mod.rs:180-288)."""
    ILLUMINA = "illumina"
    HIFI = "hifi"
    PACBIO = "pacbio"
    NANOPORE = "ont"

    @classmethod
    def parse(cls, s: str) -> "Technology":
        s = s.lower()
        aliases = {"sr": cls.ILLUMINA, "pb": cls.PACBIO, "nanopore": cls.NANOPORE}
        if s in aliases:
            return aliases[s]
        for v in cls:
            if v.value == s:
                return v
        raise ValueError(f"Unknown technology {s!r}")

    @property
    def has_gc_bias(self) -> bool:
        return self is Technology.ILLUMINA

    @property
    def paired_end_allowed(self) -> bool:
        return self is Technology.ILLUMINA

    @property
    def are_short_reads(self) -> bool:
        return self is Technology.ILLUMINA

    def default_match_frac(self, is_paired_end: bool) -> float:
        """(bg/mod.rs:245-252)."""
        if self is Technology.ILLUMINA:
            return 0.5 if is_paired_end else 0.7
        assert not is_paired_end, "Paired-end long reads are not supported"
        return 0.5

    def default_unmapped_penalty(self) -> float:
        """ln-space penalty (model/mod.rs:55-60): 1e-10 SR, 1e-100 LR."""
        import numpy as np
        return float(np.log(10.0) * (-10.0 if self is Technology.ILLUMINA else -100.0))

    @property
    def expect_mean_length(self) -> tuple[float, float]:
        return {
            Technology.ILLUMINA: (100.0, 400.0),
            Technology.HIFI: (5e3, 3e4),
            Technology.PACBIO: (5e3, 1.5e5),
            Technology.NANOPORE: (5e3, 5e5),
        }[self]


@dataclass
class SequencingInfo:
    """(bg/mod.rs:290-364)."""
    read_len: float
    technology: Technology
    total_reads: int | None = None
    file_size: int | None = None

    def to_json(self):
        return dict(read_len=self.read_len, technology=self.technology.value,
                    total_reads=self.total_reads, file_size=self.file_size)

    @classmethod
    def from_json(cls, obj):
        return cls(float(obj["read_len"]), Technology.parse(obj["technology"]),
                   obj.get("total_reads"), obj.get("file_size"))


@dataclass
class BgDistr:
    seq_info: SequencingInfo
    insert_distr: InsertDistr
    err_prof: ErrorProfile
    depth: ReadDepth | None = None

    def to_json(self):
        obj = dict(
            seq_info=self.seq_info.to_json(),
            insert_distr=self.insert_distr.to_json(),
            error_profile=self.err_prof.to_json(),
        )
        if self.depth is not None:
            obj["bg_depth"] = self.depth.to_json()
        return obj

    @classmethod
    def from_json(cls, obj):
        return cls(
            seq_info=SequencingInfo.from_json(obj["seq_info"]),
            insert_distr=InsertDistr.from_json(obj["insert_distr"]),
            err_prof=ErrorProfile.from_json(obj["error_profile"]),
            depth=ReadDepth.from_json(obj["bg_depth"]) if "bg_depth" in obj else None,
        )

    def save(self, path) -> None:
        with gzip.open(Path(path), "wt") as f:
            json.dump(self.to_json(), f)

    @classmethod
    def load(cls, path) -> "BgDistr":
        with gzip.open(Path(path), "rt") as f:
            return cls.from_json(json.load(f))
