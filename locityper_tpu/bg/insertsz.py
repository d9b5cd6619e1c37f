"""Insert-size model (counterpart of reference bg/insertsz.rs).

NBinom fitted to insert sizes truncated at 3× the 0.99 quantile
(insertsz.rs:67-143); FF/RR-dominant libraries rejected (:122-126);
`insert_penalty` = pmf at the mode (:172-175).  The pmf is precomputed as a
dense table — the device-side pairing kernel indexes it directly.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..mathx.distr import NBinom

MAX_REASONABLE_INSERT = 500_000
INS_QUANTILE = 0.99
INS_QUANTILE_MULT = 3.0
ORIENT_THRESH = 0.05
MAX_CACHE_SIZE = 65_536


@dataclass
class InsertDistr:
    distr: NBinom | None = None
    _cache: np.ndarray | None = field(default=None, repr=False)
    mode_prob: float = float("nan")

    @property
    def is_paired_end(self) -> bool:
        return self.distr is not None

    @classmethod
    def undefined(cls) -> "InsertDistr":
        return cls()

    @classmethod
    def estimate(cls, insert_sizes: np.ndarray, same_orient_count: int,
                 opp_orient_count: int) -> "InsertDistr":
        """insert_sizes: raw insert sizes of full pairs (any order);
        orientation counts: FR/RF = opposite strands, FF/RR = same strand."""
        sizes = np.asarray(insert_sizes, dtype=np.float64)
        sizes = sizes[sizes < MAX_REASONABLE_INSERT]
        if sizes.size < 1000:
            raise ValueError(
                f"Not enough paired reads ({sizes.size}) to estimate insert sizes")
        total = same_orient_count + opp_orient_count
        if total > 0:
            opp_frac = opp_orient_count / total
            same_frac = same_orient_count / total
            if opp_frac < ORIENT_THRESH or same_frac >= ORIENT_THRESH:
                raise ValueError("FF/RR-dominant libraries are not supported")
        limit = INS_QUANTILE_MULT * np.quantile(sizes, INS_QUANTILE)
        lim = sizes[sizes <= limit]
        mean = float(np.mean(lim))
        var = float(np.var(lim, ddof=1))
        distr = NBinom.estimate_corrected(mean, var)
        return cls.from_nbinom(distr)

    @classmethod
    def from_nbinom(cls, distr: NBinom) -> "InsertDistr":
        size = min(MAX_CACHE_SIZE, int(distr.quantile(0.99999)) + 1)
        cache = distr.ln_pmf(np.arange(size))
        mode_prob = float(cache[min(distr.mode(), size - 1)])
        return cls(distr, cache, mode_prob)

    def ln_prob(self, sz) -> np.ndarray:
        """Vectorized insert-size ln-pmf (values beyond the cache computed
        directly)."""
        sz = np.atleast_1d(np.asarray(sz, dtype=np.int64))
        cache = self._cache
        out = np.where(sz < cache.size, cache[np.minimum(sz, cache.size - 1)],
                       self.distr.ln_pmf(sz))
        return out

    @property
    def insert_penalty(self) -> float:
        """Penalty of an unpaired mate: pmf at the mode (insertsz.rs:172-175)."""
        return self.mode_prob

    def confidence_interval(self, level: float) -> tuple[int, int]:
        q = 0.5 * (1.0 - level)
        return (int(max(np.floor(self.distr.quantile(q) - 1e-8), 0.0)),
                int(np.ceil(self.distr.quantile(1.0 - q) + 1e-8)))

    def cache_table(self, size: int) -> np.ndarray:
        """Dense [size] ln-pmf table for the device pairing kernel."""
        return self.distr.ln_pmf(np.arange(size)) if self.distr else np.zeros(size)

    def to_json(self):
        if self.distr is None:
            return {}
        return dict(n=self.distr.n, p=self.distr.p)

    @classmethod
    def from_json(cls, obj):
        if not obj:
            return cls.undefined()
        return cls.from_nbinom(NBinom(float(obj["n"]), float(obj["p"])))
