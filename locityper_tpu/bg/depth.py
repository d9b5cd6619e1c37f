"""GC-conditional background read depth (counterpart of reference bg/depth.rs).

Pipeline (depth.rs:296-348): count first-mate read middles per window →
group windows by GC% (101 bins) → LOESS means (frac=0.5) + LOESS variances
(frac=1, ≥10-obs bins, sqrt-weights) → blur sparse GC tails → per-GC NBinom
via L1-regularized Nelder-Mead with subsampling correction, scaled to
haploid single-read-end depth.  JSON layout mirrors depth.rs:387-413.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mathx.distr import NBinom, fit_nbinom_regularized
from ..mathx.loess import loess

GC_BINS = 101
VAR_MIN_WINDOWS = 10


@dataclass
class ReadDepthParams:
    """(depth.rs:129-202)."""
    ploidy: int = 2
    window_size: int | None = None
    boundary_size: int = 1000
    uniq_kmer_perc: float = 90.0
    frac_windows: float = 0.5
    min_tail_obs: int = 100
    tail_var_mult: float = 0.02


@dataclass
class ReadDepth:
    ploidy: int
    window_size: int
    neighb_size: int
    distributions: list[NBinom]          # one per GC bin 0..=100

    def depth_distribution(self, gc: int) -> NBinom:
        return self.distributions[gc]

    def mul_depth(self, rate: float) -> None:
        """--like rescaling (depth.rs:380-385)."""
        self.distributions = [d.mul(rate) for d in self.distributions]

    def nbinom_table(self, mul_coef: float, max_depth: int) -> np.ndarray:
        """Dense [GC_BINS, max_depth] ln-pmf table of the CN=1 distribution
        scaled by `mul_coef` — input to the device depth-likelihood tables."""
        ks = np.arange(max_depth)
        return np.stack([d.mul(mul_coef).ln_pmf(ks) for d in self.distributions])

    def to_json(self):
        return dict(ploidy=self.ploidy, window=self.window_size,
                    neighb=self.neighb_size,
                    n=[d.n for d in self.distributions],
                    p=[d.p for d in self.distributions])

    @classmethod
    def from_json(cls, obj):
        distrs = [NBinom(float(n), float(p)) for n, p in zip(obj["n"], obj["p"])]
        return cls(int(obj["ploidy"]), int(obj["window"]), int(obj["neighb"]), distrs)

    @classmethod
    def estimate(cls, depth1: np.ndarray, gc_contents: np.ndarray,
                 window_size: int, neighb_size: int,
                 params: ReadDepthParams, subsampling_rate: float = 1.0,
                 has_gc_bias: bool = True) -> "ReadDepth":
        """depth1: first-mate counts of kept windows; gc_contents: their GC%."""
        depth1 = np.asarray(depth1, dtype=np.float64)
        gc_contents = np.asarray(gc_contents, dtype=np.float64)
        order = np.argsort(gc_contents, kind="stable")
        depth1, gc_contents = depth1[order], gc_contents[order]
        ploidy = float(params.ploidy)

        if not has_gc_bias:
            mean = float(np.mean(depth1))
            var = float(np.var(depth1, ddof=1))
            d = fit_nbinom_regularized(mean, var, rate=subsampling_rate).mul(1.0 / ploidy)
            return cls(params.ploidy, window_size, neighb_size, [d] * GC_BINS)

        gc_bins = _find_gc_bins(gc_contents)
        means, variances = _predict_mean_var(gc_contents, gc_bins, depth1,
                                             params.frac_windows)
        means, variances = _blur_boundary_values(means, variances, gc_bins, params)
        distrs = [fit_nbinom_regularized(m, v, rate=subsampling_rate).mul(1.0 / ploidy)
                  for m, v in zip(means, variances)]
        return cls(params.ploidy, window_size, neighb_size, distrs)


def _find_gc_bins(gc_sorted: np.ndarray) -> list[tuple[int, int]]:
    """Per GC value, the index span of windows with GC in [gc-0.5, gc+0.5)
    (depth.rs:47-60)."""
    res = []
    i = 0
    n = gc_sorted.size
    for gc in range(GC_BINS):
        j = int(np.searchsorted(gc_sorted, gc + 0.5, side="right"))
        res.append((i, j))
        i = j
    return res


def _predict_mean_var(gc_sorted, gc_bins, depth, frac_windows):
    """(depth.rs:69-91)."""
    xout = np.arange(GC_BINS, dtype=np.float64)
    means = loess(gc_sorted, depth, xout, frac=frac_windows, degree=1)
    n = depth.size
    xs, ys, ws = [], [], []
    for gc, (i, j) in enumerate(gc_bins):
        if j - i >= VAR_MIN_WINDOWS:
            xs.append(float(gc))
            ys.append(float(np.var(depth[i:j], ddof=1)))
            ws.append(np.sqrt((j - i) / n))
    variances = loess(np.array(xs), np.array(ys), xout, frac=1.0, degree=1,
                      weights=np.array(ws))
    return means, variances


def _blur_boundary_values(means, variances, gc_bins, params):
    """Extreme-GC tail blurring (depth.rs:98-126)."""
    min_obs = params.min_tail_obs
    n = len(gc_bins)
    m = gc_bins[-1][1]
    left_ix = next((i for i, (_, end) in enumerate(gc_bins) if end >= min_obs), n)
    right_candidates = [i for i, (start, _) in enumerate(gc_bins) if m - start >= min_obs]
    right_ix = right_candidates[-1] if right_candidates else 0
    assert left_ix < right_ix, "Too few windows to calculate read depth"
    bm = means.copy()
    bv = variances.copy()
    for i in range(left_ix):
        bm[i] = means[left_ix]
        mult = 1.0 + (left_ix - i) * params.tail_var_mult
        bv[i] = max(mult * variances[left_ix], variances[i])
    for i in range(right_ix + 1, n):
        bm[i] = means[right_ix]
        mult = 1.0 + (i - right_ix) * params.tail_var_mult
        bv[i] = max(mult * variances[right_ix], variances[i])
    return bm, bv


def auto_window_size(mean_read_len: float) -> tuple[int, int]:
    """(window, neighbourhood) sizes (bg/windows.rs:102-110): window =
    2/3 read length clamped to [20, 5000]; neighbourhood ≥ 300."""
    w = int(np.clip(round(mean_read_len * 2.0 / 3.0), 20, 5000))
    return w, max(w, 300)


def count_window_depth(middles: np.ndarray, read_end: np.ndarray,
                       region_start: int, region_end: int,
                       window_size: int) -> np.ndarray:
    """[n_windows, 2] counts of alignment middles per window per read end
    (depth.rs:27-39): window = (middle - start) // size for middles inside
    [start, start + n*size)."""
    n_windows = (region_end - region_start) // window_size
    sum_len = n_windows * window_size
    start = region_start + (region_end - region_start - sum_len) // 2
    w = (middles - start) // window_size
    ok = (middles >= start) & (w >= 0) & (w < n_windows)
    out = np.zeros((n_windows, 2), dtype=np.int64)
    np.add.at(out, (w[ok], read_end[ok]), 1)
    return out
