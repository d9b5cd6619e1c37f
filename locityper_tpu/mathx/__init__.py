"""Numeric core: log-space helpers, Phred conversion, one-sided t-tests.

Counterpart of reference src/math/mod.rs (Ln :29-95, Phred :98-137,
t-tests :180-220).  Host paths are float64 numpy/scipy; the device path
re-implements what is needed inside jitted kernels (see ops/).
"""
from __future__ import annotations

import numpy as np
from scipy.special import log1p
from scipy.stats import t as _student_t

from .distr import NBinom, BetaBinomial, bayes_ln_pmf  # noqa: F401

LN10 = float(np.log(10.0))
INV_LN10 = 1.0 / LN10


def from_log10(l10):
    return np.asarray(l10, dtype=np.float64) * LN10


def to_log10(ln):
    return np.asarray(ln, dtype=np.float64) * INV_LN10


def ln_add(a: float, b: float) -> float:
    """log(exp(a) + exp(b)) (math/mod.rs:29-35), anchored at the larger value
    so the exp argument is always <= 0 (no overflow)."""
    if a >= b:
        return a if b == -np.inf else a + log1p(np.exp(b - a))
    return b if a == -np.inf else b + log1p(np.exp(a - b))


def ln_sum(values) -> float:
    """logsumexp (math/mod.rs:50-76)."""
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return -np.inf
    m = np.max(values)
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.sum(np.exp(values - m))))


def phred_from_ln_prob(lprob: float) -> float:
    return -10.0 * to_log10(lprob)


def unpaired_onesided_t_test(mean1, var1, mean2, var2, n, eq_var=False) -> float:
    """P(observe t-stat | H0: mean1 >= mean2), equal sample sizes
    (math/mod.rs:180-197, Welch by default)."""
    var_sum = var1 + var2
    t_stat = (mean1 - mean2) * np.sqrt(n / var_sum)
    if eq_var:
        freedom = 2.0 * n - 2.0
    else:
        freedom = (n - 1.0) * var_sum * var_sum / (var1 * var1 + var2 * var2)
    return float(_student_t.cdf(t_stat, freedom))


def unpaired_onesided_t_test_diffsizes(mean1, var1, mean2, var2, n1, n2, eq_var=False) -> float:
    """Same, different sample sizes (math/mod.rs:200-220)."""
    nvar1 = var1 / n1
    nvar2 = var2 / n2
    sum_nvar = nvar1 + nvar2
    t_stat = (mean1 - mean2) / np.sqrt(sum_nvar)
    if eq_var:
        freedom = n1 + n2 - 2.0
    else:
        freedom = sum_nvar * sum_nvar / (nvar1 * nvar1 / (n1 - 1.0) + nvar2 * nvar2 / (n2 - 1.0))
    return float(_student_t.cdf(t_stat, freedom))


def mean_variance(values) -> tuple[float, float]:
    """Sample mean and unbiased variance; (nan, nan) if too short."""
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        return float("nan"), float("nan")
    if values.size == 1:
        return float(values[0]), float("nan")
    return float(np.mean(values)), float(np.var(values, ddof=1))


def interpol_quantile(values, q: float) -> float:
    """Linear-interpolation quantile on a sorted copy (ext/vec.rs F64Ext)."""
    return float(np.quantile(np.asarray(values, dtype=np.float64), q))


def round_signif(x: float, digits: int) -> float:
    if x == 0.0:
        return 0.0
    shift = int(np.floor(np.log10(abs(x)))) + 1 - digits
    fct = 10.0 ** shift
    return round(x / fct) * fct
