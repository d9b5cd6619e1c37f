"""Discrete distributions: Negative Binomial, Beta-Binomial, Bayes calculator.

Counterparts: math/distr/nbinom.rs, betabinom.rs, bayes.rs, lincache.rs.
The reference caches `ln_pmf` values per (distribution, k<256); here the
equivalents are *vectorized table builders* — e.g. `NBinom.ln_pmf(np.arange(N))`
— which feed dense device-resident tables (see ops/tables.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy.optimize import minimize
from scipy.special import betainc, betaln, gammaln


@dataclass(frozen=True)
class NBinom:
    """Negative Binomial with failure-count pmf (nbinom.rs:23-152).

    n: number of successes, p: success probability; k = number of failures.
    """
    n: float
    p: float

    def __post_init__(self):
        assert self.n > 0 and 0.0 <= self.p <= 1.0, (self.n, self.p)

    @classmethod
    def estimate(cls, m: float, v: float) -> "NBinom":
        """From mean and variance; requires 0 < m < v (nbinom.rs:46-49)."""
        assert 0.0 < m < v, (m, v)
        return cls(m * m / (v - m), m / v)

    @classmethod
    def estimate_corrected(cls, m: float, v: float) -> "NBinom":
        """Close-to-Poisson fallback when variance is too low (nbinom.rs:53-65)."""
        assert m > 0.0
        PMAX = 0.99999
        p = m / v
        if p > PMAX:
            return cls(PMAX * m / (1.0 - PMAX), PMAX)
        return cls(m * m / (v - m), p)

    def mul(self, coeff: float) -> "NBinom":
        """n *= coeff, same p (nbinom.rs:68-70)."""
        return NBinom(self.n * coeff, self.p)

    def binomial_subsample(self, rate: float) -> "NBinom":
        return NBinom(self.n, self.p / (self.p + rate - self.p * rate))

    def ln_pmf(self, k):
        """Vectorized ln pmf (nbinom.rs:128-131)."""
        x = np.asarray(k, dtype=np.float64)
        lnq = np.log1p(-self.p)
        c = self.n * np.log(self.p) - gammaln(self.n)
        return c + gammaln(self.n + x) - gammaln(x + 1.0) + x * lnq

    def mean(self) -> float:
        return self.n * (1.0 - self.p) / self.p

    def variance(self) -> float:
        return self.n * (1.0 - self.p) / (self.p * self.p)

    def mode(self) -> int:
        return int(max(np.floor((self.n - 1.0) * (1.0 - self.p) / self.p), 0.0))

    def cdf(self, k):
        """Regularized incomplete beta (nbinom.rs:144-147)."""
        return betainc(self.n, np.asarray(k, dtype=np.float64) + 1.0, self.p)

    def quantile(self, q: float) -> float:
        """Smallest k with cdf(k) >= q (simple doubling + bisect search)."""
        hi = max(8, int(self.mean() + 10 * np.sqrt(self.variance())))
        while self.cdf(hi) < q:
            hi *= 2
        lo = 0
        while lo < hi:
            mid = (lo + hi) // 2
            if self.cdf(mid) >= q:
                hi = mid
            else:
                lo = mid + 1
        return float(lo)


def fit_nbinom_regularized(sample_mean: float, sample_var: float,
                           rate: float = 1.0, lam: float = 1e-5) -> NBinom:
    """L1-regularized (on n) moment fit under binomial subsampling, solved by
    Nelder-Mead (nbinom.rs:154-244).

    mean(n, p) = rate·n·(1-p)/p; var(n, p) = rate·n·(1-p)·(p + rate - p·rate)/p².
    Cost = (mean-err)² + (var-err)² + λ·n.
    """
    LARGE = 1e30

    def cost(param):
        n, p = param
        if n <= 0.0 or p <= 0.0 or p >= 1.0:
            return LARGE
        mean_err = rate * n * (1.0 - p) / p - sample_mean
        var_err = rate * n * (1.0 - p) * (p + rate - p * rate) / (p * p) - sample_var
        return mean_err * mean_err + var_err * var_err + lam * n

    # Same three simplex vertices as the reference (nbinom.rs:230-234).
    simplex = np.array([[10.0, 0.3], [20.0, 0.7], [30.0, 0.3]])
    res = minimize(cost, simplex[0], method="Nelder-Mead",
                   options=dict(initial_simplex=simplex, xatol=1e-10, fatol=1e-12,
                                maxiter=4000, maxfev=4000))
    n, p = res.x
    return NBinom(float(n), float(min(max(p, 1e-12), 1.0 - 1e-12)))


@dataclass(frozen=True)
class BetaBinomial:
    """Beta-Binomial over (k successes out of n trials) (betabinom.rs:13-122)."""
    alpha: float
    beta: float

    def __post_init__(self):
        assert self.alpha > 0.0 and self.beta > 0.0

    def ln_pmf(self, k, n):
        k = np.asarray(k, dtype=np.float64)
        n = np.asarray(n, dtype=np.float64)
        inner = -betaln(n - k + 1.0, k + 1.0) + betaln(k + self.alpha, n - k + self.beta)
        return inner - np.log(n + 1.0) - betaln(self.alpha, self.beta)

    def inv_cdf(self, n: int, cdf: float) -> int:
        """Largest k such that CDF(k) <= cdf (betabinom.rs:55-70)."""
        pmf = np.exp(self.ln_pmf(np.arange(n + 1), n))
        cs = np.cumsum(pmf)
        over = np.nonzero(cs > cdf)[0]
        # k=0 is always allowed even if PMF(0) > cdf.
        if over.size == 0:
            return n
        return int(max(over[0] - 1, 0)) if over[0] > 0 else 0

    def inv_cdf2(self, n: int, cdf1: float, cdf2: float) -> tuple[int, int]:
        return self.inv_cdf(n, cdf1), self.inv_cdf(n, cdf2)


def fit_betabinom_mle(observations, unif_coef: float) -> BetaBinomial:
    """Max-likelihood Beta-Binomial fit over (k, n, weight) triples with a
    uniform-mixture regularizer (betabinom.rs:105-156).

    lik = Σ w · ln( (1-unif_coef)·BB(k|n) + unif_coef )   [ln-space mixture]
    """
    obs = np.asarray([(k, n, w) for k, n, w in observations], dtype=np.float64)
    ks, ns, ws = obs[:, 0], obs[:, 1], obs[:, 2]
    bb_mult = np.log1p(-unif_coef)
    unif_mult = np.log(unif_coef) if unif_coef > 0 else -np.inf
    LARGE = 1e30
    LIMIT = 1e5

    def cost(param):
        a, b = param
        if a <= 0.0 or b <= 0.0 or a >= LIMIT or b >= LIMIT:
            return LARGE
        lp = BetaBinomial(a, b).ln_pmf(ks, ns) + bb_mult
        mixed = np.logaddexp(lp, unif_mult)
        return -float(np.sum(ws * mixed))

    simplex = np.array([[0.7, 50.0], [0.3, 100.0], [0.5, 10.0]])
    res = minimize(cost, simplex[0], method="Nelder-Mead",
                   options=dict(initial_simplex=simplex, xatol=1e-9, fatol=1e-10,
                                maxiter=4000, maxfev=4000))
    a, b = res.x
    return BetaBinomial(float(a), float(b))


def bayes_ln_pmf(null_ln_pmf: np.ndarray, alt_ln_pmfs: np.ndarray) -> np.ndarray:
    """ln posterior of the null hypothesis under uniform priors
    (bayes.rs:26-36): null - logsumexp(null, alts).

    null_ln_pmf: [..., K]; alt_ln_pmfs: [n_alts, ..., K].
    """
    stacked = np.concatenate([null_ln_pmf[None], alt_ln_pmfs], axis=0)
    m = np.max(stacked, axis=0)
    total = m + np.log(np.sum(np.exp(stacked - m), axis=0))
    return null_ln_pmf - total
