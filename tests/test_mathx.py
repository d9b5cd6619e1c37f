import numpy as np
import pytest
from scipy import stats

from locityper_tpu import mathx
from locityper_tpu.mathx import distr
from locityper_tpu.mathx.loess import loess


class TestLn:
    def test_ln_add(self):
        a, b = np.log(0.3), np.log(0.4)
        assert mathx.ln_add(a, b) == pytest.approx(np.log(0.7), rel=1e-12)
        assert mathx.ln_add(-np.inf, b) == b
        assert mathx.ln_add(a, -np.inf) == a

    def test_ln_sum(self):
        vals = np.log([0.1, 0.2, 0.3])
        assert mathx.ln_sum(vals) == pytest.approx(np.log(0.6), rel=1e-12)
        assert mathx.ln_sum([]) == -np.inf


class TestNBinom:
    def test_pmf_matches_scipy(self):
        nb = distr.NBinom(7.3, 0.42)
        ks = np.arange(0, 60)
        ours = nb.ln_pmf(ks)
        ref = stats.nbinom.logpmf(ks, 7.3, 0.42)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_cdf_matches_scipy(self):
        nb = distr.NBinom(4.0, 0.3)
        ks = np.arange(0, 50)
        np.testing.assert_allclose(nb.cdf(ks), stats.nbinom.cdf(ks, 4.0, 0.3), rtol=1e-9)

    def test_moments(self):
        nb = distr.NBinom.estimate(10.0, 25.0)
        assert nb.mean() == pytest.approx(10.0)
        assert nb.variance() == pytest.approx(25.0)

    def test_mul(self):
        nb = distr.NBinom(5.0, 0.4).mul(2.0)
        assert nb.n == pytest.approx(10.0)
        assert nb.p == pytest.approx(0.4)

    def test_quantile(self):
        nb = distr.NBinom(6.0, 0.35)
        q = nb.quantile(0.99)
        assert stats.nbinom.ppf(0.99, 6.0, 0.35) == pytest.approx(q)

    def test_regularized_fit_recovers_moments(self):
        fit = distr.fit_nbinom_regularized(20.0, 60.0, rate=1.0)
        assert fit.mean() == pytest.approx(20.0, rel=0.02)
        assert fit.variance() == pytest.approx(60.0, rel=0.05)

    def test_regularized_fit_with_subsampling(self):
        # Observed = Binomial(rate)-thinned NBinom: recover full-depth distr.
        true = distr.NBinom(8.0, 0.25)
        rate = 0.5
        sub = true.binomial_subsample(rate)
        fit = distr.fit_nbinom_regularized(sub.mean(), sub.variance(), rate=rate)
        assert fit.mean() == pytest.approx(true.mean(), rel=0.05)


class TestBetaBinomial:
    def test_pmf_matches_scipy(self):
        bb = distr.BetaBinomial(0.8, 40.0)
        n = 150
        ks = np.arange(0, 30)
        ours = bb.ln_pmf(ks, n)
        ref = stats.betabinom.logpmf(ks, n, 0.8, 40.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)

    def test_pmf_sums_to_one(self):
        bb = distr.BetaBinomial(0.5, 20.0)
        total = np.exp(bb.ln_pmf(np.arange(101), 100)).sum()
        assert total == pytest.approx(1.0, rel=1e-9)

    def test_inv_cdf(self):
        bb = distr.BetaBinomial(0.7, 50.0)
        n = 150
        k = bb.inv_cdf(n, 0.99)
        cs = np.cumsum(np.exp(bb.ln_pmf(np.arange(n + 1), n)))
        assert cs[k] <= 0.99 or k == 0
        if k + 1 <= n:
            assert cs[k + 1] > 0.99

    def test_mle_fit(self):
        rng = np.random.default_rng(0)
        a, b = 0.9, 60.0
        n = 150
        ps = rng.beta(a, b, size=3000)
        ks = rng.binomial(n, ps)
        uniq, cnt = np.unique(ks, return_counts=True)
        triples = [(int(k), n, float(c)) for k, c in zip(uniq, cnt)]
        fit = distr.fit_betabinom_mle(triples, unif_coef=1e-3)
        assert fit.alpha / (fit.alpha + fit.beta) == pytest.approx(a / (a + b), rel=0.15)


class TestBayes:
    def test_posterior(self):
        null = distr.NBinom(10.0, 0.5)
        alts = [null.mul(0.3), null.mul(2.0)]
        ks = np.arange(0, 64)
        got = distr.bayes_ln_pmf(null.ln_pmf(ks), np.stack([a.ln_pmf(ks) for a in alts]))
        # Direct computation.
        p0 = null.ln_pmf(ks)
        stack = np.stack([p0] + [a.ln_pmf(ks) for a in alts])
        expect = p0 - mathx.ln_sum(stack[:, 0]) if False else p0 - \
            np.log(np.sum(np.exp(stack - stack.max(0)), axis=0)) - stack.max(0)
        np.testing.assert_allclose(got, expect, rtol=1e-10)
        # Posterior prob of null at mode should be < 1.
        assert np.all(got < 0.0)


class TestTTest:
    def test_against_scipy(self):
        rng = np.random.default_rng(1)
        x = rng.normal(0.0, 1.0, 30)
        y = rng.normal(0.5, 1.2, 30)
        ours = mathx.unpaired_onesided_t_test(
            x.mean(), x.var(ddof=1), y.mean(), y.var(ddof=1), 30.0)
        ref = stats.ttest_ind(x, y, equal_var=False, alternative="less").pvalue
        # one-sided P(mean1 >= mean2 rejected) — scipy 'less' pvalue = cdf(t).
        assert ours == pytest.approx(ref, rel=1e-9)


class TestLoess:
    def test_linear_recovery(self):
        x = np.linspace(0, 10, 200)
        y = 3.0 + 2.0 * x
        out = loess(x, y, xout=np.array([2.0, 5.0, 8.0]), frac=0.3, degree=1)
        np.testing.assert_allclose(out, [7.0, 13.0, 19.0], rtol=1e-6)

    def test_smooth_noisy(self):
        rng = np.random.default_rng(2)
        x = np.sort(rng.uniform(0, 100, 500))
        y = np.sin(x / 15.0) + rng.normal(0, 0.05, 500)
        xout = np.array([20.0, 50.0, 80.0])
        out = loess(x, y, xout, frac=0.2, degree=1)
        np.testing.assert_allclose(out, np.sin(xout / 15.0), atol=0.08)
