"""Background model estimation on simulated data."""
import numpy as np
import pytest

from locityper_tpu.bg import BgDistr, SequencingInfo, Technology
from locityper_tpu.bg.depth import ReadDepth, ReadDepthParams, auto_window_size, count_window_depth
from locityper_tpu.bg.err_prof import EditDistCache, EditThresh, ErrorProfile
from locityper_tpu.bg.insertsz import InsertDistr
from locityper_tpu.bg.windows import BgWindows
from locityper_tpu.mathx.distr import NBinom
from locityper_tpu.seq.counts import GenomeKmerCounter
from locityper_tpu import sim


class TestInsertDistr:
    def test_estimate_recovers_distribution(self):
        rng = np.random.default_rng(0)
        true = NBinom.estimate(400.0, 3600.0)
        sizes = rng.negative_binomial(true.n, true.p, size=20000)
        d = InsertDistr.estimate(sizes, same_orient_count=10, opp_orient_count=9990)
        assert d.distr.mean() == pytest.approx(400.0, rel=0.05)
        assert d.is_paired_end

    def test_ff_rejected(self):
        rng = np.random.default_rng(1)
        sizes = rng.negative_binomial(10, 0.02, size=5000)
        with pytest.raises(ValueError, match="FF/RR"):
            InsertDistr.estimate(sizes, same_orient_count=5000, opp_orient_count=100)

    def test_penalty_is_mode_prob(self):
        d = InsertDistr.from_nbinom(NBinom.estimate(400.0, 3600.0))
        mode = d.distr.mode()
        assert d.insert_penalty == pytest.approx(float(d.distr.ln_pmf(mode)))
        # Penalty >= pmf anywhere.
        assert (d.ln_prob(np.arange(2000)) <= d.insert_penalty + 1e-12).all()

    def test_json_roundtrip(self):
        d = InsertDistr.from_nbinom(NBinom(25.0, 0.06))
        d2 = InsertDistr.from_json(d.to_json())
        assert d2.distr.n == pytest.approx(25.0)
        assert InsertDistr.from_json({}).is_paired_end is False


class TestErrorProfile:
    def test_estimate_probs(self):
        ep = ErrorProfile.estimate(997000, 2000, 500, 500,
                                   [(3, 150, 100.0), (2, 150, 300.0), (5, 150, 20.0)])
        assert np.exp(ep.ln_mismatch) == pytest.approx(0.002, rel=1e-6)
        assert np.exp(ep.ln_match) == pytest.approx(0.997, rel=1e-3)
        # Clipping = max(mismatch, insertion).
        assert ep.ln_clipping == pytest.approx(ep.ln_mismatch)

    def test_prob_floor(self):
        ep = ErrorProfile.estimate(10**6, 0, 0, 0, [(0, 150, 100.0)])
        assert np.exp(ep.ln_mismatch) == pytest.approx(1e-5)

    def test_ln_prob_counts(self):
        ep = ErrorProfile.estimate(997000, 2000, 500, 500, [(0, 150, 100.0)])
        p = ep.ln_prob_counts(147, 3, 0, 0, 0)
        assert p == pytest.approx(147 * ep.ln_match + 3 * ep.ln_mismatch)

    def test_edit_cache_frac(self):
        ep = ErrorProfile.estimate(997000, 2000, 500, 500, [(0, 150, 100.0)])
        cache = EditDistCache(ep, EditThresh("frac", 0.03, 0.06))
        assert cache.get(150) == (4, 9)

    def test_edit_cache_pval(self):
        ep = ErrorProfile.estimate(970000, 20000, 5000, 5000,
                                   [(k, 1000, 10.0) for k in range(20, 40)])
        cache = EditDistCache(ep, EditThresh("pval", 0.99, 0.999))
        good, passable = cache.get(1000)
        assert 0 < good <= passable < 1000

    def test_json_roundtrip(self):
        ep = ErrorProfile.estimate(997000, 2000, 500, 500, [(0, 150, 100.0)])
        ep2 = ErrorProfile.from_json(ep.to_json())
        assert ep2.ln_match == pytest.approx(ep.ln_match)
        assert ep2.edit_distr.alpha == pytest.approx(ep.edit_distr.alpha)


class TestReadDepth:
    def test_gc_depth_estimation(self):
        # Windows with a GC-dependent depth profile; estimator should track it.
        rng = np.random.default_rng(2)
        n_windows = 4000
        gc = np.clip(rng.normal(45, 9, n_windows), 0, 100)
        true_mean = 20.0 + 0.2 * (gc - 45)       # GC bias
        depth = rng.negative_binomial(10.0, 10.0 / (10.0 + true_mean))
        rd = ReadDepth.estimate(depth, gc, window_size=100, neighb_size=300,
                                params=ReadDepthParams(ploidy=2))
        # Haploid mean at GC=45 should be ~ 20/2 = 10.
        assert rd.depth_distribution(45).mean() == pytest.approx(10.0, rel=0.1)
        # GC trend: higher GC -> higher depth.
        assert rd.depth_distribution(55).mean() > rd.depth_distribution(35).mean()

    def test_no_gc_bias(self):
        rng = np.random.default_rng(3)
        depth = rng.negative_binomial(10.0, 0.4, 2000)
        gc = np.clip(rng.normal(45, 8, 2000), 0, 100)
        rd = ReadDepth.estimate(depth, gc, 100, 300, ReadDepthParams(),
                                has_gc_bias=False)
        m = rd.depth_distribution(0).mean()
        assert all(rd.depth_distribution(g).mean() == pytest.approx(m)
                   for g in (20, 50, 80))

    def test_json_roundtrip(self):
        rd = ReadDepth(2, 100, 300, [NBinom(5.0, 0.3)] * 101)
        rd2 = ReadDepth.from_json(rd.to_json())
        assert rd2.window_size == 100
        assert rd2.distributions[50].n == pytest.approx(5.0)

    def test_auto_window(self):
        assert auto_window_size(150.0) == (100, 300)
        assert auto_window_size(15000.0) == (5000, 5000)

    def test_count_window_depth(self):
        middles = np.array([100, 150, 250, 950, 10])
        ends = np.array([0, 1, 0, 0, 0])
        d = count_window_depth(middles, ends, 0, 1000, 100)
        assert d.shape == (10, 2)
        assert d[1, 0] == 1 and d[1, 1] == 1       # middles 100 (end0), 150 (end1)
        assert d[0, 0] == 1 and d[2, 0] == 1 and d[9, 0] == 1


class TestBgWindows:
    def test_filtering(self):
        rng = np.random.default_rng(4)
        region = sim.random_genome(rng, 20000)
        region[5000:5400] = 4  # N block
        counter = GenomeKmerCounter(25)
        counter.add_seq(region)
        counter.finalize()
        counts = counter.seq_counts(region)
        win = BgWindows.create(region, 100000, counts, 25, window_size=100,
                               neighb_size=300, boundary_size=1000)
        assert len(win) == 180
        # Windows near the N block dropped.
        inside_n = (win.starts - 100000 >= 4900) & (win.starts - 100000 < 5400)
        assert not win.keep[inside_n].any()
        # Most other windows kept (random sequence is unique).
        assert win.keep[~inside_n].mean() > 0.95

    def test_keep_middle(self):
        rng = np.random.default_rng(5)
        region = sim.random_genome(rng, 5000)
        counter = GenomeKmerCounter(25)
        counter.add_seq(region)
        counter.finalize()
        win = BgWindows.create(region, 0, counter.seq_counts(region), 25,
                               100, 300, 1000)
        mids = win.starts[:5] + 50
        assert win.keep_middle(mids).sum() == win.keep[:5].sum()


class TestBgDistr:
    def test_roundtrip(self, tmp_path):
        bg = BgDistr(
            seq_info=SequencingInfo(150.0, Technology.ILLUMINA, total_reads=1000),
            insert_distr=InsertDistr.from_nbinom(NBinom.estimate(400.0, 3600.0)),
            err_prof=ErrorProfile.estimate(997000, 2000, 500, 500, [(0, 150, 10.0)]),
            depth=ReadDepth(2, 100, 300, [NBinom(5.0, 0.3)] * 101),
        )
        path = tmp_path / "distr.json.gz"
        bg.save(path)
        bg2 = BgDistr.load(path)
        assert bg2.seq_info.technology is Technology.ILLUMINA
        assert bg2.insert_distr.distr.mean() == pytest.approx(400.0, rel=1e-6)
        assert bg2.depth.window_size == 100

    def test_tech_defaults(self):
        assert Technology.ILLUMINA.default_match_frac(True) == 0.5
        assert Technology.ILLUMINA.default_match_frac(False) == 0.7
        assert Technology.HIFI.default_match_frac(False) == 0.5
        assert Technology.ILLUMINA.default_unmapped_penalty() == pytest.approx(
            -10.0 * np.log(10.0))
        assert not Technology.NANOPORE.has_gc_bias
