"""End-to-end model + solver tests on simulated loci: the true genotype must
be recovered (the correctness oracle in the absence of the external test
dataset — SURVEY.md §4)."""
import numpy as np
import pytest

from locityper_tpu import sim
from locityper_tpu.bg import BgDistr, SequencingInfo, Technology
from locityper_tpu.bg.depth import ReadDepth
from locityper_tpu.bg.err_prof import ErrorProfile
from locityper_tpu.bg.insertsz import InsertDistr
from locityper_tpu.mathx.distr import NBinom
from locityper_tpu.model import Params
from locityper_tpu.model.windows import ContigInfo, ContigInfoPack, build_contig_infos, weight_calc
from locityper_tpu.pipeline import LocusData, genotype_locus
from locityper_tpu.seq.contigs import ContigSet
from locityper_tpu.seq.counts import GenomeKmerCounter, off_target_counts
from locityper_tpu.solvers.solve import Scheme


def make_bg(read_len=150.0, depth_per_hap=15.0, window=100):
    """Synthetic background distributions matching the simulator's settings."""
    err = ErrorProfile.estimate(997600, 2000, 200, 200, [(0, 150, 100.0),
                                                         (1, 150, 50.0)])
    ins = InsertDistr.from_nbinom(NBinom.estimate(400.0, 3600.0 + 400.0))
    # Window depth: pairs-per-window for haploid single-end ~
    # depth * window / (2*read_len) / 2(mul_coef applied later)...
    # ReadDepth stores haploid single-mate depth: mean = depth*window/(2*readlen)/2
    m = depth_per_hap * window / (2 * read_len)
    hap_m = m / 2.0
    distr = NBinom.estimate(hap_m, hap_m * 1.6)
    depth = ReadDepth(2, window, 300, [distr] * 101)
    return BgDistr(SequencingInfo(read_len, Technology.ILLUMINA), ins, err, depth)


def make_locus(seed=0, length=4000, n_haps=5, divergence=0.015):
    rng = np.random.default_rng(seed)
    locus = sim.simulate_locus(rng, length=length, n_haps=n_haps,
                               divergence=divergence)
    # The "genome" contains one copy of the locus (reference haplotype 0)
    # embedded in random background, as in reality.
    genome = np.concatenate([sim.random_genome(rng, 30000),
                             locus.haplotypes[0],
                             sim.random_genome(rng, 30000)])
    counter = GenomeKmerCounter(25)
    counter.add_seq(genome)
    counter.finalize()
    kc = off_target_counts(counter, locus.haplotypes, locus.haplotypes[0])
    cset = ContigSet(locus.name, locus.hap_names, locus.haplotypes)
    return rng, locus, LocusData(cset, kc)


class TestContigInfo:
    def test_weight_calc(self):
        assert weight_calc(np.array([0.5]), 0.5, 4.0)[0] == pytest.approx(0.5)
        assert weight_calc(np.array([0.9]), 0.2, 4.0)[0] > 0.99
        assert weight_calc(np.array([0.05]), 0.2, 4.0)[0] < 0.01

    def test_build(self):
        _, locus, data = make_locus()
        infos = build_contig_infos(data.contig_set, data.kmer_counts, 100, 300,
                                   Params())
        ci = infos[0]
        assert ci.n_windows == (len(locus.haplotypes[0]) - 400) // 100
        assert ci.gc_at.size == ci.contig_len
        assert 20 < ci.gc_at[ci.reg_start] < 80
        # Random sequence: high complexity & unique kmers -> weight ~ 1.
        starts = ci.default_window_starts()
        w = ci.weight_at[starts]
        assert np.median(w) > 0.9

    def test_window_of_middle(self):
        _, locus, data = make_locus()
        ci = build_contig_infos(data.contig_set, data.kmer_counts, 100, 300,
                                Params())[0]
        m = np.array([ci.reg_start + 50, ci.reg_start - 10, -1,
                      ci.reg_start + ci.n_windows * 100 + 5])
        w = ci.window_of_middle(m)
        assert w[0] == 2           # first regular window
        assert w[1] == 1           # boundary
        assert w[2] == 0           # unmapped
        assert w[3] == 1           # boundary past end


class TestGenotypeLocus:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_recovers_true_genotype(self, seed):
        rng, locus, data = make_locus(seed=seed)
        bg = make_bg()
        true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
        reads = sim.simulate_paired_reads(
            rng, true_haps, depth=15.0, read_len=150,
            errors=sim.ErrorModel(0.002, 0.0002, 0.0002))
        read_pairs = list(zip(reads.reads1, reads.reads2))
        result, stats = genotype_locus(
            data, read_pairs, reads.names, bg,
            scheme=Scheme.parse(["greedy:i=5k,a=1", "anneal:i=8,a=8,n=3000,p=2000"]),
            seed=seed)
        called = tuple(sorted(result.genotypes[0]))
        assert called == locus.true_genotype, (
            f"seed {seed}: called {called}, truth {locus.true_genotype}; "
            f"top5={[tuple(g) for g in result.genotypes[:5]]}")

    def test_result_json(self):
        rng, locus, data = make_locus(seed=3)
        bg = make_bg()
        true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
        reads = sim.simulate_paired_reads(rng, true_haps, depth=12.0)
        result, _ = genotype_locus(
            data, list(zip(reads.reads1, reads.reads2)), reads.names, bg,
            scheme=Scheme.parse(["greedy:i=5k,a=1", "anneal:i=6,a=6,n=2000,p=1000"]),
            seed=3)
        obj = result.to_json(locus.hap_names)
        assert "genotype" in obj and "options" in obj
        assert obj["total_reads"] > 0
        assert obj["options"][0]["genotype"] == obj["genotype"]
        probs = [o["prob"] for o in obj["options"]]
        assert sum(probs) == pytest.approx(1.0, abs=1e-6)


class TestPriors:
    def test_priors_define_genotype_list(self):
        """The priors file DEFINES the evaluated genotypes
        (genotype.rs:1077-1101): unlisted and -inf genotypes are excluded,
        finite priors weight the ranking."""
        rng, locus, data = make_locus(seed=4)
        bg = make_bg()
        true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
        reads = sim.simulate_paired_reads(rng, true_haps, depth=14.0)
        pairs = list(zip(reads.reads1, reads.reads2))
        t = tuple(sorted(locus.true_genotype))
        # Allow only two genotypes: the truth and one decoy.
        decoy = (0, 1) if t != (0, 1) else (2, 3)
        priors = {t: -0.1, decoy: -0.2, (0, 0): float("-inf")}
        result, _ = genotype_locus(
            data, pairs, reads.names, bg,
            scheme=Scheme.parse(["anneal:i=4,a=4,n=2000,p=1000"]),
            seed=4, priors=priors)
        evaluated = {tuple(sorted(g)) for g in result.genotypes}
        assert evaluated <= {t, decoy}
        assert tuple(sorted(result.genotypes[0])) == t


class TestHaploid:
    def test_ploidy_one_recovery(self):
        """Ploidy-1 genotyping (native [G, 1] genotypes through the
        any-ploidy kernel): a haploid sample recovers its single
        haplotype."""
        rng, locus, data = make_locus(seed=8)
        bg = make_bg()
        h = locus.true_genotype[0]
        reads = sim.simulate_paired_reads(
            rng, [locus.haplotypes[h], locus.haplotypes[h]], depth=15.0,
            errors=sim.ErrorModel(0.002, 0.0002, 0.0002))
        res, _ = genotype_locus(
            data, list(zip(reads.reads1, reads.reads2)), reads.names, bg,
            ploidy=1, scheme=Scheme.parse(["anneal:i=4,a=4,n=1500,p=800"]),
            seed=8)
        assert tuple(res.genotypes[0]) == (h,)
        obj = res.to_json(locus.hap_names)
        assert obj["genotype"] == locus.hap_names[h]
        assert obj["quality"] > 10
