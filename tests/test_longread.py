"""Long-read (HiFi-like) genotyping end-to-end."""
import numpy as np
import pytest

from locityper_tpu import sim
from locityper_tpu.bg import BgDistr, SequencingInfo, Technology
from locityper_tpu.bg.depth import ReadDepth
from locityper_tpu.bg.err_prof import ErrorProfile
from locityper_tpu.bg.insertsz import InsertDistr
from locityper_tpu.mathx.distr import NBinom
from locityper_tpu.pipeline import LocusData, genotype_locus
from locityper_tpu.seq.contigs import ContigSet
from locityper_tpu.seq.counts import GenomeKmerCounter, off_target_counts
from locityper_tpu.solvers.solve import Scheme


def make_bg_hifi(read_len=3000.0, depth_per_hap=10.0, window=2000):
    # HiFi-like error rates.
    ep = ErrorProfile.estimate(
        994000, 2000, 2000, 2000,
        [(6, 3000, 50.0), (8, 3000, 30.0), (12, 3000, 10.0)])
    # Haploid reads-per-window: depth*window/read_len (single-end), /2 ploidy.
    m = depth_per_hap * window / read_len / 2.0
    distr = NBinom.estimate(m, m * 1.5)
    depth = ReadDepth(2, window, max(window, 300), [distr] * 101)
    return BgDistr(SequencingInfo(read_len, Technology.HIFI),
                   InsertDistr.undefined(), ep, depth)


@pytest.mark.parametrize("seed", [0, 1])
def test_hifi_genotype_recovery(seed):
    rng = np.random.default_rng(100 + seed)
    locus = sim.simulate_locus(rng, "LR", length=8000, n_haps=4,
                               divergence=0.01)
    genome = np.concatenate([sim.random_genome(rng, 20000),
                             locus.haplotypes[0],
                             sim.random_genome(rng, 20000)])
    counter = GenomeKmerCounter(25)
    counter.add_seq(genome)
    counter.finalize()
    kc = off_target_counts(counter, locus.haplotypes, locus.haplotypes[0])
    data = LocusData(ContigSet("LR", locus.hap_names, locus.haplotypes), kc)

    true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
    reads = sim.simulate_single_reads(
        rng, true_haps, depth=10.0, read_len_mean=3000, read_len_sd=400,
        errors=sim.ErrorModel(mismatch=0.002, insertion=0.001, deletion=0.001))
    read_pairs = [(r, None) for r in reads.reads1]
    bg = make_bg_hifi()
    result, stats = genotype_locus(
        data, read_pairs, reads.names, bg,
        scheme=Scheme.parse(["greedy:i=5k,a=1", "anneal:i=6,a=6,n=2000,p=1000"]),
        seed=seed)
    called = tuple(sorted(int(x) for x in result.genotypes[0]))
    assert called == locus.true_genotype, (
        f"called {called} truth {locus.true_genotype} "
        f"top3={[tuple(int(x) for x in g) for g in result.genotypes[:3]]}")


def make_bg_ont(read_len=5000.0, depth_per_hap=8.0, window=2000):
    """ONT-like: ~5% error."""
    ep = ErrorProfile.estimate(
        950000, 30000, 10000, 10000,
        [(250, 5000, 50.0), (300, 5000, 30.0)])
    m = depth_per_hap * window / read_len / 2.0
    distr = NBinom.estimate(m, m * 1.5)
    depth = ReadDepth(2, window, max(window, 300), [distr] * 101)
    return BgDistr(SequencingInfo(read_len, Technology.NANOPORE),
                   InsertDistr.undefined(), ep, depth)


def test_ont_genotype_recovery():
    rng = np.random.default_rng(300)
    locus = sim.simulate_locus(rng, "ONT", length=8000, n_haps=4,
                               divergence=0.012)
    genome = np.concatenate([sim.random_genome(rng, 20000),
                             locus.haplotypes[0],
                             sim.random_genome(rng, 20000)])
    counter = GenomeKmerCounter(25)
    counter.add_seq(genome)
    counter.finalize()
    kc = off_target_counts(counter, locus.haplotypes, locus.haplotypes[0])
    data = LocusData(ContigSet("ONT", locus.hap_names, locus.haplotypes), kc)
    true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
    reads = sim.simulate_single_reads(
        rng, true_haps, depth=8.0, read_len_mean=5000, read_len_sd=800,
        errors=sim.ErrorModel(mismatch=0.03, insertion=0.01, deletion=0.01))
    read_pairs = [(r, None) for r in reads.reads1]
    bg = make_bg_ont()
    result, stats = genotype_locus(
        data, read_pairs, reads.names, bg,
        scheme=Scheme.parse(["greedy:i=5k,a=1", "anneal:i=6,a=6,n=2000,p=1000"]),
        seed=3)
    called = tuple(sorted(int(x) for x in result.genotypes[0]))
    assert called == locus.true_genotype, (
        f"called {called} truth {locus.true_genotype} "
        f"top3={[tuple(int(x) for x in g) for g in result.genotypes[:3]]}")
