"""Long-read (HiFi) pipeline through the real CLI: preproc --tech hifi on
single-end reads + genotype with the long-read recruitment/alignment path
(reference: preproc.rs technology handling, recruit.rs long-read matching,
genotype.rs minimap2 path — here the 160-bp-band device aligner)."""
import gzip
import json

import numpy as np
import pytest

from locityper_tpu import cli, sim
from locityper_tpu.seq import fastx
from locityper_tpu.utils.io import smart_create


@pytest.fixture(scope="module")
def lr_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("lrworld")
    rng = np.random.default_rng(42)
    locus = sim.simulate_locus(rng, "LRG", length=6000, n_haps=4,
                               divergence=0.012)
    left = sim.random_genome(rng, 50_000)
    right = sim.random_genome(rng, 50_000)
    genome = np.concatenate([left, locus.haplotypes[0], right])
    with open(root / "ref.fa", "w") as f:
        fastx.write_fasta(f, "chr1", genome)
    (root / "loci.bed").write_text(
        f"chr1\t{left.size}\t{left.size + locus.haplotypes[0].size}\tLRG\n")
    with open(root / "haps_LRG.fa", "w") as f:
        for name, seq in zip(locus.hap_names, locus.haplotypes):
            fastx.write_fasta(f, name, seq)
    err = sim.ErrorModel(mismatch=0.003, insertion=0.002, deletion=0.002)
    true_haps = [locus.haplotypes[i] for i in locus.true_genotype]
    locus_reads = sim.simulate_single_reads(
        rng, true_haps, depth=10.0, read_len_mean=2500, read_len_sd=300,
        errors=err, prefix="loc")
    bg_reads = sim.simulate_single_reads(
        rng, [left, right], depth=4.0, read_len_mean=2500, read_len_sd=300,
        errors=err, prefix="bg")
    with smart_create(root / "reads.fq.gz") as f:
        for nm, r in zip(locus_reads.names + bg_reads.names,
                         locus_reads.reads1 + bg_reads.reads1):
            fastx.write_fastq(f, fastx.Read(nm, r))
    return dict(root=root, locus=locus)


def test_hifi_cli_end_to_end(lr_world):
    root = lr_world["root"]
    locus = lr_world["locus"]
    assert cli.main(["add", "-d", str(root / "db"), "-r", str(root / "ref.fa"),
                     "-l", str(root / "loci.bed"),
                     "-s", str(root / "haps_{}.fa")]) == 0
    assert cli.main(["preproc", "-i", str(root / "reads.fq.gz"),
                     "-r", str(root / "ref.fa"), "-o", str(root / "sample"),
                     "--tech", "hifi", "-b", "chr1:2000-100000",
                     "--max-reads", "2000"]) == 0
    from locityper_tpu.bg import BgDistr, Technology
    bg = BgDistr.load(root / "sample" / "bg" / "distr.json.gz")
    assert bg.seq_info.technology == Technology.HIFI
    assert not bg.insert_distr.is_paired_end

    assert cli.main(["genotype", "-i", str(root / "reads.fq.gz"),
                     "-d", str(root / "db"), "-p", str(root / "sample"),
                     "-o", str(root / "out"),
                     "-S", "greedy:i=5k,a=1", "anneal:i=4,a=4,n=1500,p=800",
                     "--seed", "7"]) == 0
    res = json.load(gzip.open(root / "out" / "loci" / "LRG" / "res.json.gz",
                              "rt"))
    called = tuple(sorted(res["genotype"].split(",")))
    truth = tuple(sorted(locus.hap_names[i] for i in locus.true_genotype))
    assert called == truth, res
