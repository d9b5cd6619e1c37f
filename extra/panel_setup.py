"""Shared simulated-panel builder for the extra/ chip profilers.

Builds the SAME panel as bench.py / profile_recruit_e2e100.py: N loci x
6 haps at 4 kb, 150 bp paired reads at 15x plus ~10x off-locus
background, written as two FASTQ files.
"""
import tempfile
from pathlib import Path

import numpy as np

from locityper_tpu import sim
from locityper_tpu.pipeline import LocusData
from locityper_tpu.seq.contigs import ContigSet
from locityper_tpu.seq.counts import GenomeKmerCounter, off_target_counts
from locityper_tpu.seq.fastx import Read, write_fastq


def make_panel(n_loci: int, locus_len: int = 4000, n_haps: int = 6,
               depth: float = 15.0, read_len: int = 150, seed: int = 0,
               prefix: str = "prof_panel_"):
    """Returns (loci, data, fq1, fq2, total_pairs)."""
    rng = np.random.default_rng(seed)
    loci = [sim.simulate_locus(rng, f"B{i}", length=locus_len, n_haps=n_haps,
                               divergence=0.015) for i in range(n_loci)]
    flanks = [sim.random_genome(rng, 20000) for _ in range(n_loci + 1)]
    genome = np.concatenate(
        [p for pair in zip(flanks, [l.haplotypes[0] for l in loci])
         for p in pair] + [flanks[-1]])
    counter = GenomeKmerCounter(25)
    counter.add_seq(genome)
    counter.finalize()
    data = {}
    for locus in loci:
        kc = off_target_counts(counter, locus.haplotypes, locus.haplotypes[0])
        data[locus.name] = LocusData(
            ContigSet(locus.name, locus.hap_names, locus.haplotypes), kc)

    err = sim.ErrorModel(0.002, 0.0002, 0.0002)
    reads1, reads2, names = [], [], []
    for locus in loci:
        r = sim.simulate_paired_reads(
            rng, [locus.haplotypes[i] for i in locus.true_genotype],
            depth=depth, read_len=read_len, errors=err, prefix=locus.name)
        reads1 += list(r.reads1)
        reads2 += list(r.reads2)
        names += list(r.names)
    bgr = sim.simulate_paired_reads(rng, flanks * 10, depth=depth,
                                    read_len=read_len, errors=err,
                                    prefix="bg")
    reads1 += list(bgr.reads1)
    reads2 += list(bgr.reads2)
    names += list(bgr.names)
    tmpd = Path(tempfile.mkdtemp(prefix=prefix))
    fq1, fq2 = tmpd / "r1.fq", tmpd / "r2.fq"
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for n, a, b in zip(names, reads1, reads2):
            write_fastq(f1, Read(n, a))
            write_fastq(f2, Read(n, b))
    return loci, data, str(fq1), str(fq2), len(reads1)


def make_bg(read_len=150.0, depth_per_hap=15.0, window=100):
    from locityper_tpu.bg import BgDistr, SequencingInfo, Technology
    from locityper_tpu.bg.depth import ReadDepth
    from locityper_tpu.bg.err_prof import ErrorProfile
    from locityper_tpu.bg.insertsz import InsertDistr
    from locityper_tpu.mathx.distr import NBinom

    err = ErrorProfile.estimate(997600, 2000, 200, 200,
                                [(0, 150, 100.0), (1, 150, 50.0)])
    ins = InsertDistr.from_nbinom(NBinom.estimate(400.0, 4000.0))
    hap_m = depth_per_hap * window / (2 * read_len) / 2.0
    depth = ReadDepth(2, window, 300,
                      [NBinom.estimate(hap_m, hap_m * 1.6)] * 101)
    return BgDistr(SequencingInfo(read_len, Technology.ILLUMINA), ins, err,
                   depth)
