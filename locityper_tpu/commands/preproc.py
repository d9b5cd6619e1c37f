"""`preproc` command: estimate background distributions from a WGS sample.

Counterpart of reference command/preproc.rs: pick a background region, map
the sample's reads to it (internal banded aligner instead of
strobealign/minimap2 pipes, :716-988), then estimate insert-size, error and
depth models (:1076-1165).  Writes bg/distr.json.gz + success.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..bg import Technology
from ..pipeline import estimate_bg_from_sim
from ..seq import fastx
from ..seq.counts import GenomeKmerCounter
from ..utils import paths
from ..utils.io import Rerun, write_success
from ..utils.logging import get_logger

logger = get_logger("preproc")


def add_args(p):
    p.add_argument("-i", "--input", nargs="+", required=True,
                   help="Read files (1 = single/interleaved, 2 = paired)")
    p.add_argument("-r", "--reference", required=True, help="Reference FASTA")
    p.add_argument("-o", "--output", required=True, help="Output directory")
    p.add_argument("-b", "--bg-region", default=None,
                   help="Background region as chrom:start-end "
                        "(default: middle of the largest contig)")
    p.add_argument("--tech", default="illumina",
                   help="illumina/hifi/pacbio/ont [%(default)s]")
    p.add_argument("--interleaved", action="store_true")
    p.add_argument("-k", "--kmer", type=int, default=25)
    p.add_argument("--max-reads", type=int, default=200_000,
                   help="Cap on reads used for estimation")
    p.add_argument("--like", default=None, metavar="DIR",
                   help="Reuse another sample's distributions, rescaling "
                        "read depth by the read-count or file-size ratio "
                        "(preproc.rs:1304-1352)")
    p.add_argument("--rerun", default="none")
    p.add_argument("--debug", action="store_true",
                   help="Write depth estimation debug CSV (bg/depth.csv.gz)")
    p.add_argument("--describe", action="store_true",
                   help="Print the stored background distributions and exit")
    return p


def _count_input(paths) -> tuple[int, int]:
    """(total_reads, total_file_size) of the input files."""
    import gzip
    total_reads = 0
    total_size = 0
    for path in paths:
        total_size += Path(path).stat().st_size
        if str(path).endswith(".bam"):
            from ..seq import bam as bamio
            total_reads += sum(1 for _ in bamio.read_bam_records(path))
            continue
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rb") as f:
            first = f.readline()
            n_lines = 1 + sum(1 for _ in f)
        per_rec = 4 if first.startswith(b"@") else 2
        total_reads += n_lines // per_rec
    return total_reads, total_size


def run_like(args) -> int:
    """--like path: clone distributions, rescale depth (preproc.rs:1240-1352)."""
    from ..bg import BgDistr
    out = Path(args.output)
    bg_out = paths.bg_dir(out)
    rerun = Rerun.parse(args.rerun)
    if not rerun.prepare_dir(bg_out):
        logger.info("Preprocessing already done, skipping")
        return 0
    bg = BgDistr.load(paths.bg_dir(args.like) / paths.BG_DISTR)
    new_reads, new_size = _count_input(args.input)
    if bg.insert_distr.is_paired_end:
        new_reads //= 2   # stored counts are read *pairs* for paired data
    if bg.seq_info.total_reads:
        rate = new_reads / bg.seq_info.total_reads
        how = f"read count ratio {new_reads}/{bg.seq_info.total_reads}"
    elif bg.seq_info.file_size:
        rate = new_size / bg.seq_info.file_size
        how = f"file size ratio {new_size}/{bg.seq_info.file_size}"
    else:
        raise SystemExit("--like sample stores neither read count nor file size")
    logger.info("Rescaling depth by %.4f (%s)", rate, how)
    if bg.depth is not None:
        bg.depth.mul_depth(rate)
    bg.seq_info.total_reads = new_reads
    bg.seq_info.file_size = new_size
    bg.save(bg_out / paths.BG_DISTR)
    write_success(bg_out)
    return 0


# Default ~4.5 Mb duplication-free chr17 windows per genome build
# (preproc.rs:609-616).
_DEFAULT_BG = {"CHM13": ("chr17", 72_950_000, 77_450_000),
               "GRCh38": ("chr17", 72_062_000, 76_562_000),
               "GRCh37": ("chr17", 70_060_000, 74_560_000)}


def select_bg_region(genome: dict, spec: str | None, pad: int = 0):
    """(preproc.rs:610-657 + select_bg_interval): explicit -b region, else
    the build-specific chr17 default (build guessed from chr1 length,
    contigs.rs:244-255), else a central slice of the largest contig (sim
    genomes; the reference errors here instead)."""
    if spec:
        chrom, _, rng = spec.partition(":")
        start, _, end = rng.partition("-")
        return chrom, int(start.replace(",", "")), int(end.replace(",", ""))
    from ..seq.contigs import guess_genome_version
    ver = guess_genome_version(genome)
    if ver is not None:
        chrom, start, end = _DEFAULT_BG[ver]
        for name in (chrom, chrom[3:]):
            if name in genome and genome[name].size >= end:
                logger.info("Recognized %s reference genome, using background "
                            "region %s:%d-%d", ver, name, start + 1, end)
                return name, start, end
        raise ValueError(
            f"Recognized {ver} but it lacks a full {chrom}; provide -b "
            "explicitly (>3 Mb, without significant duplications)")
    name = max(genome, key=lambda n: genome[n].size)
    n = genome[name].size
    size = min(4_500_000, max(n // 2, min(n, 100_000)))
    start = (n - size) // 2
    logger.info("Unrecognized genome; using central %s:%d-%d as background",
                name, start + 1, start + size)
    return name, start, start + size


def describe(args) -> int:
    """preproc --describe (preproc.rs:1400-1409): re-print stored distrs."""
    import math

    from ..bg import BgDistr
    bg = BgDistr.load(paths.bg_dir(Path(args.output)) / paths.BG_DISTR)
    info = bg.seq_info
    print(f"technology: {info.technology.name.lower()}")
    print(f"mean read length: {info.read_len:.1f}")
    if info.total_reads:
        print(f"total reads: {info.total_reads}")
    if bg.insert_distr.is_paired_end:
        d = bg.insert_distr.distr
        print(f"insert size: {d.mean():.1f} +- {d.variance() ** 0.5:.1f}")
    ep = bg.err_prof
    print(f"error rates: mism {100 * math.exp(ep.ln_mismatch):.4f}%, "
          f"ins {100 * math.exp(ep.ln_insertion):.4f}%, "
          f"del {100 * math.exp(ep.ln_deletion):.4f}%")
    if bg.depth is not None:
        d = bg.depth.depth_distribution(40)
        print(f"read depth (GC 40, haploid): {d.mean():.2f} "
              f"+- {d.variance() ** 0.5:.2f} "
              f"(window {bg.depth.window_size})")
    return 0


def run(args):
    if args.describe:
        return describe(args)
    if args.like:
        return run_like(args)
    out = Path(args.output)
    bg_dir = paths.bg_dir(out)
    rerun = Rerun.parse(args.rerun)
    if not rerun.prepare_dir(bg_dir):
        logger.info("Preprocessing already done, skipping")
        return 0
    tech = Technology.parse(args.tech)

    genome = dict(fastx.read_fasta(args.reference))
    chrom, start, end = select_bg_region(genome, args.bg_region)
    logger.info("Background region: %s:%d-%d", chrom, start, end)
    region = genome[chrom][start:end]
    counter = GenomeKmerCounter(args.kmer)
    for codes in genome.values():
        counter.add_seq(codes)
    counter.finalize()

    reads1, reads2 = [], []
    if len(args.input) == 1 and args.input[0].endswith(".bam"):
        from ..seq import bam as bamio
        if bamio.is_paired_bam(args.input[0]):
            for r1, r2 in bamio.read_bam_pairs(args.input[0]):
                reads1.append(r1.seq)
                reads2.append(r2.seq)
                if len(reads1) >= args.max_reads:
                    break
        else:
            for r in bamio.read_bam(args.input[0]):
                reads1.append(r.seq)
                if len(reads1) >= args.max_reads:
                    break
    elif len(args.input) == 2:
        for r1, r2 in fastx.read_pairs(args.input[0], args.input[1]):
            reads1.append(r1.seq)
            reads2.append(r2.seq)
            if len(reads1) >= args.max_reads:
                break
    elif args.interleaved:
        for r1, r2 in fastx.read_pairs(args.input[0], interleaved=True):
            reads1.append(r1.seq)
            reads2.append(r2.seq)
            if len(reads1) >= args.max_reads:
                break
    else:
        for r in fastx.read_fastx_auto(args.input[0]):
            reads1.append(r.seq)
            if len(reads1) >= args.max_reads:
                break
    logger.info("Loaded %d reads%s", len(reads1),
                " (paired)" if reads2 else "")

    bg = estimate_bg_from_sim(reads1, reads2, region, counter, tech,
                              debug_dir=bg_dir if args.debug else None)
    total_reads, total_size = _count_input(args.input)
    bg.seq_info.total_reads = total_reads // (2 if reads2 else 1)
    bg.seq_info.file_size = total_size
    bg.save(bg_dir / paths.BG_DISTR)
    write_success(bg_dir)
    bg_depth = bg.depth.depth_distribution(40)
    logger.info("Preprocessing done: read depth %.2f±%.2f (GC 40, haploid), "
                "insert %.0f, err mism %.4f%%",
                bg_depth.mean(), np.sqrt(bg_depth.variance()),
                bg.insert_distr.distr.mean() if bg.insert_distr.distr else 0,
                100 * np.exp(bg.err_prof.ln_mismatch))
    return 0
