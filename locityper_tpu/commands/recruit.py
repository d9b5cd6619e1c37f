"""`recruit` command: standalone read recruitment to arbitrary targets.

Counterpart of reference command/recruit.rs: recruit reads to FASTA target
sequences and write per-target (or single) FASTQ outputs.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..seq import fastx
from ..seq.contigs import ContigSet
from ..seq.counts import GenomeKmerCounter, KmerCounts, off_target_counts
from ..seq.recruit import RecruitParams, TargetIndex, recruit_any
from ..utils.io import smart_create
from ..utils.logging import Progress, get_logger

logger = get_logger("recruit")


def add_args(p):
    p.add_argument("-i", "--input", nargs="+", required=True)
    p.add_argument("-s", "--seqs", nargs="+", required=True,
                   help="Target FASTA file(s); each file is one target locus")
    p.add_argument("-o", "--output", nargs="+", required=True,
                   help="One output FASTQ per target, or a single file")
    p.add_argument("--interleaved", action="store_true")
    p.add_argument("-x", "--preset", default=None,
                   help="Technology preset setting the match fraction "
                        "(recruit.rs:88-105): illumina/illumina-se/hifi/"
                        "pacbio/ont")
    p.add_argument("--match-frac", type=float, default=None)
    p.add_argument("--match-len", type=int, default=2000)
    p.add_argument("--kmer-thresh", type=int, default=10)
    p.add_argument("--subsample", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p


_PRESETS = {
    "illumina": ("illumina", True), "illumina-pe": ("illumina", True),
    "sr": ("illumina", True), "sr-pe": ("illumina", True),
    "illumina-se": ("illumina", False), "sr-se": ("illumina", False),
    "hifi": ("hifi", False), "pacbio": ("pacbio", False),
    "pb": ("pacbio", False), "ont": ("nanopore", False),
    "nanopore": ("nanopore", False),
}


def run(args):
    match_frac = args.match_frac
    if args.preset is not None:
        if args.preset.lower() not in _PRESETS:
            raise ValueError(f"unknown preset {args.preset!r}; options: "
                             + ", ".join(sorted(_PRESETS)))
        from ..bg import Technology
        tech_name, paired = _PRESETS[args.preset.lower()]
        tech = Technology.parse(tech_name)
        if match_frac is None:
            match_frac = tech.default_match_frac(paired)
    if match_frac is None:
        match_frac = 0.5
    params = RecruitParams(match_frac=match_frac,
                           match_length=args.match_len,
                           thresh_kmer_count=args.kmer_thresh)
    index = TargetIndex(params)
    for path in args.seqs:
        named = [(r.name, r.seq) for r in fastx.read_fastx_auto(path)]
        cset = ContigSet(Path(path).stem, [n for n, _ in named],
                         [s for _, s in named])
        # Standalone mode has no genome counts: treat all k-mers as rare
        # (count 0), as the reference does without jellyfish counts.
        kc = KmerCounts(25, [np.zeros(max(s.size - 24, 0), np.uint16)
                             for _, s in named])
        index.add_locus(cset, kc)
    index.finalize()
    logger.info("%d targets, %d minimizers", index.n_loci, index.keys.size)

    single_out = len(args.output) == 1
    if not single_out and len(args.output) != index.n_loci:
        raise SystemExit("Number of outputs must be 1 or match targets")
    writers = [smart_create(p) for p in args.output]

    rng = np.random.default_rng(args.seed)
    progress = Progress(logger, "reads")

    def handle(name, c1, c2):
        if args.subsample is not None and rng.random() >= args.subsample:
            return 0
        hits = recruit_any(index, c1, c2)
        for locus_ix in hits:
            w = writers[0] if single_out else writers[locus_ix]
            fastx.write_fastq(w, fastx.Read(name + "/1", c1))
            if c2 is not None:
                fastx.write_fastq(w, fastx.Read(name + "/2", c2))
            if single_out:
                break
        return int(bool(hits))

    if len(args.input) == 2:
        for r1, r2 in fastx.read_pairs(args.input[0], args.input[1]):
            progress.add(1, handle(r1.name, r1.seq, r2.seq))
    elif args.interleaved:
        for r1, r2 in fastx.read_pairs(args.input[0], interleaved=True):
            progress.add(1, handle(r1.name, r1.seq, r2.seq))
    else:
        for r in fastx.read_fastx_auto(args.input[0]):
            progress.add(1, handle(r.name, r.seq, None))
    progress.final()
    for w in writers:
        w.close()
    return 0
