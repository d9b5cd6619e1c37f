#!/usr/bin/env python3
"""Export the CALLED haplotype sequences of genotyped loci as FASTA.

Role twin of the reference's extra/into_fasta.py (independent
implementation over THIS repo's layouts): reads each locus's primary
genotype from <out>/loci/<locus>/res.json.gz and pulls the named
haplotypes from <db>/loci/<locus>/haplotypes.fa.gz.  Record names are
"<locus>/<hap>/<copy>" so diploid duplicates stay distinct.

Usage: into_fasta.py -d DB -o OUT_DIR [-l LOCI...] [--out calls.fa]
"""
import argparse
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.seq.fastx import read_fasta  # noqa: E402
from locityper_tpu.seq import dna  # noqa: E402
from locityper_tpu.utils import paths  # noqa: E402


def export(db: Path, out_dir: Path, loci=None, sink=sys.stdout):
    loci_dir = out_dir / paths.LOCI_DIR
    names = sorted(loci if loci else
                   [p.name for p in loci_dir.iterdir() if p.is_dir()])
    n = 0
    for name in names:
        res_path = loci_dir / name / paths.RES_JSON
        if not res_path.exists():
            print(f"[{name}] no res.json.gz — skipped", file=sys.stderr)
            continue
        res = json.loads(gzip.open(res_path, "rt").read())
        gt = res.get("genotype")
        if not gt:
            print(f"[{name}] no genotype call — skipped", file=sys.stderr)
            continue
        haps = dict(read_fasta(paths.locus_dir(db, name)
                               / paths.HAPLOTYPES))
        for copy, hap in enumerate(gt.split(","), 1):
            if hap not in haps:
                print(f"[{name}] called haplotype {hap!r} not in DB",
                      file=sys.stderr)
                continue
            seq = dna.decode(haps[hap])
            sink.write(f">{name}/{hap}/{copy}\n")
            for i in range(0, len(seq), 100):
                sink.write(seq[i:i + 100] + "\n")
            n += 1
    print(f"Wrote {n} haplotype records", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-d", "--db", required=True)
    ap.add_argument("-o", "--output", required=True,
                    help="genotype output directory (contains loci/)")
    ap.add_argument("-l", "--loci", nargs="*", default=None)
    ap.add_argument("--out", default="-", help="output FASTA [stdout]")
    args = ap.parse_args(argv)
    sink = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        export(Path(args.db), Path(args.output), args.loci, sink)
    finally:
        if sink is not sys.stdout:
            sink.close()


if __name__ == "__main__":
    main()
