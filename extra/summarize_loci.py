#!/usr/bin/env python3
"""Summarize genotyping results across loci into one TSV.

Role twin of the reference's extra/summarize_loci.py (independent
implementation over THIS repo's res.json.gz schema): one row per locus
with the primary call, its quality, likelihood statistics, the runner-up
margin, and warnings — the table you scan after `genotype` finishes on a
panel.

Usage: summarize_loci.py -o OUT_DIR [-l LOCI...] [> summary.tsv]
"""
import argparse
import gzip
import json
import sys
from pathlib import Path


def summarize(out_dir: Path, loci=None, file=sys.stdout):
    loci_dir = out_dir / "loci"
    names = sorted(loci if loci else
                   [p.name for p in loci_dir.iterdir() if p.is_dir()])
    file.write("locus\tgenotype\tquality\ttotal_reads\tunexpl_reads\t"
               "lik_mean\tlik_sd\tmargin_log10\tweight_dist\twarnings\n")
    n_done = 0
    for name in names:
        res_path = loci_dir / name / "res.json.gz"
        if not res_path.exists():
            file.write(f"{name}\t*\tNA\tNA\tNA\tNA\tNA\tNA\tNA\tmissing\n")
            continue
        res = json.loads(gzip.open(res_path, "rt").read())
        opts = res.get("options", [])
        primary = opts[0] if opts else {}
        margin = ("NA" if len(opts) < 2
                  else f"{-opts[1]['log10_prob']:.3f}")
        warns = ";".join(res.get("warnings", [])) or "."
        file.write("\t".join(str(x) for x in (
            name, res.get("genotype", "*"),
            f"{res.get('quality', float('nan')):.2f}",
            res.get("total_reads", "NA"), res.get("unexpl_reads", "NA"),
            f"{primary.get('lik_mean', float('nan')):.3f}",
            f"{primary.get('lik_sd', float('nan')):.3f}",
            margin, f"{res.get('weight_dist', float('nan')):.4g}",
            warns)) + "\n")
        n_done += 1
    print(f"Summarized {n_done}/{len(names)} loci", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--output", required=True,
                    help="genotype output directory (contains loci/)")
    ap.add_argument("-l", "--loci", nargs="*", default=None,
                    help="subset of loci (default: all found)")
    ap.add_argument("--out", default="-", help="output TSV [stdout]")
    args = ap.parse_args(argv)
    sink = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        summarize(Path(args.output), args.loci, sink)
    finally:
        if sink is not sys.stdout:
            sink.close()


if __name__ == "__main__":
    main()
