#!/usr/bin/env python
"""Summarize genotyping outputs into one CSV.

Counterpart of reference extra/into_csv.py: walks one or more genotype
output directories (sample name = directory name, or NAME=DIR), reads each
locus res.json.gz, and emits a TSV of calls + quality features.

Usage:
    python extra/into_csv.py out1 NAME2=out2 ... > calls.tsv
"""
import gzip
import json
import sys
from pathlib import Path


def main():
    args = sys.argv[1:]
    if not args:
        print(__doc__, file=sys.stderr)
        return 1
    print("sample\tlocus\tgenotype\tquality\ttotal_reads\tunexpl_reads"
          "\tweight_dist\twarnings")
    for spec in args:
        name, _, path = spec.rpartition("=")
        path = Path(path)
        name = name or path.name
        loci_dir = path / "loci"
        if not loci_dir.is_dir():
            print(f"{path}: no loci/ directory", file=sys.stderr)
            continue
        for ldir in sorted(loci_dir.iterdir()):
            res_path = ldir / "res.json.gz"
            if not res_path.exists():
                continue
            with gzip.open(res_path, "rt") as f:
                res = json.load(f)
            wd = res.get("weight_dist")
            print(f"{name}\t{ldir.name}\t{res.get('genotype', '*')}\t"
                  f"{res.get('quality', 0.0):.1f}\t"
                  f"{res.get('total_reads', 0)}\t"
                  f"{res.get('unexpl_reads', 0)}\t"
                  f"{'NA' if wd is None else f'{wd:.5f}'}\t"
                  f"{';'.join(res.get('warnings', [])) or '.'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
