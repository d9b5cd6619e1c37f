#!/usr/bin/env python
"""Evaluate genotyping accuracy against known truth.

Counterpart of reference extra/eval_accuracy.py (:16-37): for each locus,
compares the called genotype in res.json.gz against a truth table, and when
the DB stores a divergence matrix, reports the genotype-to-truth divergence
(min-permutation sum, solvers/solve.rs:338-347).

Usage:
    python extra/eval_accuracy.py -o OUT_DIR -d DB_DIR -t truth.tsv

truth.tsv lines: "<locus> <hapA,hapB>".
"""
import argparse
import gzip
import json
import sys
from pathlib import Path

import numpy as np


def gt_divergence(called, truth, names, div):
    ix = {n: i for i, n in enumerate(names)}
    c = [ix[h] for h in called]
    t = [ix[h] for h in truth]
    d1 = div[c[0], t[0]] + div[c[1], t[1]]
    d2 = div[c[0], t[1]] + div[c[1], t[0]]
    return float(min(d1, d2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True, help="genotype output dir")
    ap.add_argument("-d", "--db", required=True)
    ap.add_argument("-t", "--truth", required=True)
    args = ap.parse_args()

    truth = {}
    for line in open(args.truth):
        fields = line.split()
        if len(fields) >= 2:
            truth[fields[0]] = sorted(fields[1].split(","))

    n = exact = 0
    total_div = 0.0
    print("locus\tcalled\ttruth\texact\tdivergence\tquality")
    for locus, want in sorted(truth.items()):
        res_path = Path(args.output) / "loci" / locus / "res.json.gz"
        if not res_path.exists():
            print(f"{locus}\tMISSING\t{','.join(want)}\t0\tnan\tnan")
            continue
        res = json.load(gzip.open(res_path, "rt"))
        called = sorted(res["genotype"].split(","))
        ok = called == want
        div_val = float("nan")
        dist_path = Path(args.db) / "loci" / locus / "distances.npz"
        if dist_path.exists():
            z = np.load(dist_path)
            try:
                div_val = gt_divergence(called, want, list(z["names"]), z["div"])
            except KeyError:
                pass
        n += 1
        exact += ok
        if np.isfinite(div_val):
            total_div += div_val
        print(f"{locus}\t{','.join(called)}\t{','.join(want)}\t{int(ok)}"
              f"\t{div_val:.5f}\t{res.get('quality', 0):.1f}")
    if n:
        print(f"# exact: {exact}/{n} ({100.0 * exact / n:.1f}%), "
              f"mean divergence {total_div / n:.5f}", file=sys.stderr)
    return 0 if exact == n else 1


if __name__ == "__main__":
    sys.exit(main())
