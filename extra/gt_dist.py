#!/usr/bin/env python
"""Genotype distances from haplotype PAF alignments.

Counterpart of reference extra/gt_dist.py (:17-30): given two genotypes and
a PAF file with cg:Z: CIGARs (e.g. from `locityper-tpu align`), computes the
edit-based distance between them as the minimum over haplotype pairings of
the summed pairwise edit distances.

Usage:
    python extra/gt_dist.py -p haps.paf -g hapA,hapB -G hapC,hapD
"""
import argparse
import gzip
import itertools
import re
import sys

_CIG = re.compile(r"(\d+)([=XIDMSH])")


def load_paf_edits(path):
    """{frozenset(q, t): (edit, aln_len)} from NM:i / cg:Z tags."""
    opener = gzip.open if str(path).endswith(".gz") else open
    out = {}
    with opener(path, "rt") as f:
        for line in f:
            fld = line.rstrip("\n").split("\t")
            if len(fld) < 12:
                continue
            q, t = fld[0], fld[5]
            nm = None
            aln_len = int(fld[10])
            for tag in fld[12:]:
                if tag.startswith("NM:i:"):
                    nm = int(tag[5:])
            if nm is None:
                cg = next((t_[5:] for t_ in fld[12:]
                           if t_.startswith("cg:Z:")), None)
                if cg is None:
                    continue
                nm = sum(int(n) for n, op in _CIG.findall(cg) if op in "XID")
            key = frozenset((q, t))
            if key not in out or nm < out[key][0]:
                out[key] = (nm, aln_len)
    return out


def hap_dist(edits, a: str, b: str):
    if a == b:
        return 0.0
    rec = edits.get(frozenset((a, b)))
    if rec is None:
        return None
    return rec[0] / max(rec[1], 1)


def gt_dist(edits, gt1, gt2):
    """Min-permutation summed divergence (solve.rs:338-347)."""
    best = None
    for perm in itertools.permutations(gt2):
        total = 0.0
        ok = True
        for a, b in zip(gt1, perm):
            d = hap_dist(edits, a, b)
            if d is None:
                ok = False
                break
            total += d
        if ok and (best is None or total < best):
            best = total
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--paf", required=True,
                    help="Haplotype PAF with NM/cg tags")
    ap.add_argument("-g", "--gt1", required=True, help="hapA,hapB")
    ap.add_argument("-G", "--gt2", required=True, help="hapC,hapD")
    args = ap.parse_args()
    edits = load_paf_edits(args.paf)
    d = gt_dist(edits, args.gt1.split(","), args.gt2.split(","))
    if d is None:
        print("NA (haplotype pair missing from the PAF)", file=sys.stderr)
        return 1
    print(f"{d:.6f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
