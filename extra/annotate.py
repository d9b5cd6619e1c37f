#!/usr/bin/env python
"""Annotate genotype calls with known allele names.

Role twin of reference extra/annotate.py: takes the merged calls TSV from
extra/into_csv.py plus a haplotype->annotation table and rewrites each
called genotype as annotation labels (e.g. raw assembly haplotype IDs ->
HLA allele names).

Annotation table (TSV, '#' comments allowed): locus, haplotype,
annotation[, tag].  A locus may carry several annotation sets
distinguished by tag; rows without a tag form the default '*' set.

Usage:
    python extra/into_csv.py out1 ... > calls.tsv
    python extra/annotate.py -i calls.tsv -a alleles.tsv -o annotated.tsv
"""
import argparse
import gzip
import sys


def _open(path, mode="rt"):
    if path == "-":
        return sys.stdin if "r" in mode else sys.stdout
    return gzip.open(path, mode) if str(path).endswith(".gz") else open(path, mode)


def load_annotation(path):
    """Returns {locus: {tag: {hap: label}}} and whether any explicit tag
    was seen (controls whether the output carries a tag column)."""
    table, tagged = {}, False
    with _open(path) as f:
        for ln, line in enumerate(f, 1):
            if line.startswith("#") or not line.strip():
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3:
                raise SystemExit(f"{path}:{ln}: need >=3 columns")
            locus, hap, label = cols[0], cols[1], cols[2]
            tag = cols[3] if len(cols) > 3 and cols[3] else "*"
            tagged |= tag != "*"
            dest = table.setdefault(locus, {}).setdefault(tag, {})
            if hap in dest and dest[hap] != label:
                print(f"WARN: {locus}/{tag}: haplotype {hap} annotated twice "
                      f"({dest[hap]} vs {label})", file=sys.stderr)
            dest[hap] = label
    return table, tagged


def main():
    ap = argparse.ArgumentParser(
        description="Map called haplotypes to annotation labels.")
    ap.add_argument("-i", "--input", required=True,
                    help="Calls TSV from extra/into_csv.py ('-' for stdin).")
    ap.add_argument("-a", "--annotation", required=True,
                    help="TSV: locus, haplotype, annotation[, tag].")
    ap.add_argument("-o", "--output", default="-",
                    help="Output TSV ('-' for stdout) [stdout].")
    args = ap.parse_args()

    table, tagged = load_annotation(args.annotation)
    n_rows = 0
    with _open(args.input) as inp, _open(args.output, "wt") as out:
        header = inp.readline().rstrip("\n").split("\t")
        try:
            i_sample = header.index("sample")
            i_locus = header.index("locus")
            i_gt = header.index("genotype")
        except ValueError:
            raise SystemExit("input must have sample/locus/genotype columns "
                             "(extra/into_csv.py output)")
        cols = ["sample", "locus"] + (["tag"] if tagged else []) + ["alleles"]
        out.write("\t".join(cols) + "\n")
        for line in inp:
            row = line.rstrip("\n").split("\t")
            locus_annot = table.get(row[i_locus])
            if not locus_annot:
                continue
            gt = row[i_gt]
            for tag in sorted(locus_annot):
                labels = (["<NOCALL>"] if gt == "*" else
                          [locus_annot[tag].get(h, "<UNKNOWN>")
                           for h in gt.split(",")])
                fields = [row[i_sample], row[i_locus]]
                if tagged:
                    fields.append(tag)
                fields.append(",".join(labels))
                out.write("\t".join(fields) + "\n")
                n_rows += 1
    print(f"Annotated {n_rows} calls", file=sys.stderr)


if __name__ == "__main__":
    main()
