#!/usr/bin/env python
"""Generate a --reg-weights BED from per-haplotype gene annotations.

Role twin of reference extra/weight_exons.py: the genotype command can
*consume* per-region weights (--reg-weights, see bg/err_prof.py weighted
variant and model/windows.py ExplicitWeights); this tool *produces* them
from Immuannot-style GTF annotations, assigning each base of each
haplotype one of three weights: CDS/codon bases (exons), remaining gene
body (introns/UTRs), and everything else (intergenic).

Usage:
    python extra/weight_exons.py -i haps.fa[.gz] -a 'annot/{}.gtf[.gz]' \
        -g HLA-A [-w 1.0 0.5 0.01] [-d discarded.txt] -o weights.bed

The annotation path must contain `{}`, replaced by each haplotype name.
Discarded-haplotypes lines ("kept = dropped1, dropped2") copy the kept
haplotype's weights to its identical discarded twins, matching the
add command's discarded_haplotypes.txt format (utils/paths.py).
"""
import argparse
import gzip
import os
import sys

import numpy as np

# Priority classes painted over each haplotype, low = strongest.
CLS_CDS, CLS_GENE, CLS_REST = 0, 1, 2


def _open(path, mode="rt"):
    return gzip.open(path, mode) if str(path).endswith(".gz") else open(path, mode)


def read_fasta_lengths(path):
    """Yields (name, length) for each record without keeping sequences."""
    name, length = None, 0
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, length
                name, length = line[1:].split()[0], 0
            else:
                length += len(line)
    if name is not None:
        yield name, length


def gtf_intervals(path, gene):
    """Extracts (feature_class, start0, end) intervals for `gene` from a
    GTF: CDS/start_codon/stop_codon rows -> CLS_CDS, gene rows -> CLS_GENE.
    GTF coordinates are 1-based inclusive; returns 0-based half-open."""
    needle = f'gene_name "{gene}";'
    out = []
    with _open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 9 or needle not in cols[8]:
                continue
            feat = cols[2]
            if feat == "gene":
                cls = CLS_GENE
            elif feat in ("CDS", "start_codon", "stop_codon"):
                cls = CLS_CDS
            else:
                continue
            start, end = int(cols[3]) - 1, int(cols[4])
            if start < end:
                out.append((cls, start, end))
    return out


def paint_classes(length, intervals):
    """Paints a per-base class array: background CLS_REST, then gene
    bodies, then CDS on top (higher priority = painted last)."""
    cls = np.full(length, CLS_REST, dtype=np.int8)
    for want in (CLS_GENE, CLS_CDS):
        for c, s, e in intervals:
            if c == want:
                cls[s:min(e, length)] = want
    return cls


def class_runs(cls):
    """Collapses the per-base class array into (start, end, class) runs."""
    if cls.size == 0:
        return []
    edges = np.flatnonzero(np.diff(cls)) + 1
    starts = np.concatenate(([0], edges))
    ends = np.concatenate((edges, [cls.size]))
    return [(int(s), int(e), int(cls[s])) for s, e in zip(starts, ends)]


def main():
    ap = argparse.ArgumentParser(
        description="Produce per-region weight BED (exons/introns/intergenic) "
                    "for genotype --reg-weights.")
    ap.add_argument("-i", "--input", required=True, metavar="FASTA",
                    help="Haplotype FASTA (sequence lengths only are used).")
    ap.add_argument("-a", "--annot", required=True, metavar="PATTERN",
                    help="GTF path pattern with {} for the haplotype name.")
    ap.add_argument("-g", "--gene", required=True, help="Gene name to weight.")
    ap.add_argument("-w", "--weights", nargs=3, type=float,
                    default=[1.0, 0.5, 0.01], metavar="W",
                    help="Weights for CDS / gene body / intergenic "
                         "[%(default)s].")
    ap.add_argument("-d", "--discarded", metavar="FILE",
                    help="discarded_haplotypes.txt: copy weights from kept "
                         "haplotypes to their discarded identical twins.")
    ap.add_argument("-o", "--output", required=True, metavar="BED")
    args = ap.parse_args()

    if "{}" not in args.annot:
        ap.error("--annot pattern must contain {}")

    rows = {}
    for name, length in read_fasta_lengths(args.input):
        gtf_path = args.annot.replace("{}", name)
        ivs = gtf_intervals(gtf_path, args.gene)
        bad = [e for _, _, e in ivs if e > length]
        if bad:
            raise SystemExit(f"{name}: annotation extends past sequence end "
                             f"({max(bad)} > {length})")
        rows[name] = class_runs(paint_classes(length, ivs))

    if args.discarded:
        if os.path.exists(args.discarded):
            with _open(args.discarded) as f:
                for line in f:
                    if "=" not in line:
                        continue
                    kept, _, dropped = line.partition("=")
                    kept = kept.strip()
                    for twin in (t.strip() for t in dropped.split(",")):
                        if twin and kept in rows:
                            rows[twin] = rows[kept]
        else:
            print(f"WARN: {args.discarded} not found", file=sys.stderr)

    with _open(args.output, "wt") as out:
        for name, runs in rows.items():
            for s, e, c in runs:
                out.write(f"{name}\t{s}\t{e}\t{args.weights[c]:.8g}\n")
    print(f"Wrote weights for {len(rows)} haplotypes to {args.output}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
