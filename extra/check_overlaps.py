#!/usr/bin/env python
"""Find redundant (overlapping/contained/duplicate) loci in a database.

Role twin of reference extra/check_overlaps.py: scans db/loci/*/ref.bed
(only successfully built loci), reports pairs of loci whose reference
intervals overlap, and flags as *redundant* any locus identical to or
fully contained in another.  Redundant loci can optionally be moved out
of the database.

Usage:
    python extra/check_overlaps.py db [-O overlaps.tsv] [-m [-o DIR]]
"""
import argparse
import shutil
import sys
from pathlib import Path


def load_loci(db):
    """Reads (chrom, start, end, name) for every completed locus."""
    loci = []
    loci_dir = Path(db) / "loci"
    if not loci_dir.is_dir():
        raise SystemExit(f"{loci_dir}: not a database (no loci/)")
    for sub in sorted(loci_dir.iterdir()):
        bed = sub / "ref.bed"
        if not (sub / "success").exists() or not bed.exists():
            continue
        chrom, start, end, *rest = bed.read_text().split()[:4]
        name = rest[0] if rest else sub.name
        if name != sub.name:
            print(f"WARN: {bed} names locus {name!r}, directory is "
                  f"{sub.name!r}", file=sys.stderr)
        loci.append((chrom, int(start), int(end), sub.name))
    return loci


def classify_overlaps(loci):
    """Returns (pairs, redundant): pairs = every overlapping pair with its
    overlap length; redundant = names of loci identical to or contained in
    an earlier-sorted locus.  Sweep over loci sorted by (chrom, start,
    -end) so a container always precedes its containees."""
    order = sorted(loci, key=lambda l: (l[0], l[1], -l[2]))
    pairs, redundant = [], []
    active = []   # loci whose interval may still overlap the sweep point
    for chrom, start, end, name in order:
        active = [a for a in active if a[0] == chrom and a[2] > start]
        is_redundant = False
        for a_chrom, a_start, a_end, a_name in active:
            ov = min(end, a_end) - start
            pairs.append((a_name, name, ov,
                          ov / (a_end - a_start), ov / (end - start)))
            if (start, end) == (a_start, a_end):
                rel = "identical to"
                is_redundant = True
            elif end <= a_end:
                rel = "contained in"
                is_redundant = True
            else:
                rel = "overlaps"
            print(f"{name} ({chrom}:{start + 1:,}-{end:,}) {rel} "
                  f"{a_name} ({a_chrom}:{a_start + 1:,}-{a_end:,})",
                  file=sys.stderr)
        if is_redundant:
            redundant.append(name)
        active.append((chrom, start, end, name))
    return pairs, redundant


def main():
    ap = argparse.ArgumentParser(
        description="Check for overlapping target loci in a database.")
    ap.add_argument("db", help="Database directory (contains loci/).")
    ap.add_argument("-m", "--move", action="store_true",
                    help="Move redundant loci out of the database.")
    ap.add_argument("-o", "--output", metavar="DIR",
                    help="Destination for moved loci [<db>/redundant].")
    ap.add_argument("-O", "--out-csv", metavar="FILE",
                    help="Write every overlapping pair as TSV.")
    args = ap.parse_args()

    loci = load_loci(args.db)
    print(f"Loaded {len(loci)} loci from {args.db}/loci", file=sys.stderr)
    pairs, redundant = classify_overlaps(loci)

    if args.out_csv:
        with open(args.out_csv, "w") as f:
            f.write("locus1\tlocus2\toverlap\tfrac_of1\tfrac_of2\n")
            for a, b, ov, f1, f2 in pairs:
                f.write(f"{a}\t{b}\t{ov}\t{f1:.6f}\t{f2:.6f}\n")

    if args.move and redundant:
        dest_root = Path(args.output or Path(args.db) / "redundant")
        dest_root.mkdir(parents=True, exist_ok=True)
        for name in redundant:
            src = Path(args.db) / "loci" / name
            dest = dest_root / name
            n = 0
            while dest.exists():
                n += 1
                dest = dest_root / f"{name}-{n}"
            shutil.move(str(src), str(dest))
    head = ", ".join(redundant[:5]) + (" ..." if len(redundant) > 5 else "")
    print(f"{len(redundant)} / {len(loci)} redundant loci"
          + (f": {head}" if redundant else ""), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
