#!/usr/bin/env python3
"""Plot the off-target k-mer count landscape of a locus.

Role twin of the reference's extra/draw_kmers.r (matplotlib instead of
R): reads <db>/loci/<locus>/kmers.npz (per-haplotype genome-wide counts
of each haplotype k-mer, written by `add`) and draws the count profile
along every haplotype — the view that explains recruitment rarity and
unique-kmer read weights.  Optionally overlays the modeled read-weight
distribution from a genotype run's read_pairs.csv.gz (--debug 2).

Usage: draw_kmers.py -d DB -l LOCUS [-o kmers.png]
       [--read-pairs OUT/loci/LOCUS/read_pairs.csv.gz]
"""
import argparse
import gzip
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-d", "--db", required=True)
    ap.add_argument("-l", "--locus", required=True)
    ap.add_argument("-o", "--out", default=None,
                    help="output image [<db>/loci/<locus>/kmers.png]")
    ap.add_argument("--read-pairs", default=None,
                    help="read_pairs.csv.gz from `genotype --debug 2` "
                         "to overlay the read-weight histogram")
    ap.add_argument("--max-count", type=int, default=10,
                    help="clip counts in the profile plot [%(default)s]")
    args = ap.parse_args(argv)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ldir = Path(args.db) / "loci" / args.locus
    z = np.load(ldir / "kmers.npz")
    haps = sorted(f for f in z.files if f.startswith("c"))
    n_panels = 2 if args.read_pairs else 1
    fig, axes = plt.subplots(n_panels, 1,
                             figsize=(11, 3.2 * n_panels), squeeze=False)
    ax = axes[0][0]
    for f in haps:
        c = np.minimum(z[f].astype(int), args.max_count)
        ax.plot(np.arange(c.size), c, lw=0.7, alpha=0.8,
                label=f"hap {f[1:]}")
    ax.set_xlabel(f"haplotype position (k={int(z['k'])})")
    ax.set_ylabel(f"genome count (clip {args.max_count})")
    ax.set_title(f"{args.locus}: off-target k-mer counts "
                 "(1 = locus-unique)")
    if len(haps) <= 8:
        ax.legend(ncol=min(len(haps), 4), fontsize=8, frameon=False)

    if args.read_pairs:
        w = []
        with gzip.open(args.read_pairs, "rt") as f:
            header = f.readline().rstrip("\n").split("\t")
            wcol = header.index("weight")
            seen = set()
            rcol = header.index("read")
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if parts[rcol] not in seen:
                    seen.add(parts[rcol])
                    w.append(float(parts[wcol]))
        ax2 = axes[1][0]
        ax2.hist(w, bins=40, color="#3366aa")
        ax2.set_xlabel("modeled read weight (unique-kmer sigmoid)")
        ax2.set_ylabel("reads")
    out = args.out or str(ldir / "kmers.png")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
