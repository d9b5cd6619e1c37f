#!/usr/bin/env python3
"""Plot the background depth estimation debug output.

Role twin of the reference's extra/draw_depth.r (matplotlib instead of
R): reads <preproc-out>/bg/depth.csv.gz (written by `preproc --debug`)
and draws (a) window depth along the background region with discarded
windows greyed out, and (b) depth vs GC with the fitted NBinom mean and
5/95% quantile band from distr.json.gz when present.

Usage: draw_depth.py -p PREPROC_DIR [-o depth.png]
"""
import argparse
import gzip
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-p", "--preproc", required=True,
                    help="preproc output directory")
    ap.add_argument("-o", "--out", default=None,
                    help="output image [<preproc>/bg/depth.png]")
    args = ap.parse_args(argv)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pdir = Path(args.preproc)
    csv = pdir / "bg" / "depth.csv.gz"
    rows = np.genfromtxt(csv, delimiter="\t", names=True)
    out = args.out or str(pdir / "bg" / "depth.png")

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4.5))
    keep = rows["keep"] > 0
    ax1.plot(rows["start"][keep], rows["count"][keep], ".", ms=2,
             color="#3366aa", label="kept windows")
    if (~keep).any():
        ax1.plot(rows["start"][~keep], rows["count"][~keep], ".", ms=2,
                 color="#bbbbbb", label="discarded")
    ax1.set_xlabel("background region position")
    ax1.set_ylabel("read depth per window")
    ax1.legend(markerscale=4, frameon=False)

    ax2.plot(rows["gc"][keep] + np.random.default_rng(0).uniform(
        -0.35, 0.35, keep.sum()), rows["count"][keep], ".", ms=2,
        color="#3366aa", alpha=0.5)
    ax2.set_xlabel("window GC (%)")
    ax2.set_ylabel("read depth per window")

    distr = pdir / "bg" / "distr.json.gz"
    if distr.exists():
        from locityper_tpu.mathx.distr import NBinom
        obj = json.loads(gzip.open(distr, "rt").read())
        d = obj.get("bg_depth", {})
        ns, ps = d.get("n"), d.get("p")
        if ns and ps:
            gc = np.arange(len(ns))
            mean = np.array([NBinom(n, p).mean()
                             for n, p in zip(ns, ps)])
            ax2.plot(gc, mean, "-", color="#cc3333", lw=1.5,
                     label="fitted NBinom mean per GC")
            ax2.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"Wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
