"""`prune` command: thin the haplotype panel by hierarchical clustering.

Counterpart of reference command/prune.rs: complete-linkage clustering of
haplotypes by divergence (:367-433, kodama → scipy here), cut at a fixed
threshold or to a target cluster count, representative = haplotype with the
smallest power-mean intra-cluster divergence (:249-341), then thin the DB
files (:475-521).  Newick tree output preserved.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage
from scipy.spatial.distance import squareform

from ..seq import fastx
from ..seq.counts import KmerCounts
from ..utils import paths
from ..utils.io import smart_create, write_success
from ..utils.logging import get_logger

logger = get_logger("prune")


def add_args(p):
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-l", "--loci", nargs="*", default=None)
    p.add_argument("-t", "--threshold", type=float, default=None,
                   help="Divergence cut threshold")
    p.add_argument("-n", "--n-clusters", type=int, default=None,
                   help="Target number of clusters")
    p.add_argument("--power", type=float, default=2.0,
                   help="Power mean exponent for representative selection")
    p.add_argument("--newick", action="store_true",
                   help="Write the dendrogram as Newick")
    return p


def cluster_haplotypes(div: np.ndarray, threshold=None, n_clusters=None):
    """Complete-linkage clustering; returns cluster labels per haplotype."""
    n = div.shape[0]
    if n <= 1:
        return np.zeros(n, int), None
    Z = linkage(squareform(div, checks=False), method="complete")
    if n_clusters is not None:
        labels = fcluster(Z, t=n_clusters, criterion="maxclust")
    else:
        t = threshold if threshold is not None else select_cut_threshold(Z)
        labels = fcluster(Z, t=t, criterion="distance")
    return labels - 1, Z


def select_cut_threshold(Z) -> float:
    """Automatic threshold: largest merge-height gap (counterpart of
    prune.rs:344-364's heuristic)."""
    heights = Z[:, 2]
    if heights.size < 2:
        return float(heights[-1]) if heights.size else 0.0
    gaps = np.diff(heights)
    i = int(np.argmax(gaps))
    return float((heights[i] + heights[i + 1]) / 2)


def representative(div: np.ndarray, members: np.ndarray, power: float) -> int:
    """Member minimizing the power-mean of intra-cluster divergences
    (prune.rs:249-341, math/mod.rs PowerMean)."""
    if members.size == 1:
        return int(members[0])
    sub = div[np.ix_(members, members)]
    if power == np.inf:
        score = sub.max(axis=1)
    elif power == 0:
        score = np.exp(np.log(np.maximum(sub, 1e-12)).mean(axis=1))
    else:
        score = (np.power(sub, power).mean(axis=1)) ** (1.0 / power)
    return int(members[np.argmin(score)])


def to_newick(Z, names) -> str:
    from scipy.cluster.hierarchy import to_tree
    tree = to_tree(Z)

    def rec(node):
        if node.is_leaf():
            return names[node.id]
        return f"({rec(node.left)}:{node.dist / 2:.5f}," \
               f"{rec(node.right)}:{node.dist / 2:.5f})"
    return rec(tree) + ";"


def prune_locus(ldir: Path, threshold, n_clusters, power, newick):
    named = [(r.name, r.seq) for r in fastx.read_fastx_auto(ldir / paths.HAPLOTYPES)]
    names = [n for n, _ in named]
    div = np.load(ldir / paths.DISTANCES)["div"]
    labels, Z = cluster_haplotypes(div, threshold, n_clusters)
    keep = sorted({representative(div, np.nonzero(labels == c)[0], power)
                   for c in np.unique(labels)})
    logger.info("[%s] %d haplotypes -> %d clusters", ldir.name, len(names),
                len(keep))
    if len(keep) == len(names):
        return
    kept_names = [names[i] for i in keep]
    with smart_create(ldir / paths.HAPLOTYPES) as f:
        for i in keep:
            fastx.write_fasta(f, names[i], named[i][1])
    kc = KmerCounts.load_npz(ldir / paths.KMER_COUNTS).thin_out(keep)
    kc.save_npz(ldir / paths.KMER_COUNTS)
    np.savez_compressed(ldir / paths.DISTANCES, div=div[np.ix_(keep, keep)],
                        names=np.array(kept_names))
    with open(ldir / paths.DISCARDED, "a") as f:
        for c in np.unique(labels):
            members = np.nonzero(labels == c)[0]
            rep = representative(div, members, power)
            for m in members:
                if m != rep:
                    f.write(f"{names[m]}\t~\t{names[rep]}\n")
    if newick and Z is not None:
        (ldir / "clusters.nwk").write_text(to_newick(Z, names) + "\n")
    write_success(ldir)


def run(args):
    db = Path(args.db)
    loci = args.loci or sorted(
        d.name for d in (db / paths.LOCI_DIR).iterdir() if d.is_dir())
    for name in loci:
        prune_locus(paths.locus_dir(db, name), args.threshold,
                    args.n_clusters, args.power, args.newick)
    return 0
