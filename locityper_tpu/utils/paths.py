"""On-disk database/output layout (counterpart of reference command/paths.rs:1-27).

Database directory:
    db/
      loci/
        <locus>/
          ref.bed                  locus position in the reference genome
          haplotypes.fa.gz         haplotype sequences
          haplotypes.paf.gz        all-vs-all haplotype alignments (align cmd)
          kmers.npz                off-target k-mer counts per haplotype
          distances.npz            minimizer divergence matrix
          discarded_haplotypes.txt
          success

Analysis (output) directory:
    out/
      bg/
        distr.json.gz              fitted background distributions (preproc)
        success
      loci/
        <locus>/
          reads.npz                recruited reads
          alns.npz                 read x haplotype alignments
          res.json.gz              genotyping result
          sol.csv.gz               per-stage solution scores
          success
"""
from pathlib import Path

LOCI_DIR = "loci"
BG_DIR = "bg"
REF_BED = "ref.bed"
HAPLOTYPES = "haplotypes.fa.gz"
HAP_PAF = "haplotypes.paf.gz"
KMER_COUNTS = "kmers.npz"
DISTANCES = "distances.npz"
DISCARDED = "discarded_haplotypes.txt"
BG_DISTR = "distr.json.gz"
READS = "reads.npz"
ALNS = "alns.npz"
RES_JSON = "res.json.gz"
SOL_CSV = "sol.csv.gz"
ALNS_OUT_DIR = "alns"


def locus_dir(root, locus: str) -> Path:
    return Path(root) / LOCI_DIR / locus


def bg_dir(root) -> Path:
    return Path(root) / BG_DIR
