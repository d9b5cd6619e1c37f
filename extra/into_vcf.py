#!/usr/bin/env python
"""Convert a genotype call + per-locus haplotype VCF into a sample VCF.

Counterpart of reference extra/into_vcf.py: the haplotype VCF (e.g. from
`locityper-tpu paf-vcf`, samples = haplotype names, haploid GTs) is reduced
to one diploid sample by combining the two called haplotypes' alleles.

Usage:
    python extra/into_vcf.py -o out_dir -v haps.vcf[.gz] -l LOCUS \\
        -s SAMPLE > sample.vcf
"""
import argparse
import gzip
import json
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", required=True,
                    help="Genotype output directory (contains loci/)")
    ap.add_argument("-v", "--vcf", required=True,
                    help="Haplotype VCF (samples = haplotype names)")
    ap.add_argument("-l", "--locus", required=True)
    ap.add_argument("-s", "--sample", default="SAMPLE")
    args = ap.parse_args()

    res_path = Path(args.output) / "loci" / args.locus / "res.json.gz"
    with gzip.open(res_path, "rt") as f:
        res = json.load(f)
    called = res["genotype"].split(",")

    opener = gzip.open if args.vcf.endswith(".gz") else open
    header_cols = None
    ix = []
    with opener(args.vcf, "rt") as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith("##"):
                print(line)
                continue
            if line.startswith("#CHROM"):
                header_cols = line.split("\t")
                samples = header_cols[9:]
                try:
                    ix = [samples.index(h) for h in called]
                except ValueError as e:
                    sys.exit(f"called haplotype missing from VCF: {e}")
                print("\t".join(header_cols[:9] + [args.sample]))
                continue
            fld = line.split("\t")
            alleles = [fld[9 + i].split(":")[0] for i in ix]
            gt = "|".join(alleles)
            if set(alleles) == {"0"}:
                continue                     # hom-ref rows dropped
            print("\t".join(fld[:9] + [gt]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
