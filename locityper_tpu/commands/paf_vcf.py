"""`paf-vcf` command: convert haplotype↔reference PAF alignments to VCF.

Counterpart of reference command/paf_vcf.rs: walks each PAF row's cg:Z:
CIGAR against the target sequence and emits SNV/indel records per locus.
Requires PAF rows with extended CIGARs (=/X/I/D ops).
"""
from __future__ import annotations

import re
from pathlib import Path

from ..seq import dna, fastx
from ..utils.io import smart_create, smart_open
from ..utils.logging import get_logger

logger = get_logger("paf-vcf")

_CIGAR_RE = re.compile(r"(\d+)([=XIDMSH])")


def add_args(p):
    p.add_argument("-i", "--input", required=True, help="PAF file with cg:Z: tags")
    p.add_argument("-q", "--query", required=True, help="Query (haplotype) FASTA")
    p.add_argument("-t", "--target", required=True, help="Target (reference) FASTA")
    p.add_argument("-o", "--output", required=True, help="Output VCF(.gz)")
    return p


def parse_paf_line(line: str):
    f = line.rstrip("\n").split("\t")
    row = dict(qname=f[0], qlen=int(f[1]), qstart=int(f[2]), qend=int(f[3]),
               strand=f[4], tname=f[5], tlen=int(f[6]), tstart=int(f[7]),
               tend=int(f[8]), matches=int(f[9]), alen=int(f[10]),
               mapq=int(f[11]), cg=None)
    for tag in f[12:]:
        if tag.startswith("cg:Z:"):
            row["cg"] = tag[5:]
    return row


def variants_from_cigar(cg: str, qseq, tseq, qstart: int, tstart: int):
    """Yields (t_pos, ref, alt) variants from an extended CIGAR."""
    qp, tp = qstart, tstart
    for m in _CIGAR_RE.finditer(cg):
        n, op = int(m.group(1)), m.group(2)
        if op == "=":
            qp += n
            tp += n
        elif op in ("X", "M"):
            for i in range(n):
                ref = dna.decode(tseq[tp + i:tp + i + 1])
                alt = dna.decode(qseq[qp + i:qp + i + 1])
                if ref != alt:
                    yield tp + i, ref, alt
            qp += n
            tp += n
        elif op == "I":
            anchor = dna.decode(tseq[tp - 1:tp]) or "N"
            ins = dna.decode(qseq[qp:qp + n])
            yield tp - 1, anchor, anchor + ins
            qp += n
        elif op == "D":
            anchor = dna.decode(tseq[tp - 1:tp]) or "N"
            dele = dna.decode(tseq[tp - 1:tp + n])
            yield tp - 1, dele, anchor
            tp += n
        elif op in ("S", "H"):
            qp += n if op == "S" else 0


def run(args):
    qseqs = {n: s for n, s in fastx.read_fasta(args.query)}
    tseqs = {n: s for n, s in fastx.read_fasta(args.target)}
    variants: dict[tuple, set] = {}
    samples = sorted(qseqs)
    n_rows = 0
    with smart_open(args.input) as f:
        for line in f:
            if not line.strip():
                continue
            row = parse_paf_line(line)
            if row["cg"] is None:
                logger.warning("PAF row %s -> %s has no cg:Z: tag, skipping",
                               row["qname"], row["tname"])
                continue
            qseq = qseqs[row["qname"]]
            if row["strand"] == "-":
                qseq = dna.revcomp(qseq)
            tseq = tseqs[row["tname"]]
            for pos, ref, alt in variants_from_cigar(
                    row["cg"], qseq, tseq, row["qstart"], row["tstart"]):
                variants.setdefault((row["tname"], pos, ref, alt),
                                    set()).add(row["qname"])
            n_rows += 1
    with smart_create(args.output) as out:
        out.write("##fileformat=VCFv4.2\n")
        for name, seq in tseqs.items():
            out.write(f"##contig=<ID={name},length={seq.size}>\n")
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                  + "\t".join(samples) + "\n")
        for (tname, pos, ref, alt), qs in sorted(variants.items()):
            gts = "\t".join("1" if s in qs else "0" for s in samples)
            out.write(f"{tname}\t{pos + 1}\t.\t{ref}\t{alt}\t.\tPASS\t.\tGT\t{gts}\n")
    logger.info("Converted %d PAF rows into %d variant records", n_rows,
                len(variants))
    return 0
