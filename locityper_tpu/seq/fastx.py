"""FASTA/FASTQ reading & writing (counterpart of reference seq/fastx.rs).

Host-side streaming parsers producing numpy code arrays; reads are consumed
in fixed-size *batches* (dense [B, L] int8 tensors + length vectors) — the
shape the device kernels operate on.  Gzip handled transparently.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..utils.io import smart_open
from . import dna


@dataclass
class Read:
    name: str
    seq: np.ndarray            # int8 codes
    qual: np.ndarray | None = None


def read_fasta(path):
    """Yields (name, codes) from a (possibly gzipped) FASTA file."""
    name = None
    chunks: list[str] = []
    with smart_open(path) as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, dna.encode("".join(chunks))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        yield name, dna.encode("".join(chunks))


def read_fastq(path):
    """Yields Read from a (possibly gzipped) FASTQ file."""
    with smart_open(path) as f:
        while True:
            header = f.readline()
            if not header:
                return
            seq = f.readline().rstrip()
            f.readline()  # +
            qual = f.readline().rstrip()
            yield Read(header[1:].rstrip().split()[0], dna.encode(seq),
                       np.frombuffer(qual.encode(), dtype=np.uint8) - 33)


def read_fastx_auto(path):
    """Dispatch on first character: FASTA yields Read(qual=None)."""
    with smart_open(path) as f:
        first = f.read(1)
    if first == ">":
        for name, codes in read_fasta(path):
            yield Read(name, codes)
    else:
        yield from read_fastq(path)


def read_pairs(path1, path2=None, interleaved: bool = False):
    """Yields (Read, Read) mate pairs: from two files, or one interleaved file
    (fastx.rs:430-536)."""
    if path2 is not None:
        it1, it2 = read_fastx_auto(path1), read_fastx_auto(path2)
        for r1 in it1:
            r2 = next(it2, None)
            if r2 is None:
                raise ValueError("Second mate file ended early")
            yield r1, r2
    elif interleaved:
        it = read_fastx_auto(path1)
        for r1 in it:
            r2 = next(it, None)
            if r2 is None:
                raise ValueError("Odd number of reads in interleaved file")
            yield r1, r2
    else:
        raise ValueError("read_pairs needs a second file or interleaved=True")


def write_fasta(f, name: str, codes: np.ndarray, width: int = 120) -> None:
    s = dna.decode(codes)
    f.write(f">{name}\n")
    for i in range(0, len(s), width):
        f.write(s[i:i + width] + "\n")


def write_fastq(f, read: Read) -> None:
    s = dna.decode(read.seq)
    q = "~" * len(s) if read.qual is None else (read.qual + 33).tobytes().decode()
    f.write(f"@{read.name}\n{s}\n+\n{q}\n")


def mean_read_len(path, max_reads: int = 1000) -> float:
    """Mean length of the first `max_reads` reads (fastx.rs:889)."""
    total = 0
    n = 0
    for read in read_fastx_auto(path):
        total += read.seq.size
        n += 1
        if n >= max_reads:
            break
    return total / max(n, 1)


def batchify(reads: list[np.ndarray], batch: int, max_len: int,
             pad_to_batch: bool = True):
    """Packs variable-length code arrays into dense [B, max_len] int8 batches
    (pad = N code) plus an int32 length vector — the device-kernel input
    layout (design: SURVEY.md §7 'irregular data → dense tensors')."""
    for i in range(0, len(reads), batch):
        chunk = reads[i:i + batch]
        b = len(chunk) if not pad_to_batch else batch
        mat = np.full((b, max_len), dna.N_CODE, dtype=np.int8)
        lens = np.zeros(b, dtype=np.int32)
        for j, r in enumerate(chunk):
            L = min(r.size, max_len)
            mat[j, :L] = r[:L]
            lens[j] = L
        yield mat, lens, len(chunk)
