"""DNA sequences as numpy code arrays.

Encoding: A=0, C=1, G=2, T=3, anything else (N, ...) = 4 (invalid).
This is the layout consumed by both host numpy kernels and device kernels
(int8 code tensors).  Counterpart of scattered per-byte matches in the
reference (seq/kmers.rs:177-191 etc.) — here the whole sequence is encoded
once into a dense array.
"""
from __future__ import annotations

import numpy as np

N_CODE = 4

_ENCODE_LUT = np.full(256, N_CODE, dtype=np.int8)
for i, ch in enumerate(b"ACGT"):
    _ENCODE_LUT[ch] = i
for i, ch in enumerate(b"acgt"):
    _ENCODE_LUT[ch] = i

_DECODE_LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)


def encode(seq) -> np.ndarray:
    """bytes/str -> int8 codes (A=0 C=1 G=2 T=3, other=4)."""
    if isinstance(seq, str):
        seq = seq.encode()
    arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    return _ENCODE_LUT[arr]


def decode(codes: np.ndarray) -> str:
    return _DECODE_LUT[np.clip(codes, 0, 4)].tobytes().decode()


def revcomp(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code array (N maps to N)."""
    comp = np.where(codes < 4, 3 - codes, codes)
    return comp[::-1].copy()


def revcomp_str(seq: str) -> str:
    return decode(revcomp(encode(seq)))


def gc_content(codes: np.ndarray) -> float:
    """GC percentage of valid bases (seq::gc_content counterpart)."""
    n = codes.size
    if n == 0:
        return float("nan")
    return 100.0 * float(np.count_nonzero((codes == 1) | (codes == 2))) / n


def has_n(codes: np.ndarray) -> bool:
    return bool(np.any(codes >= 4))
