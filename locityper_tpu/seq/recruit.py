"""Read recruitment: minimizer index over locus panels + batch matching.

Behavioral counterpart of reference seq/recruit.rs, restructured for dense
batch processing.  The index is a sorted-key table (minimizer hash → span of
(locus, direction, rare) entries) instead of a hash map; lookups are
vectorized binary searches, which also run on device (ops/recruit.py).

Matching semantics (recruit.rs):
* every (minimizer, locus) entry keeps a 2-bit direction mask
  (1 = backward, 2 = forward) and a rare flag, rare := AND over occurrences
  (recruit.rs:626-644, 706-721);
* short single reads: counters [bw_common, fw_common, bw_rare, fw_rare];
  recruited iff any rare matches AND
  (3·r + c) / (3·(total − c) + c) ≥ match_frac   (rational comparison;
  recruit.rs:294-348, 852-881);
* read pairs: both mates must pass with strand-consistent orientation
  (mate1 forward ⇒ mate2 backward), numerator-sum argmax (:350-367, 885-932);
* long reads: rare-match fraction threshold + Kadane stretch score
  (+3 per rare match, 0 per common, −1 per miss, recruited when a stretch
  reaches stretch_score; :37-41, 93-98, 940-997).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction

import numpy as np

from .contigs import ContigSet
from .counts import KmerCounts
from .kmers import minimizers32

# Kadane stretch constants (recruit.rs:37-41).
SUBSUM_BONUS = 3
SUBSUM_PENALTY = 1
# Reads shorter than this are "short" (recruit.rs:34-35).
READ_LENGTH_THRESH = 500
RARE_WORTH = 3


@dataclass(frozen=True)
class RecruitParams:
    """Counterpart of recruit.rs Params (:44-121)."""
    minimizer_k: int = 15
    minimizer_w: int = 10
    match_frac: float = 0.5
    match_length: int = 2000
    thresh_kmer_count: int = 10

    def __post_init__(self):
        assert 1 <= self.minimizer_k <= 31
        assert 2 <= self.minimizer_w <= 63
        min_frac = SUBSUM_PENALTY / (SUBSUM_BONUS + 1)
        assert min_frac <= self.match_frac <= 1.0
        assert 200 <= self.match_length <= 100_000

    @property
    def match_frac_rational(self) -> Fraction:
        return Fraction(self.match_frac).limit_denominator(65535)

    @property
    def stretch_minims(self) -> int:
        """~2L/(w+1) minimizers per length-L stretch (recruit.rs:93-95)."""
        return -(-2 * self.match_length // (self.minimizer_w + 1))

    @property
    def stretch_score(self) -> int:
        # Integer-exact ceil over the rational match_frac = p/q, so the host
        # and device paths agree bit-for-bit at threshold boundaries.
        frac = self.match_frac_rational
        p, q = frac.numerator, frac.denominator
        num = self.stretch_minims * ((SUBSUM_BONUS + SUBSUM_PENALTY) * p
                                     - SUBSUM_PENALTY * q)
        num = max(num, SUBSUM_BONUS * q)
        return -(-num // q)

    def long_read_threshold(self, n_minims: int) -> int:
        frac = self.match_frac_rational
        num = min(self.stretch_minims, n_minims) * frac.numerator
        return max(1, -(-num // frac.denominator))


# Entry info bits: bit0 = backward, bit1 = forward, bit2 = rare.
DIR_BW = 1
DIR_FW = 2
RARE_BIT = 4


@dataclass
class TargetIndex:
    """Sorted minimizer → (locus, info) table across all target loci."""
    params: RecruitParams
    keys: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint32))
    offsets: np.ndarray = field(default_factory=lambda: np.zeros(1, np.int64))
    entry_locus: np.ndarray = field(default_factory=lambda: np.empty(0, np.int32))
    entry_info: np.ndarray = field(default_factory=lambda: np.empty(0, np.uint8))
    n_loci: int = 0
    _pending: list = field(default_factory=list)

    def add_locus(self, contig_set: ContigSet, kmer_counts: KmerCounts) -> int:
        """Adds one locus panel (TargetBuilder::add, recruit.rs:687-731)."""
        p = self.params
        locus_ix = self.n_loci
        base_k = kmer_counts.k
        mk = p.minimizer_k
        per_locus: dict[int, int] = {}
        for seq, counts in zip(contig_set.seqs, kmer_counts.counts):
            pos, vals, fwd = minimizers32(seq, mk, p.minimizer_w)
            n_counts = counts.shape[0]
            if n_counts == 0:
                continue
            if mk <= base_k:
                shift = (base_k - mk) // 2
                ix = np.minimum(np.maximum(pos - shift, 0), n_counts - 1)
                rare = counts[ix] < p.thresh_kmer_count
            else:
                shift = mk - base_k
                ix2 = np.minimum(pos + shift, n_counts - 1)
                rare = (counts[np.minimum(pos, n_counts - 1)] < p.thresh_kmer_count) \
                    & (counts[ix2] < p.thresh_kmer_count)
            for h, f, r in zip(vals.tolist(), fwd.tolist(), rare.tolist()):
                d = DIR_FW if f else DIR_BW
                prev = per_locus.get(h)
                if prev is None:
                    per_locus[h] = d | (RARE_BIT if r else 0)
                else:
                    new_rare = (prev & RARE_BIT) and r
                    per_locus[h] = (prev | d) & ~RARE_BIT | (RARE_BIT if new_rare else 0)
        for h, info in per_locus.items():
            self._pending.append((h, locus_ix, info))
        self.n_loci += 1
        return locus_ix

    def finalize(self) -> None:
        if not self._pending:
            self.keys = np.empty(0, np.uint32)
            self.offsets = np.zeros(1, np.int64)
            self.entry_locus = np.empty(0, np.int32)
            self.entry_info = np.empty(0, np.uint8)
            return
        arr = np.array([(h, l, i) for h, l, i in self._pending], dtype=np.uint64)
        order = np.lexsort((arr[:, 1], arr[:, 0]))
        arr = arr[order]
        hashes = arr[:, 0]
        uniq, starts = np.unique(hashes, return_index=True)
        self.keys = uniq.astype(np.uint32)
        self.offsets = np.concatenate([starts, [hashes.size]]).astype(np.int64)
        self.entry_locus = arr[:, 1].astype(np.int32)
        self.entry_info = arr[:, 2].astype(np.uint8)
        self._pending = []

    @property
    def max_entries_per_key(self) -> int:
        if self.keys.size == 0:
            return 0
        return int(np.max(np.diff(self.offsets)))

    def lookup(self, hashes: np.ndarray):
        """Vectorized lookup: returns (found_mask, lo, hi) spans per hash."""
        lo = np.searchsorted(self.keys, hashes, side="left")
        lo = np.minimum(lo, self.keys.size - 1) if self.keys.size else lo
        found = (self.keys.size > 0) & (self.keys[np.minimum(lo, self.keys.size - 1)] == hashes) \
            if self.keys.size else np.zeros(hashes.size, bool)
        start = self.offsets[np.minimum(lo, self.offsets.size - 2)]
        end = self.offsets[np.minimum(lo + 1, self.offsets.size - 1)]
        start = np.where(found, start, 0)
        end = np.where(found, end, 0)
        return found, start, end


def _mate_counts(index: TargetIndex, hashes: np.ndarray, fwd: np.ndarray):
    """Accumulates per-locus counters [bw_c, fw_c, bw_r, fw_r] for one read
    (BaseMatchCount::inc, recruit.rs:248-256)."""
    counts: dict[int, np.ndarray] = {}
    found, start, end = index.lookup(hashes)
    for t in np.nonzero(found)[0]:
        f = bool(fwd[t])
        for e in range(int(start[t]), int(end[t])):
            locus = int(index.entry_locus[e])
            info = int(index.entry_info[e])
            rare = bool(info & RARE_BIT)
            c = counts.get(locus)
            if c is None:
                c = np.zeros(4, np.int64)
                counts[locus] = c
            i = 2 if rare else 0
            # backward counter: entry directed opposite to read minimizer dir.
            c[i] += bool(info & (DIR_FW if not f else DIR_BW))
            c[i + 1] += bool(info & (DIR_FW if f else DIR_BW))
    return counts


def _better_fraction(c: np.ndarray, total: int) -> Fraction:
    """(recruit.rs:339-348)."""
    bw_c, fw_c, bw_r, fw_r = (int(x) for x in c)
    fw_numer = RARE_WORTH * fw_r + fw_c
    bw_numer = RARE_WORTH * bw_r + bw_c
    if fw_numer >= bw_numer:
        return Fraction(fw_numer, max(RARE_WORTH * (total - fw_c) + fw_c, 1))
    return Fraction(bw_numer, max(RARE_WORTH * (total - bw_c) + bw_c, 1))


def recruit_short_read(index: TargetIndex, seq: np.ndarray) -> list[int]:
    """(recruit.rs:852-881)."""
    p = index.params
    pos, hashes, fwd = minimizers32(seq, p.minimizer_k, p.minimizer_w)
    total = hashes.size
    out = []
    for locus, c in _mate_counts(index, hashes, fwd).items():
        if (c[2] or c[3]) and _better_fraction(c, total) >= p.match_frac_rational:
            out.append(locus)
    return sorted(out)


def recruit_read_pair(index: TargetIndex, seq1: np.ndarray, seq2: np.ndarray) -> list[int]:
    """(recruit.rs:885-932): strand-consistent joint orientation, both mates
    must pass the threshold."""
    p = index.params
    mf = p.match_frac_rational
    _, h1, f1 = minimizers32(seq1, p.minimizer_k, p.minimizer_w)
    _, h2, f2 = minimizers32(seq2, p.minimizer_k, p.minimizer_w)
    t1, t2 = h1.size, h2.size
    c1 = _mate_counts(index, h1, f1)
    if not c1:
        return []
    c2 = _mate_counts(index, h2, f2)
    out = []
    for locus, a in c1.items():
        b = c2.get(locus)
        if b is None:
            b = np.zeros(4, np.int64)
        if not (a[2] or a[3] or b[2] or b[3]):
            continue
        bw_c1, fw_c1, bw_r1, fw_r1 = (int(x) for x in a)
        bw_c2, fw_c2, bw_r2, fw_r2 = (int(x) for x in b)
        fw_n1, bw_n1 = RARE_WORTH * fw_r1 + fw_c1, RARE_WORTH * bw_r1 + bw_c1
        fw_n2, bw_n2 = RARE_WORTH * fw_r2 + fw_c2, RARE_WORTH * bw_r2 + bw_c2
        if fw_n1 + bw_n2 >= bw_n1 + fw_n2:
            frac1 = Fraction(fw_n1, max(RARE_WORTH * (t1 - fw_c1) + fw_c1, 1))
            frac2 = Fraction(bw_n2, max(RARE_WORTH * (t2 - bw_c2) + bw_c2, 1))
        else:
            frac1 = Fraction(bw_n1, max(RARE_WORTH * (t1 - bw_c1) + bw_c1, 1))
            frac2 = Fraction(fw_n2, max(RARE_WORTH * (t2 - fw_c2) + fw_c2, 1))
        if frac1 >= mf and frac2 >= mf:
            out.append(locus)
    return sorted(out)


def recruit_long_read(index: TargetIndex, seq: np.ndarray) -> list[int]:
    """(recruit.rs:966-997): rare fraction + Kadane matching stretch."""
    p = index.params
    pos, hashes, fwd = minimizers32(seq, p.minimizer_k, p.minimizer_w)
    total = hashes.size
    counts = _mate_counts(index, hashes, fwd)
    out = []
    for locus, c in counts.items():
        bw_c, fw_c, bw_r, fw_r = (int(x) for x in c)
        if fw_r >= bw_r:
            numer, denom = fw_r, total - fw_c
        else:
            numer, denom = bw_r, total - bw_c
        if numer < p.long_read_threshold(denom):
            continue
        if denom < p.stretch_minims or _has_matching_stretch(index, locus, hashes, fwd, p):
            out.append(locus)
    return sorted(out)


def _has_matching_stretch(index: TargetIndex, locus: int, hashes: np.ndarray,
                          fwd: np.ndarray, p: RecruitParams) -> bool:
    """Kadane max-subarray over minimizer hits (recruit.rs:940-964)."""
    found, start, end = index.lookup(hashes)
    s_fw = s_bw = 0
    target = p.stretch_score
    for t in range(hashes.size):
        if found[t]:
            info = 0
            for e in range(int(start[t]), int(end[t])):
                if int(index.entry_locus[e]) == locus:
                    info = int(index.entry_info[e])
                    break
            if info:
                x = SUBSUM_PENALTY + (SUBSUM_BONUS if info & RARE_BIT else 0)
                f = bool(fwd[t])
                if info & (DIR_FW if f else DIR_BW):
                    s_fw += x
                if info & (DIR_FW if not f else DIR_BW):
                    s_bw += x
        s_fw = max(s_fw - SUBSUM_PENALTY, 0)
        s_bw = max(s_bw - SUBSUM_PENALTY, 0)
        if s_fw >= target or s_bw >= target:
            return True
    return False


def recruit_any(index: TargetIndex, seq1: np.ndarray, seq2: np.ndarray | None) -> list[int]:
    """Dispatch on read shape (recruit.rs:580-607)."""
    if seq2 is not None:
        return recruit_read_pair(index, seq1, seq2)
    if seq1.size <= READ_LENGTH_THRESH:
        return recruit_short_read(index, seq1)
    return recruit_long_read(index, seq1)
