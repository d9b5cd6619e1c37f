"""Per-haplotype window characteristics as dense position arrays.

Counterpart of reference model/windows.rs (ContigInfo :343-424,
WeightCalculator :153-190, GenotypeWindows :710-806), restructured so that
everything the solver needs is a flat array gatherable on device:

* `gc_at[p]`    — GC bin (0..=100) of the neighbourhood whose window starts
  at position p (already shifted by the left padding, windows.rs:439-445);
* `weight_at[p]`— window weight = kmer-sigmoid × complexity-sigmoid
  (explicit BED weights multiply in when provided);
* the regular window grid (n_windows, reg_start, window_size) per contig.

Random window tweaks (assgn.rs:127-151, windows.rs:478-486) then become
device-side index arithmetic: a tweaked window start indexes `gc_at` /
`weight_at` directly.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..seq.compl import linguistic_complexity
from ..seq.contigs import ContigSet
from ..seq.counts import KmerCounts
from . import Params

UNMAPPED_WINDOW = 0
BOUNDARY_WINDOW = 1
REG_WINDOW_SHIFT = 2


def weight_calc(x: np.ndarray, breakpoint: float, power: float) -> np.ndarray:
    """Sigmoid weight: 1 / (1 + cf·((1−x)/x)^power), weight(bp) = 1/2
    (windows.rs:162-190)."""
    cf = (breakpoint / (1.0 - breakpoint)) ** power
    x = np.clip(np.asarray(x, dtype=np.float64), 1e-12, 1.0)
    ratio = np.clip((1.0 - x) / x, 0.0, None)
    return 1.0 / (1.0 + cf * np.power(ratio, power))


@dataclass
class ContigInfo:
    contig_len: int
    n_windows: int
    reg_start: int
    window_size: int
    neighb_size: int
    left_padding: int
    gc_at: np.ndarray          # uint8 [contig_len], indexed by window start
    weight_at: np.ndarray      # f32   [contig_len]

    @classmethod
    def new(cls, seq: np.ndarray, kmer_counts: np.ndarray, kmer_k: int,
            window_size: int, neighb_size: int, params: Params,
            explicit: "ExplicitWeights | None" = None,
            contig_name: str | None = None) -> "ContigInfo":
        contig_len = seq.size
        assert contig_len >= window_size + 2 * params.boundary_size, \
            f"Contig too short ({contig_len})"
        n_windows = (contig_len - 2 * params.boundary_size) // window_size
        sum_len = n_windows * window_size
        reg_start = (contig_len - sum_len) // 2
        left_padding = (neighb_size - window_size) // 2

        n_pos = contig_len - neighb_size + 1
        # GC% over every neighbourhood (windows.rs:387-391).
        is_gc = ((seq == 1) | (seq == 2)).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(is_gc)])
        gc = np.round(100.0 * (cum[neighb_size:] - cum[:-neighb_size]) / neighb_size)
        gc = gc.astype(np.uint8)

        # Unique k-mer fraction (count == 0) per neighbourhood (:393-403).
        span = neighb_size + 1 - kmer_k
        isu = (kmer_counts == 0).astype(np.int64)
        cumu = np.concatenate([[0], np.cumsum(isu)])
        nk = min(span, cumu.size - 1)
        uniq = (cumu[nk:nk + n_pos] - cumu[:n_pos]) / span

        # Linguistic complexity (:404-407).
        compl = linguistic_complexity(seq, params.complexity_k, neighb_size)
        compl = compl[:n_pos] if compl.size >= n_pos else np.pad(
            compl, (0, n_pos - compl.size), constant_values=np.nan)

        w = (weight_calc(uniq, params.kmers_weight_breakpoint,
                         params.kmers_weight_power)
             * weight_calc(np.nan_to_num(compl, nan=1.0),
                           params.compl_weight_breakpoint,
                           params.compl_weight_power))
        if explicit is not None and contig_name is not None:
            # Mean explicit weight over each neighbourhood multiplies in
            # (windows.rs:439-445 get_explicit path).
            per_bp = explicit.per_bp(contig_name, contig_len)
            cume = np.concatenate([[0.0], np.cumsum(per_bp)])
            mean_e = (cume[neighb_size:] - cume[:-neighb_size]) / neighb_size
            w = w * mean_e[:n_pos].astype(np.float64)

        # Expand to per-window-start indexing: neighb_info(start) reads
        # mov_info[max(start - left_padding, 0)] (windows.rs:439-445).
        idx = np.clip(np.arange(contig_len) - left_padding, 0, n_pos - 1)
        return cls(contig_len, int(n_windows), int(reg_start), window_size,
                   neighb_size, left_padding,
                   gc_at=gc[idx], weight_at=w[idx].astype(np.float32))

    def default_window_starts(self) -> np.ndarray:
        return self.reg_start + self.window_size * np.arange(self.n_windows)

    def window_of_middle(self, middles: np.ndarray) -> np.ndarray:
        """Static-grid window index per middle, BOUNDARY if outside, UNMAPPED
        for middle < 0 (windows.rs:465-470; shift added by the caller)."""
        middles = np.asarray(middles)
        w = (middles - self.reg_start) // self.window_size
        inside = (middles >= self.reg_start) & (w >= 0) & (w < self.n_windows)
        out = np.where(inside, w + REG_WINDOW_SHIFT, BOUNDARY_WINDOW)
        return np.where(middles < 0, UNMAPPED_WINDOW, out)


class ExplicitWeights:
    """Per-bp weights from a BED-like file `contig  start  end  weight`
    (reference ExplicitWeights, model/windows.rs:193-317; the reference
    stores u64 fixed-point cumsums — plain f64 cumsums here).  Positions not
    covered default to 1.0; overlapping intervals multiply."""

    def __init__(self, intervals: dict[str, list]):
        self.intervals = intervals       # name -> [(start, end, weight)]

    @classmethod
    def load(cls, path) -> "ExplicitWeights":
        from ..utils.io import smart_open
        out: dict[str, list] = {}
        with smart_open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith(("#", "track")):
                    continue
                cols = line.split()
                if len(cols) < 4:
                    raise ValueError(
                        f"{path}: weights BED needs 4 columns "
                        f"(contig start end weight), got {line!r}")
                w = float(cols[3])
                if not 0.0 <= w <= 1.0:
                    raise ValueError(
                        f"{path}: weight {w} out of [0, 1] on line {line!r}")
                out.setdefault(cols[0], []).append(
                    (int(cols[1]), int(cols[2]), w))
        return cls(out)

    def per_bp(self, name: str, length: int) -> np.ndarray:
        w = np.ones(length, np.float64)
        for start, end, weight in self.intervals.get(name, ()):
            w[max(start, 0):min(end, length)] *= weight
        return w


def build_contig_infos(contig_set: ContigSet, kmer_counts: KmerCounts,
                       window_size: int, neighb_size: int, params: Params,
                       explicit: ExplicitWeights | None = None) -> list[ContigInfo]:
    names = contig_set.contigs.names
    return [ContigInfo.new(seq, counts, kmer_counts.k, window_size,
                           neighb_size, params, explicit=explicit,
                           contig_name=names[i])
            for i, (seq, counts) in enumerate(zip(contig_set.seqs,
                                                  kmer_counts.counts))]


@dataclass
class ContigInfoPack:
    """Dense [H, ...] stacking of per-contig arrays for device gathers."""
    n_haps: int
    max_len: int
    max_windows: int
    n_windows: np.ndarray      # [H] int32
    reg_start: np.ndarray      # [H] int32
    contig_len: np.ndarray     # [H] int32
    window_size: int
    gc_at: np.ndarray          # [H, max_len] int32
    weight_at: np.ndarray      # [H, max_len] f32

    @classmethod
    def pack(cls, infos: list[ContigInfo]) -> "ContigInfoPack":
        H = len(infos)
        # Bucket shapes (len to 1024-multiples, windows to 32-multiples) so
        # solver compiles are shared across loci of similar size.
        max_len = -(-max(ci.contig_len for ci in infos) // 1024) * 1024
        gc = np.zeros((H, max_len), np.int32)
        wt = np.zeros((H, max_len), np.float32)
        for h, ci in enumerate(infos):
            gc[h, :ci.contig_len] = ci.gc_at
            wt[h, :ci.contig_len] = ci.weight_at
        return cls(
            n_haps=H, max_len=max_len,
            max_windows=-(-max(ci.n_windows for ci in infos) // 32) * 32,
            n_windows=np.array([ci.n_windows for ci in infos], np.int32),
            reg_start=np.array([ci.reg_start for ci in infos], np.int32),
            contig_len=np.array([ci.contig_len for ci in infos], np.int32),
            window_size=infos[0].window_size,
            gc_at=gc, weight_at=wt)
