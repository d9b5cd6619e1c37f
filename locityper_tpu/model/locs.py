"""Read × haplotype alignment likelihoods as dense tensors.

Counterpart of reference model/locs.rs, redesigned TPU-first (SURVEY.md §7):
instead of ingesting an external aligner's BAM and "transferring" alignments
between similar haplotypes (locs.rs:404-557, transfer.rs), every recruited
read is aligned directly against every candidate haplotype window on device:

  1. minimizer anchors vote on (haplotype, orientation, diagonal) candidates
     — the moral equivalent of strobealign seeding, batched over reads;
  2. one batched banded-DP call (ops/align.py) scores all candidates and
     yields op counts = error-profile ln-probability + edit distance;
  3. edit-distance thresholds mark reads poorly-mapped / downweight them
     (locs.rs:493-557); per-mate probabilities are normalized by the best
     (locs.rs:352-354); locus-unique k-mers set the read weight
     (locs.rs:905-993);
  4. mates are paired per haplotype with insert-size probabilities and
     unmapped fallbacks, keeping ≤10 within prob_diff (locs.rs:736-858).

The result is a ragged-but-padded candidate table per read pair, the input
to genotype assembly (model/assgn.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bg import BgDistr
from ..bg.err_prof import EditDistCache
from ..ops import align as A
from ..seq.contigs import ContigSet
from ..seq.counts import KmerCounts
from ..seq.kmers import canonical_kmers, minimizers32
from . import Params

MAX_UNUSED_ALNS = 2   # locs.rs:730
MAX_USED_ALNS = 10    # locs.rs:733


# ---------------------------------------------------------------------------
# Unique k-mer read weights (locs.rs:905-993)
# ---------------------------------------------------------------------------

class UniqueKmers:
    def __init__(self, contig_set: ContigSet, kmer_counts: KmerCounts,
                 hard_thresh: int, soft_thresh: int):
        self.k = kmer_counts.k
        uniq = []
        for seq, counts in zip(contig_set.seqs, kmer_counts.counts):
            km, _, valid = canonical_kmers(seq, self.k)
            uniq.append(km[valid & (counts == 0)])
        self.unique = np.unique(np.concatenate(uniq)) if uniq else np.empty(0, np.uint64)
        self.weight_mult = 1.0 / (soft_thresh + 1 - hard_thresh)
        self.weight_interc = (1.0 - hard_thresh) * self.weight_mult

    def count_read(self, codes: np.ndarray) -> int:
        """Non-overlapping unique k-mers in the read (locs.rs:958-992)."""
        from .. import native
        if native.available() and self.unique.size:
            return native.count_unique_nonoverlap(codes, self.k, self.unique)
        km, _, valid = canonical_kmers(codes, self.k)
        if km.size == 0 or self.unique.size == 0:
            return 0
        idx = np.searchsorted(self.unique, km)
        idx = np.minimum(idx, self.unique.size - 1)
        ismem = (self.unique[idx] == km) & valid
        count = 0
        t = 0
        n = km.size
        while t < n:
            if ismem[t]:
                count += 1
                t += self.k
            else:
                t += 1
        return count

    def count_batch(self, mates) -> np.ndarray:
        """`count_read` over a whole read list — one native call
        (amortizes the ctypes boundary; VERDICT r1 weak #1)."""
        from .. import native
        if native.available() and self.unique.size and mates:
            return native.count_unique_nonoverlap_batch(mates, self.k,
                                                        self.unique)
        return np.fromiter((self.count_read(m) for m in mates), np.int64,
                           len(mates))

    def pair_weight(self, count: int) -> float:
        return float(np.clip(self.weight_interc + count * self.weight_mult, 0.0, 1.0))


# ---------------------------------------------------------------------------
# Candidate generation: minimizer anchors -> (hap, orient, diagonal)
# ---------------------------------------------------------------------------

class HapMinimizerIndex:
    """Minimizer hash → sorted (hap, pos, fwd) anchor table over the panel."""

    def __init__(self, contig_set: ContigSet, k: int, w: int):
        self.k = k
        keys, haps, poss, fwds = [], [], [], []
        for hap_ix, seq in enumerate(contig_set.seqs):
            pos, vals, fwd = minimizers32(seq, k, w)
            keys.append(vals)
            haps.append(np.full(pos.size, hap_ix, np.int32))
            poss.append(pos.astype(np.int32))
            fwds.append(fwd)
        kk = np.concatenate(keys) if keys else np.empty(0, np.uint32)
        order = np.argsort(kk, kind="stable")
        self.keys = kk[order]
        self.hap = np.concatenate(haps)[order] if keys else np.empty(0, np.int32)
        self.pos = np.concatenate(poss)[order] if keys else np.empty(0, np.int32)
        self.fwd = np.concatenate(fwds)[order] if keys else np.empty(0, bool)
        self.n_haps = len(contig_set.seqs)

    def candidates(self, codes: np.ndarray, w: int, band: int,
                   min_votes: int, max_per_hap: int):
        """Returns list of (hap, orient, diag) candidates for one read.
        orient 0 = forward read, 1 = reverse-complement; diag = approximate
        alignment start of the (oriented) read on the haplotype."""
        pos, vals, fwd = minimizers32(codes, self.k, w)
        if pos.size == 0:
            return []
        lo = np.searchsorted(self.keys, vals, side="left")
        hi = np.searchsorted(self.keys, vals, side="right")
        rlen = codes.size
        out = {}
        for t in range(pos.size):
            for e in range(int(lo[t]), int(hi[t])):
                hp = int(self.hap[e])
                same = bool(self.fwd[e]) == bool(fwd[t])
                if same:
                    orient, diag = 0, int(self.pos[e]) - int(pos[t])
                else:
                    # rc-read position of this k-mer: rlen - k - pos.
                    orient, diag = 1, int(self.pos[e]) - (rlen - self.k - int(pos[t]))
                bucket = diag // max(band // 2, 1)
                key = (hp, orient, bucket)
                if key in out:
                    votes, dsum = out[key]
                    out[key] = (votes + 1, dsum + diag)
                else:
                    out[key] = (1, diag)
        # Merge buckets into per-(hap, orient) top candidates.
        best: dict[tuple, list] = {}
        for (hp, orient, _), (votes, dsum) in out.items():
            if votes < min_votes:
                continue
            best.setdefault((hp, orient), []).append((votes, dsum / votes))
        cands = []
        for (hp, orient), lst in best.items():
            lst.sort(reverse=True)
            for votes, diag in lst[:max_per_hap]:
                cands.append((hp, orient, int(round(diag))))
        return cands

    def candidates_batch(self, mates, w: int, band: int, min_votes: int,
                         max_per_hap: int):
        """List-of-lists wrapper around `candidates_batch_flat` (kept for
        the bg-estimation path and tests)."""
        jm, jh, jo, jd = self.candidates_batch_flat(mates, w, band,
                                                    min_votes, max_per_hap)
        out = [[] for _ in mates]
        for t in range(jm.size):
            out[int(jm[t])].append((int(jh[t]), int(jo[t]), int(jd[t])))
        return out

    def candidates_batch_flat(self, mates, w: int, band: int, min_votes: int,
                              max_per_hap: int):
        """Vectorized `candidates` over a list of reads: one numpy pass of
        lookup + bucket voting + per-(read,hap,orient) top-N for the whole
        batch.  Returns flat int64 arrays (mate_ix, hap, orient, diag),
        grouped by mate."""
        empty = (np.empty(0, np.int64),) * 4
        if self.keys.size == 0:
            return empty
        from .. import native
        if native.available():
            read_ix, pos, vals, fwd = native.minimizers32_batch(
                mates, self.k, w)
            if read_ix.size == 0:
                return empty
            # Full native path: lookup + voting + top-N in C++ (threaded),
            # bit-identical to the numpy grouping below (tests guard).
            rlens_per = np.fromiter((m.size for m in mates), np.int64,
                                    len(mates))
            return native.anchor_votes(
                read_ix, pos, vals, fwd, rlens_per, self.keys, self.hap,
                self.pos, self.fwd, self.k, max(band // 2, 1), min_votes,
                max_per_hap)
        m_read, m_pos, m_hash, m_fwd = [], [], [], []
        for ix, codes in enumerate(mates):
            p_, v_, f_ = minimizers32(codes, self.k, w)
            m_read.append(np.full(p_.size, ix, np.int64))
            m_pos.append(p_)
            m_hash.append(v_)
            m_fwd.append(f_)
        if not m_read:
            return empty
        read_ix = np.concatenate(m_read)
        pos = np.concatenate(m_pos)
        vals = np.concatenate(m_hash)
        fwd = np.concatenate(m_fwd)
        if read_ix.size == 0:
            return empty
        rlens_per = np.array([m.size for m in mates], np.int64)
        rlen = rlens_per[read_ix]

        lo = np.searchsorted(self.keys, vals, side="left")
        hi = np.searchsorted(self.keys, vals, side="right")
        counts = hi - lo
        nz = counts > 0
        if not np.any(nz):
            return empty
        # Expand each minimizer's entry span.
        reps = counts[nz]
        src = np.repeat(np.nonzero(nz)[0], reps)
        offset_in = np.arange(reps.sum()) - np.repeat(
            np.cumsum(reps) - reps, reps)
        e_ix = lo[nz].repeat(reps) + offset_in
        hp = self.hap[e_ix].astype(np.int64)
        same = self.fwd[e_ix] == fwd[src]
        diag_fw = self.pos[e_ix].astype(np.int64) - pos[src]
        diag_rv = self.pos[e_ix].astype(np.int64) - (rlen[src] - self.k - pos[src])
        orient = (~same).astype(np.int64)
        diag = np.where(same, diag_fw, diag_rv)
        bstep = max(band // 2, 1)
        bucket = diag // bstep

        # Group by (read, hap, orient, bucket): lexsort + run-length.
        key_r = read_ix[src]
        order = np.lexsort((bucket, orient, hp, key_r))
        kr, kh, ko, kb, kd = (key_r[order], hp[order], orient[order],
                              bucket[order], diag[order])
        newgrp = np.ones(kr.size, bool)
        newgrp[1:] = ((kr[1:] != kr[:-1]) | (kh[1:] != kh[:-1])
                      | (ko[1:] != ko[:-1]) | (kb[1:] != kb[:-1]))
        starts = np.nonzero(newgrp)[0]
        ends = np.concatenate([starts[1:], [kr.size]])
        votes = ends - starts
        dsum = np.add.reduceat(kd, starts)
        keep = votes >= min_votes
        g_read = kr[starts][keep]
        g_hap = kh[starts][keep]
        g_orient = ko[starts][keep]
        g_votes = votes[keep]
        g_diag = np.round(dsum[keep] / g_votes).astype(np.int64)

        if g_read.size == 0:
            return empty
        # Top-N buckets per (read, hap, orient): sort by votes desc within
        # groups, rank by run-length position, keep rank < max_per_hap.
        order2 = np.lexsort((-g_votes, g_orient, g_hap, g_read))
        sr, sh, so, sd = (g_read[order2], g_hap[order2], g_orient[order2],
                          g_diag[order2])
        new2 = np.ones(sr.size, bool)
        new2[1:] = ((sr[1:] != sr[:-1]) | (sh[1:] != sh[:-1])
                    | (so[1:] != so[:-1]))
        grp_start = np.nonzero(new2)[0]
        rank = np.arange(sr.size) - np.repeat(
            grp_start, np.diff(np.concatenate([grp_start, [sr.size]])))
        sel = rank < max_per_hap
        return sr[sel], sh[sel], so[sel], sd[sel]



# ---------------------------------------------------------------------------
# Alignment records and pairing
# ---------------------------------------------------------------------------

@dataclass
class MateAln:
    hap: int
    start: int
    end: int
    fwd: bool          # True if the read aligned forward
    ln_prob: float
    edit: int
    n_mism: int = 0
    n_ins: int = 0
    n_del: int = 0
    n_clip: int = 0
    ws: int = 0        # window start used by the banded DP (for traceback)

    @property
    def middle(self) -> int:
        return (self.start + self.end) // 2


@dataclass
class PairCand:
    """One candidate location of a read pair (PairAlignment, locs.rs:658-725)."""
    hap: int
    ln_prob: float
    middle1: int       # -1 = mate unmapped
    middle2: int
    aln1: object = None    # MateAln of mate 1 (None = unmapped)
    aln2: object = None


@dataclass
class ReadAlns:
    """All candidate locations for one read pair (GrouppedAlignments)."""
    name: str
    weight: float
    unmapped_prob: float
    cands: list        # list[PairCand], sorted by hap then desc prob
    read_ix: int = -1  # index into the original read_pairs list

    def best_at_hap(self, hap: int, default: float) -> float:
        best = default
        for c in self.cands:
            if c.hap == hap:
                best = max(best, c.ln_prob)
        return best


@dataclass
class MateAlnTable:
    """Flat candidate mate-alignment arrays — one row per (mate, candidate
    window) alignment, straight off the batched device kernel.  The array
    twin of `list[list[MateAln]]` (VERDICT r1 weak #1: no per-read Python
    in the hot path)."""
    mate: np.ndarray     # int64 [A] global mate index
    hap: np.ndarray      # int64
    start: np.ndarray    # int64 hap coordinate of the alignment start
    end: np.ndarray      # int64
    fwd: np.ndarray      # bool — True if the read aligned forward
    prob: np.ndarray     # float64 ln-probability
    edit: np.ndarray     # int64 edit distance
    n_mism: np.ndarray
    n_ins: np.ndarray
    n_del: np.ndarray
    n_clip: np.ndarray
    ws: np.ndarray       # int64 DP window start (for traceback replay)

    _FIELDS = ("mate", "hap", "start", "end", "fwd", "prob", "edit",
               "n_mism", "n_ins", "n_del", "n_clip", "ws")

    @classmethod
    def empty(cls) -> "MateAlnTable":
        z = np.empty(0, np.int64)
        return cls(z, z, z, z, np.empty(0, bool), np.empty(0, np.float64),
                   z, z, z, z, z, z)

    @classmethod
    def concat(cls, tables) -> "MateAlnTable":
        tables = list(tables)
        if not tables:
            return cls.empty()
        return cls(*(np.concatenate([getattr(t, f) for t in tables])
                     for f in cls._FIELDS))

    def select(self, idx) -> "MateAlnTable":
        return MateAlnTable(*(getattr(self, f)[idx] for f in self._FIELDS))

    def __len__(self) -> int:
        return self.mate.size

    def row_obj(self, i: int) -> MateAln:
        return MateAln(hap=int(self.hap[i]), start=int(self.start[i]),
                       end=int(self.end[i]), fwd=bool(self.fwd[i]),
                       ln_prob=float(self.prob[i]), edit=int(self.edit[i]),
                       n_mism=int(self.n_mism[i]), n_ins=int(self.n_ins[i]),
                       n_del=int(self.n_del[i]), n_clip=int(self.n_clip[i]),
                       ws=int(self.ws[i]))

    def to_lists(self, n_mates: int) -> list:
        """Per-mate `list[MateAln]` view (bg-estimation path + oracle)."""
        out = [[] for _ in range(n_mates)]
        for i in range(len(self)):
            out[int(self.mate[i])].append(self.row_obj(i))
        return out

    @property
    def middle(self) -> np.ndarray:
        return (self.start + self.end) // 2


def _padded_mate_matrices(mates, L):
    """[M, L] forward and reverse-complement code matrices (pad code 4),
    built with flat-mask assignment + a vectorized reverse gather — no
    per-read Python."""
    M = len(mates)
    lens = np.fromiter((m.size for m in mates), np.int64, M)
    fwd = np.full((M, L), 4, np.int8)
    mask = np.arange(L)[None, :] < lens[:, None]
    fwd[mask] = np.concatenate(mates) if M else np.empty(0, np.int8)
    comp = np.where(fwd < 4, 3 - fwd, 4).astype(np.int8)
    j = np.arange(L)[None, :]
    src = lens[:, None] - 1 - j
    rc = np.where(src >= 0,
                  comp[np.arange(M)[:, None], np.clip(src, 0, max(L - 1, 0))],
                  np.int8(4))
    return fwd, rc.astype(np.int8), lens


def _prepare_align_jobs(mates, jobs, contig_set, band, L: int | None = None):
    """Assembles the UNPADDED job arrays for `_align_candidates`:
    (reads [J, L], lens [J], wins [J, L+band], meta).  `L` may be forced
    larger (multi-locus batching pads every locus to the panel bucket —
    safe: the kernel never reads past lens[i] + band)."""
    jm, jh, jo, jd = (np.asarray(a, np.int64) for a in jobs)
    max_read = max(m.size for m in mates)
    L = L or (-(-max_read // 64) * 64)
    fwd_mat, rc_mat, all_lens = _padded_mate_matrices(mates, L)
    W = L + band
    all_ws = jd - band // 2
    # Window gather grouped per haplotype (extract_windows is vectorized).
    all_wins = np.full((jm.size, W), 4, np.int8)
    for hp in np.unique(jh):
        rows = np.nonzero(jh == hp)[0]
        all_wins[rows] = A.extract_windows(contig_set.seqs[hp], all_ws[rows], W)
    reads = np.where(jo[:, None] == 1, rc_mat[jm], fwd_mat[jm])
    lens = all_lens[jm].astype(np.int32)
    meta = (jm, jh, jo, all_ws)
    return reads, lens, all_wins, meta


def run_align_batches(reads, lens, wins, score_vec, band,
                      batch: int | None = None, mesh=None) -> dict:
    """Streams [J, L] job arrays through the device kernel in pow2-bucketed
    batches; one blocking sync at the end (dispatches overlap).  With
    `mesh`, each batch is read-sharded (parallel/mesh.py:sharded_align) —
    the reference's alignment worker pool (locs.rs:1120-1146).

    Default batch scales inversely with L (~1.5M read bases per dispatch):
    short reads go 8192/dispatch — dispatch round-trips, not the kernel,
    dominate on relay-attached chips (BENCH_NOTES round 2)."""
    return collect_align_batches(
        dispatch_align_batches(reads, lens, wins, score_vec, band,
                               batch=batch, mesh=mesh))


def dispatch_align_batches(reads, lens, wins, score_vec, band,
                           batch: int | None = None, mesh=None) -> list:
    """Dispatch half of `run_align_batches`: queues every batch on the
    device with async result prefetch and returns the pending list without
    blocking — callers may overlap host work (candidate voting of the next
    locus group, post-alignment of the previous) with the device leg
    (VERDICT r4 weak item 4)."""
    J = reads.shape[0]
    if batch is None:
        L = max(int(reads.shape[1]), 1)
        # ~6 M read bases per dispatch.  Each dispatch pays a flat ~35 ms
        # relay round trip regardless of size (round-5 A/B: 830k
        # 192-base jobs ran at 215k jobs/s purely dispatch-bound at the
        # old 8192 cap), so short-read batches go big; H2D stays small
        # via the 4-bit packed combined upload.
        batch = max(512, min(32768, 1 << ((6 << 20) // L).bit_length() - 1))
    pending = []
    for s in range(0, J, batch):
        sl = slice(s, min(s + batch, J))
        n = sl.stop - sl.start
        # Bucket N to powers of two (>=256) to bound distinct compile shapes.
        N = 256
        while N < n:
            N *= 2
        r = np.full((N, reads.shape[1]), 4, np.int8)
        r[:n] = reads[sl]
        ln = np.zeros(N, np.int32)
        ln[:n] = lens[sl]
        w = np.full((N, wins.shape[1]), 4, np.int8)
        w[:n] = wins[sl]
        if mesh is not None:
            from ..parallel.mesh import sharded_align
            res = sharded_align(mesh, r, ln, w, score_vec, band=band)
            pending.append((res, n, False))
        else:
            import jax
            # Combined 4-bit-packed upload (reads + windows + lens in ONE
            # device_put at ~half the bytes) and an async prefetch of the
            # packed [8, N] result: H2D/D2H during sustained kernel
            # activity run at relay-queueing speed, so both bytes and
            # per-fetch round-trips dominate the dispatch leg
            # (BENCH_NOTES round 4, extra/profile_packed_h2d.py).
            if r.shape[1] % 8 == 0 and w.shape[1] % 8 == 0:
                comb = _pack_align_jobs_host(r, ln, w)
                res = A.align_batch_packed(jax.device_put(comb), score_vec,
                                           L=int(r.shape[1]),
                                           W=int(w.shape[1]), band=band)
            else:                       # odd band width: plain uploads
                res = _pack_align_results(
                    A.align_batch_auto(jax.device_put(r),
                                       jax.device_put(ln),
                                       jax.device_put(w), score_vec,
                                       band=band))
            res.copy_to_host_async()
            pending.append((res, n, True))
    return pending


def collect_align_batches(pending: list) -> dict:
    """Fetch half of `run_align_batches`: blocks on the async results."""
    out: dict = {}
    for res, n, is_packed in pending:
        if is_packed:
            res = _unpack_align_results(np.asarray(res))
        for k, v in res.items():
            out.setdefault(k, []).append(np.asarray(v)[:n])
    return {k: np.concatenate(v) for k, v in out.items()}


def _pack_align_jobs_host(r, ln, w) -> np.ndarray:
    """[N, L/8 + W/8 + 1] uint32 combined upload buffer for
    ops.align.align_batch_packed: 4-bit read nibbles, window nibbles,
    then the read length (native pack; numpy fallback)."""
    N, L = r.shape
    W = w.shape[1]
    rw, ww = L // 8, W // 8
    comb = np.empty((N, rw + ww + 1), np.uint32)
    from .. import native
    if native.available():
        native.pack_codes4_strided(r, comb, 0)
        native.pack_codes4_strided(w, comb, rw)
    else:
        def nib(m):
            b = (m[:, 0::2] | (m[:, 1::2] << 4)).astype(np.uint8)
            return np.ascontiguousarray(b).view(np.uint32)
        comb[:, :rw] = nib(r)
        comb[:, rw:rw + ww] = nib(w)
    comb[:, rw + ww] = ln.astype(np.uint32)
    return comb


_ALIGN_KEYS = A.ALIGN_RESULT_KEYS      # packed [8, N] result row order


def _pack_align_results(res: dict):
    """[8, N] int32 device view of the aligner outputs (score bitcast)."""
    import jax
    import jax.numpy as jnp
    rows = []
    for k in _ALIGN_KEYS:
        v = res[k]
        if v.dtype == jnp.float32:
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        else:
            v = v.astype(jnp.int32)
        rows.append(v)
    return jnp.stack(rows)


def _unpack_align_results(arr: np.ndarray) -> dict:
    out = {}
    for i, k in enumerate(_ALIGN_KEYS):
        v = arr[i]
        if k == "score":
            v = v.view(np.float32)
        elif k == "valid":
            v = v.astype(bool)
        out[k] = v
    return out


def _finish_align(res: dict, meta, lens) -> MateAlnTable:
    """Turns flat kernel outputs + job meta into a MateAlnTable."""
    jm, jh, jo, all_ws = meta
    edit, _ = A.edit_and_matches(res, lens)
    return MateAlnTable(
        mate=jm, hap=jh,
        start=all_ws + res["start_p"].astype(np.int64),
        end=all_ws + res["end_p"].astype(np.int64),
        fwd=jo == 0,
        prob=res["score"].astype(np.float64),
        edit=edit.astype(np.int64),
        n_mism=res["n_mism"].astype(np.int64),
        n_ins=res["n_ins"].astype(np.int64),
        n_del=res["n_del"].astype(np.int64),
        n_clip=res["n_clip"].astype(np.int64),
        ws=all_ws.copy())


def _align_candidates(mates, jobs, contig_set, score_vec, band,
                      batch=2048, mesh=None) -> MateAlnTable:
    """Aligns every (mate, candidate) job on device; returns a flat
    MateAlnTable in job order.

    mates: list of code arrays; jobs: flat arrays (mate_ix, hap, orient,
    diag) from `candidates_batch_flat`.  Batch assembly and result
    collection are fully vectorized."""
    if np.asarray(jobs[0]).size == 0:
        return MateAlnTable.empty()
    reads, lens, wins, meta = _prepare_align_jobs(mates, jobs, contig_set,
                                                  band)
    res = run_align_batches(reads, lens, wins, score_vec, band, batch=batch,
                            mesh=mesh)
    return _finish_align(res, meta, lens)


# ---------------------------------------------------------------------------
# Object-path helpers (oracle for the vectorized pipeline; also used by the
# bg-estimation path).  Semantics: locs.rs:736-901.
# ---------------------------------------------------------------------------

def _neighb_complexity_arrays(contig_set, k: int, neighb: int):
    """Per-haplotype moving-window linguistic complexity (the reference's
    ContigInfo mov_info, windows.rs:404-407) for the low-complexity
    edit-threshold relaxation."""
    from ..seq.compl import linguistic_complexity
    return [linguistic_complexity(s, k, neighb) for s in contig_set.seqs]


def _neighb_complexity_at(compl_arr, middle: int, neighb: int) -> float:
    """complexity of the neighbourhood around `middle`
    (windows.rs:449-452)."""
    if compl_arr.size == 0:
        return 1.0
    i = min(max(middle - neighb // 2, 0), compl_arr.size - 1)
    v = float(compl_arr[i])
    return 1.0 if np.isnan(v) else v


def _dedup_mate_alns(alns: list) -> list:
    """Keeps the best alignment per (hap, ~128bp start bin)
    (PosCollection, locs.rs:174-263)."""
    best = {}
    for a in alns:
        key = (a.hap, a.start >> 7)
        b = best.get(key)
        if b is None or a.ln_prob > b.ln_prob:
            best[key] = a
    return list(best.values())


def _pair_candidates(alns1, alns2, n_haps, insert_distr, params, weight):
    """identify_contig_pair_alns (locs.rs:736-789) for all haplotypes."""
    insert_penalty = insert_distr.insert_penalty
    unm_ins_penalty = params.unmapped_penalty + insert_penalty
    max_alns = MAX_USED_ALNS if weight >= params.min_weight else MAX_UNUSED_ALNS
    cands = []
    for hp in range(n_haps):
        a1 = [a for a in alns1 if a.hap == hp]
        a2 = [a for a in alns2 if a.hap == hp]
        if not a1 and not a2:
            continue
        local = []
        max1 = np.full(len(a1), -np.inf)
        max2 = np.full(len(a2), -np.inf)
        if a1 and a2:
            # Vectorized cross product (the reference's nested loop,
            # locs.rs:752-767): opposite orientations, insert-size prob.
            f1 = np.fromiter((a.fwd for a in a1), bool, len(a1))
            s1 = np.fromiter((a.start for a in a1), np.int64, len(a1))
            e1 = np.fromiter((a.end for a in a1), np.int64, len(a1))
            p1 = np.fromiter((a.ln_prob for a in a1), np.float64, len(a1))
            f2 = np.fromiter((a.fwd for a in a2), bool, len(a2))
            s2 = np.fromiter((a.start for a in a2), np.int64, len(a2))
            e2 = np.fromiter((a.end for a in a2), np.int64, len(a2))
            p2 = np.fromiter((a.ln_prob for a in a2), np.float64, len(a2))
            opp = f1[:, None] != f2[None, :]
            ins = (np.maximum(e1[:, None], e2[None, :])
                   - np.minimum(s1[:, None], s2[None, :]))
            p = p1[:, None] + p2[None, :] + insert_distr.ln_prob(
                ins.ravel()).reshape(ins.shape)
            ok = opp & np.isfinite(p)
            pm = np.where(ok, p, -np.inf)
            max1 = pm.max(axis=1, initial=-np.inf)
            max2 = pm.max(axis=0, initial=-np.inf)
            for xi, yi in zip(*np.nonzero(ok)):
                x, y = a1[xi], a2[yi]
                local.append(PairCand(hp, float(p[xi, yi]), x.middle,
                                      y.middle, x, y))
        for xi, x in enumerate(a1):
            alone = x.ln_prob + unm_ins_penalty
            if alone >= max1[xi]:
                local.append(PairCand(hp, alone, x.middle, -1, x, None))
        for yi, y in enumerate(a2):
            alone = y.ln_prob + unm_ins_penalty
            if alone >= max2[yi]:
                local.append(PairCand(hp, alone, -1, y.middle, None, y))
        local.sort(key=lambda c: -c.ln_prob)
        thresh = local[0].ln_prob - params.prob_diff
        kept = [c for c in local[:max_alns] if c.ln_prob >= thresh]
        cands.extend(kept)
    return cands


def _single_candidates(alns1, n_haps, params, weight):
    """identify_single_end_alignments (locs.rs:863-901)."""
    max_alns = MAX_USED_ALNS if weight >= params.min_weight else MAX_UNUSED_ALNS
    cands = []
    for hp in range(n_haps):
        a1 = sorted((a for a in alns1 if a.hap == hp), key=lambda a: -a.ln_prob)
        if not a1:
            continue
        thresh = a1[0].ln_prob - params.prob_diff
        for a in a1[:max_alns]:
            if a.ln_prob >= thresh:
                cands.append(PairCand(hp, a.ln_prob, a.middle, -1, a, None))
    return cands


# ---------------------------------------------------------------------------
# Array-native result container
# ---------------------------------------------------------------------------

class AllAlignments:
    """Array-native candidate store for one locus (read × hap × location).

    The hot path (tensor build, stage-0 filter) reads the flat arrays;
    `reads`/`unused_reads` materialize the ReadAlns/PairCand/MateAln object
    view lazily for SAM and debug output (model/sam.py, --debug CSVs).

    Candidate arrays are grouped by used-read index, then hap asc, then
    weighted ln-prob desc — exactly the slot order LocusTensors expects.
    """

    def __init__(self, *, n_haps, table, read_ix, names, weights, unmapped,
                 c_read, c_hap, c_prob, c_mid1, c_mid2, c_a1, c_a2, used_mask):
        self.n_haps = n_haps
        self.table = table              # MateAlnTable (deduped + filtered)
        self.read_ix = read_ix          # [S] original read index (survivors)
        self.names = names              # list[str] per survivor
        self.weights = weights          # [S] float
        self.unmapped = unmapped        # [S] float (weighted unmapped prob)
        self.c_read = c_read            # [C] survivor index
        self.c_hap = c_hap
        self.c_prob = c_prob            # weighted pair ln-prob
        self.c_mid1 = c_mid1
        self.c_mid2 = c_mid2
        self.c_a1 = c_a1                # row into `table`, -1 = unmapped mate
        self.c_a2 = c_a2
        self.used_mask = used_mask      # [S] bool: weight >= min_weight
        self._objs = None

    # -- hot-path views ----------------------------------------------------
    @property
    def n_used(self) -> int:
        return int(self.used_mask.sum())

    @property
    def names_used(self) -> list:
        return [n for n, u in zip(self.names, self.used_mask) if u]

    @property
    def weights_used(self) -> np.ndarray:
        return self.weights[self.used_mask]

    def used_candidates(self):
        """(c_read_remapped, c_hap, c_prob, c_mid1, c_mid2) over used reads,
        with read indices renumbered 0..n_used-1."""
        pos = np.cumsum(self.used_mask) - 1       # survivor -> used position
        keep = self.used_mask[self.c_read]
        return (pos[self.c_read[keep]], self.c_hap[keep], self.c_prob[keep],
                self.c_mid1[keep], self.c_mid2[keep])

    def best_aln_matrix(self) -> np.ndarray:
        """[n_haps, n_used] best weighted ln-prob per hap, defaulting to the
        read's unmapped prob (locs.rs:1177-1186)."""
        cr, ch, cp, _, _ = self.used_candidates()
        out = np.tile(self.unmapped[self.used_mask], (self.n_haps, 1))
        if cr.size:
            np.maximum.at(out, (ch, cr), cp)
        return out

    # -- lazy object view --------------------------------------------------
    def _build_objects(self):
        if self._objs is not None:
            return self._objs
        row_cache: dict = {}

        def row_obj(i):
            if i < 0:
                return None
            o = row_cache.get(i)
            if o is None:
                o = self.table.row_obj(i)
                row_cache[i] = o
            return o

        reads, unused = [], []
        S = len(self.names)
        bounds = np.searchsorted(self.c_read, np.arange(S + 1))
        for s in range(S):
            cands = [PairCand(int(self.c_hap[i]), float(self.c_prob[i]),
                              int(self.c_mid1[i]), int(self.c_mid2[i]),
                              row_obj(int(self.c_a1[i])),
                              row_obj(int(self.c_a2[i])))
                     for i in range(bounds[s], bounds[s + 1])]
            ra = ReadAlns(self.names[s], float(self.weights[s]),
                          float(self.unmapped[s]), cands,
                          read_ix=int(self.read_ix[s]))
            (reads if self.used_mask[s] else unused).append(ra)
        self._objs = (reads, unused)
        return self._objs

    @property
    def reads(self) -> list:
        return self._build_objects()[0]

    @property
    def unused_reads(self) -> list:
        return self._build_objects()[1]


def build_all_alignments(read_pairs, names, contig_set: ContigSet,
                         kmer_counts: KmerCounts, bg: BgDistr,
                         edit_cache: EditDistCache, params: Params,
                         minimizer_k: int = 15, minimizer_w: int = 10,
                         mesh=None, explicit_weights=None):
    """The full locs pipeline, fully vectorized: candidates → device
    alignment → dedup → edit/bounds filters → weights → pairing →
    per-(read,hap) top-K.  `read_pairs`: list of (codes1, codes2|None).

    explicit_weights: optional model.windows.ExplicitWeights — alignment
    ln-probs are then recomputed per-op with region weights
    (windows.rs:508-575 / err_prof.rs:225-266; the CIGARs come from the
    host traceback kernel replayed at the stored DP windows).

    Semantics are bit-identical to `build_all_alignments_obj` (the readable
    per-read oracle below; guarded by tests/test_locs_parity.py)."""
    gen = _build_all_alignments_gen(read_pairs, names, contig_set,
                                    kmer_counts, bg, edit_cache, params,
                                    minimizer_k, minimizer_w,
                                    explicit_weights=explicit_weights)
    req = next(gen)
    res = None
    if req is not None:
        reads, lens, wins, score_vec, band = req
        res = run_align_batches(reads, lens, wins, score_vec, band,
                                mesh=mesh)
    return gen.send(res)


def build_all_alignments_panel(panel, bg: BgDistr, edit_cache: EditDistCache,
                               params: Params, minimizer_k: int = 15,
                               minimizer_w: int = 10, mesh=None,
                               group_size: int | None = None):
    """Multi-locus device batching: candidate alignment jobs run as a
    global device stream (shared [*, L] bucket), amortizing dispatch
    latency across the panel.  Results are identical to per-locus
    `build_all_alignments` (tests/test_panel.py).

    The panel is processed in GROUPS of `group_size` loci through a
    3-stage pipeline (VERDICT r4 weak item 4 — host legs were ~half the
    align wall): a worker thread runs candidate voting for group i+1
    while the main thread dispatches group i's device batches (async)
    and digests group i-1's results — the host cand/post phases hide
    behind the device leg instead of serializing with it.  Per-locus
    results are order-independent, so grouping cannot change them.

    panel: list of (read_pairs, names, contig_set, kmer_counts) tuples,
    optionally with a 5th element (ExplicitWeights | None — per-locus
    region-weighted alignment probs, windows.rs:508-575).
    Returns list of (AllAlignments, stats) in panel order.
    """
    from concurrent.futures import ThreadPoolExecutor

    if group_size is None:
        # >= 3 groups whenever the panel allows it, so the pipeline's
        # overlap actually engages on small panels too (a 5-locus HLA
        # panel was one group = fully serial host legs), capped at 16 so
        # large panels still amortize dispatch batches.
        group_size = max(1, min(16, -(-len(panel) // 3)))

    max_read = max((m.size for item in panel for pair in item[0]
                    for m in pair if m is not None), default=64)
    L = -(-max_read // 64) * 64

    def cand_group(idxs):
        """Host stage 1: build generators + candidate voting (to the first
        yield) for one locus group."""
        gens, reqs = [], []
        for i in idxs:
            read_pairs, names, contig_set, kmer_counts = panel[i][:4]
            ew = panel[i][4] if len(panel[i]) > 4 else None
            g = _build_all_alignments_gen(
                read_pairs, names, contig_set, kmer_counts, bg, edit_cache,
                params, minimizer_k, minimizer_w, panel_L=L,
                explicit_weights=ew)
            reqs.append(next(g))
            gens.append(g)
        return idxs, gens, reqs

    def dispatch_group(reqs):
        """Device stage: one async dispatch of the group's concatenated
        jobs; returns (pending, live, sizes)."""
        live = [j for j, r in enumerate(reqs) if r is not None]
        if not live:
            return None, live, []
        score_vec, band = reqs[live[0]][3], reqs[live[0]][4]
        cat_reads = np.concatenate([reqs[j][0] for j in live])
        cat_lens = np.concatenate([reqs[j][1] for j in live])
        cat_wins = np.concatenate([reqs[j][2] for j in live])
        pending = dispatch_align_batches(cat_reads, cat_lens, cat_wins,
                                         score_vec, band, mesh=mesh)
        return pending, live, [reqs[j][0].shape[0] for j in live]

    out = [None] * len(panel)

    def finalize_group(idxs, gens, pending, live, sizes):
        """Host stage 3: fetch the group's results and run per-locus
        post-alignment."""
        results = [None] * len(gens)
        if pending is not None:
            res = collect_align_batches(pending)
            off = 0
            for j, n in zip(live, sizes):
                results[j] = {k: v[off:off + n] for k, v in res.items()}
                off += n
        for j, g in enumerate(gens):
            out[idxs[j]] = g.send(results[j])

    groups = [list(range(s, min(s + group_size, len(panel))))
              for s in range(0, len(panel), group_size)]
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(cand_group, groups[0])
        prev = None
        for gi in range(len(groups)):
            idxs, gens, reqs = fut.result()
            if gi + 1 < len(groups):
                fut = pool.submit(cand_group, groups[gi + 1])
            pending, live, sizes = dispatch_group(reqs)
            if prev is not None:
                finalize_group(*prev)
            prev = (idxs, gens, pending, live, sizes)
        finalize_group(*prev)
    return out


def _reweight_aln_probs(tbl, mates, contig_set, err_prof, explicit_weights,
                        score_vec, band: int) -> None:
    """Recomputes tbl.prob in place with region-weight-aware per-op
    probabilities (windows.rs:508-575 weighted_aln_prob; the reference
    applies it to every stored alignment when `--reg-weights` is given).
    CIGARs are replayed by the host traceback kernel at the stored DP
    windows — the exact DP the scoring kernel ran."""
    from ..ops import align as A
    from ..ops import traceback as T
    from ..seq import dna

    names = contig_set.contigs.names
    w_arrs = {}
    for i in range(len(tbl)):
        h = int(tbl.hap[i])
        hap_seq = contig_set.seqs[h]
        if h not in w_arrs:
            w_arrs[h] = explicit_weights.per_bp(names[h], hap_seq.size)
        codes = mates[int(tbl.mate[i])]
        oriented = codes if tbl.fwd[i] else dna.revcomp(codes)
        ws = int(tbl.ws[i])
        win = A.extract_windows(hap_seq, np.array([ws]),
                                oriented.size + band)[0]
        out = T.align_cigar(oriented, win, band, score_vec)
        if out is None:
            continue
        ops, lens, info, _ = out
        prob, _edit, _ = err_prof.weighted_aln_ln_prob(
            ops, lens, ws + int(info[0]), ws + int(info[1]), w_arrs[h],
            hap_seq.size)
        tbl.prob[i] = prob


def _build_all_alignments_gen(read_pairs, names, contig_set: ContigSet,
                              kmer_counts: KmerCounts, bg: BgDistr,
                              edit_cache: EditDistCache, params: Params,
                              minimizer_k: int = 15, minimizer_w: int = 10,
                              panel_L: int | None = None,
                              explicit_weights=None):
    """Coroutine body of `build_all_alignments`: yields ONE device-align
    request (reads, lens, wins, score_vec, band) — or None when no
    candidates — then receives the kernel outputs via .send() and yields
    the final (AllAlignments, stats)."""
    is_paired = bg.insert_distr.is_paired_end
    tweak = params.tweak if params.tweak is not None else 0
    boundary = params.boundary_size - tweak
    score_vec = bg.err_prof.score_vec()
    hap_index = HapMinimizerIndex(contig_set, minimizer_k, minimizer_w)
    uniq = UniqueKmers(contig_set, kmer_counts,
                       params.kmer_hard_thresh, params.kmer_soft_thresh)
    hap_lens = np.fromiter((s.size for s in contig_set.seqs), np.int64,
                           len(contig_set.seqs))
    n_haps = len(contig_set.seqs)
    R = len(read_pairs)
    stats = dict(total=R, poorly_mapped=0, out_of_bounds=0,
                 few_kmers=0, n_alns=0)

    # Flatten mates, generate candidates, batch-align.
    mates = []
    m_read, m_slot = [], []
    for r, (c1, c2) in enumerate(read_pairs):
        mates.append(c1)
        m_read.append(r)
        m_slot.append(0)
        if c2 is not None:
            mates.append(c2)
            m_read.append(r)
            m_slot.append(1)
    M = len(mates)
    m_read = np.array(m_read, np.int64)
    m_slot = np.array(m_slot, np.int64)
    has2 = np.fromiter((c2 is not None for _, c2 in read_pairs), bool, R)

    jobs = hap_index.candidates_batch_flat(mates, minimizer_w, params.band,
                                           params.min_anchor_votes,
                                           max_per_hap=3)
    if np.asarray(jobs[0]).size == 0:
        _ = yield None                   # resumed by .send(None)
        tbl = MateAlnTable.empty()
    else:
        reads, lens, wins, meta = _prepare_align_jobs(
            mates, jobs, contig_set, params.band, L=panel_L)
        res = yield (reads, lens, wins, score_vec, params.band)
        tbl = _finish_align(res, meta, lens)

    empty64 = np.empty(0, np.int64)
    empty_result = AllAlignments(
        n_haps=n_haps, table=MateAlnTable.empty(),
        read_ix=empty64, names=[], weights=np.empty(0),
        unmapped=np.empty(0), c_read=empty64, c_hap=empty64,
        c_prob=np.empty(0), c_mid1=empty64, c_mid2=empty64,
        c_a1=empty64, c_a2=empty64, used_mask=np.empty(0, bool))

    # -- A) dedup per (mate, hap, 128bp start bin): keep the best prob;
    #       group order = first occurrence (matches dict-insertion oracle).
    if len(tbl) == 0:
        stats["poorly_mapped"] = R
        yield empty_result, stats
        return
    bin_ = tbl.start >> 7
    order = np.lexsort((-tbl.prob, bin_, tbl.hap, tbl.mate))
    km, khp, kb = tbl.mate[order], tbl.hap[order], bin_[order]
    first = np.ones(order.size, bool)
    first[1:] = (km[1:] != km[:-1]) | (khp[1:] != khp[:-1]) | (kb[1:] != kb[:-1])
    gid = np.cumsum(first) - 1
    n_grp = int(gid[-1]) + 1
    grp_min_orig = np.full(n_grp, 1 << 62)
    np.minimum.at(grp_min_orig, gid, order)
    reps = order[first]                      # best row of each group
    reps = reps[np.argsort(grp_min_orig, kind="stable")]
    tbl = tbl.select(reps)

    if explicit_weights is not None:
        _reweight_aln_probs(tbl, mates, contig_set, bg.err_prof,
                            explicit_weights, score_vec, params.band)

    # -- B) per-mate edit-distance thresholds (err_prof.rs:415-455).
    mate_len = np.fromiter((m.size for m in mates), np.int64, M)
    ulen, inv = np.unique(mate_len, return_inverse=True)
    thr = np.array([edit_cache.get(int(L)) for L in ulen], np.int64)
    good_m, pass_m = thr[inv, 0].copy(), thr[inv, 1].copy()
    # Low-complexity neighbourhoods relax the thresholds for short reads
    # (locs.rs:510-528): a mate whose primary (best-prob) alignment sits
    # where linguistic complexity <= poor_compl accepts edits up to
    # poor_compl_edit * len.
    if bg.seq_info.technology.are_short_reads and len(tbl):
        neighb = bg.depth.neighb_size
        compl_arrs = _neighb_complexity_arrays(contig_set,
                                               params.complexity_k, neighb)
        order2 = np.lexsort((-tbl.prob, tbl.mate))
        pm_sorted = tbl.mate[order2]
        first2 = np.ones(order2.size, bool)
        first2[1:] = pm_sorted[1:] != pm_sorted[:-1]
        prim = order2[first2]                      # best row per mate
        pm = tbl.mate[prim]
        mid = tbl.middle[prim]
        hp = tbl.hap[prim]
        half = neighb // 2
        compl = np.ones(prim.size)
        for h in np.unique(hp):
            rows = np.nonzero(hp == h)[0]
            ca = compl_arrs[h]
            if ca.size == 0:
                continue
            ix = np.clip(mid[rows] - half, 0, ca.size - 1).astype(np.int64)
            compl[rows] = np.nan_to_num(ca[ix], nan=1.0)
        relax_m = np.zeros(M, bool)
        relax_m[pm] = compl <= params.poor_compl
        thr_rel = np.maximum(good_m,
                             (params.poor_compl_edit * mate_len).astype(
                                 np.int64))
        pass_m = pass_m + np.where(relax_m, thr_rel - good_m, 0)
        good_m = np.where(relax_m, thr_rel, good_m)
    tbl = tbl.select(tbl.edit <= pass_m[tbl.mate])

    has_aln = np.zeros(M, bool)
    has_aln[tbl.mate] = True
    best_edit = np.full(M, 1 << 30, np.int64)
    np.minimum.at(best_edit, tbl.mate, tbl.edit)
    mate_ok = has_aln & (best_edit <= good_m)
    well = np.ones(R, bool)
    np.logical_and.at(well, m_read, mate_ok)
    if is_paired:
        well &= has2
    stats["poorly_mapped"] = int(R - well.sum())

    # -- C) in-bounds: any alignment middle inside [boundary, len-boundary)
    #       (locs.rs:998-1004).
    mid = tbl.middle
    inb_row = (mid >= boundary) & (mid < hap_lens[tbl.hap] - boundary)
    read_inb = np.zeros(R, bool)
    np.logical_or.at(read_inb, m_read[tbl.mate], inb_row)
    stats["out_of_bounds"] = int((well & ~read_inb).sum())
    survive = well & read_inb
    if not survive.any():
        yield empty_result, stats
        return

    # -- D) unique-kmer pair weights (locs.rs:905-993).
    mate_uniq = uniq.count_batch(mates)
    pair_uniq = np.zeros(R, np.int64)
    np.add.at(pair_uniq, m_read, mate_uniq)
    weight = np.clip(uniq.weight_interc + pair_uniq * uniq.weight_mult,
                     0.0, 1.0)

    # -- E) per-mate normalization by the best ln-prob (locs.rs:352-354).
    mmax = np.full(M, -np.inf)
    np.maximum.at(mmax, tbl.mate, tbl.prob)
    tbl.prob = tbl.prob - mmax[tbl.mate]

    # -- F) pair / single candidates for surviving reads.
    insert_distr = bg.insert_distr
    unm_ins_penalty = params.unmapped_penalty + insert_distr.insert_penalty
    rows = np.nonzero(survive[m_read[tbl.mate]])[0]
    sr_read = m_read[tbl.mate[rows]]
    sr_slot = m_slot[tbl.mate[rows]]
    sr_hap = tbl.hap[rows]

    if is_paired:
        # Sort rows by (read, hap, slot); groups are (read, hap).
        so = np.lexsort((sr_slot, sr_hap, sr_read))
        g_read, g_hap, g_slot = sr_read[so], sr_hap[so], sr_slot[so]
        g_rows = rows[so]
        gnew = np.ones(so.size, bool)
        gnew[1:] = (g_read[1:] != g_read[:-1]) | (g_hap[1:] != g_hap[:-1])
        ggid = np.cumsum(gnew) - 1
        G = int(ggid[-1]) + 1
        is0 = g_slot == 0
        n1 = np.bincount(ggid[is0], minlength=G)
        n2 = np.bincount(ggid[~is0], minlength=G)
        rows0 = g_rows[is0]                 # mate-1 rows, grouped by gid
        rows1_ = g_rows[~is0]               # mate-2 rows, grouped by gid
        o1 = np.cumsum(n1) - n1
        o2 = np.cumsum(n2) - n2
        P = n1 * n2
        T = int(P.sum())
        if T:
            gpair = np.repeat(np.arange(G), P)
            t = np.arange(T) - np.repeat(np.cumsum(P) - P, P)
            i1 = rows0[o1[gpair] + t // np.maximum(n2[gpair], 1)]
            i2 = rows1_[o2[gpair] + t % np.maximum(n2[gpair], 1)]
            opp = tbl.fwd[i1] != tbl.fwd[i2]
            ins = (np.maximum(tbl.end[i1], tbl.end[i2])
                   - np.minimum(tbl.start[i1], tbl.start[i2]))
            pp = tbl.prob[i1] + tbl.prob[i2] + insert_distr.ln_prob(ins)
            okp = opp & np.isfinite(pp)
            pm = np.where(okp, pp, -np.inf)
        else:
            gpair = t = i1 = i2 = empty64
            okp = np.empty(0, bool)
            pp = pm = np.empty(0)
        # Per-row max over this row's pairings (within its (read,hap) group).
        max_r = np.full(len(tbl), -np.inf)
        if T:
            np.maximum.at(max_r, i1, pm)
            np.maximum.at(max_r, i2, pm)
        mid_all = tbl.middle
        # combos (kept in cross-product order), then mate-1 singles, then
        # mate-2 singles — same insertion order as the oracle, so ties
        # resolve identically under the stable sort below.
        grp_read = g_read[np.nonzero(gnew)[0]]
        grp_hap = g_hap[np.nonzero(gnew)[0]]
        comb_read = grp_read[gpair[okp]] if T else empty64
        comb_hap = grp_hap[gpair[okp]] if T else empty64
        comb = dict(read=comb_read, hap=comb_hap,
                    prob=pp[okp], mid1=mid_all[i1[okp]], mid2=mid_all[i2[okp]],
                    a1=i1[okp], a2=i2[okp],
                    rank=np.zeros(int(okp.sum()), np.int64))
        alone = tbl.prob[rows] + unm_ins_penalty
        ks = alone >= max_r[rows]
        s0 = ks & (sr_slot == 0)
        s1 = ks & (sr_slot == 1)
        sing0 = dict(read=sr_read[s0], hap=sr_hap[s0], prob=alone[s0],
                     mid1=mid_all[rows[s0]],
                     mid2=np.full(int(s0.sum()), -1, np.int64),
                     a1=rows[s0], a2=np.full(int(s0.sum()), -1, np.int64),
                     rank=np.ones(int(s0.sum()), np.int64))
        sing1 = dict(read=sr_read[s1], hap=sr_hap[s1], prob=alone[s1],
                     mid1=np.full(int(s1.sum()), -1, np.int64),
                     mid2=mid_all[rows[s1]],
                     a1=np.full(int(s1.sum()), -1, np.int64), a2=rows[s1],
                     rank=np.full(int(s1.sum()), 2, np.int64))
        cand = {k: np.concatenate([comb[k], sing0[k], sing1[k]])
                for k in comb}
    else:
        s0 = sr_slot == 0
        mid_all = tbl.middle
        cand = dict(read=sr_read[s0], hap=sr_hap[s0],
                    prob=tbl.prob[rows[s0]], mid1=mid_all[rows[s0]],
                    mid2=np.full(int(s0.sum()), -1, np.int64),
                    a1=rows[s0], a2=np.full(int(s0.sum()), -1, np.int64),
                    rank=np.zeros(int(s0.sum()), np.int64))

    # -- G) per-(read, hap) ordering + top-K threshold (locs.rs:730-733).
    pos = np.arange(cand["read"].size)
    oc = np.lexsort((pos, cand["rank"], -cand["prob"],
                     cand["hap"], cand["read"]))
    for k in cand:
        cand[k] = cand[k][oc]
    cr, chp, cp = cand["read"], cand["hap"], cand["prob"]
    gnew = np.ones(cr.size, bool)
    gnew[1:] = (cr[1:] != cr[:-1]) | (chp[1:] != chp[:-1])
    gstart = np.nonzero(gnew)[0]
    gsize = np.diff(np.concatenate([gstart, [cr.size]]))
    rank_in = np.arange(cr.size) - np.repeat(gstart, gsize)
    best_b = np.repeat(cp[gstart], gsize)
    max_alns = np.where(weight >= params.min_weight,
                        MAX_USED_ALNS, MAX_UNUSED_ALNS)
    keepc = (rank_in < max_alns[cr]) & (cp >= best_b - params.prob_diff)
    for k in cand:
        cand[k] = cand[k][keepc]

    # -- H) weights, unmapped probs, survivor packing.
    cand["prob"] = cand["prob"] * weight[cand["read"]]
    stats["n_alns"] = int(cand["read"].size)
    surv_ix = np.nonzero(survive)[0]
    surv_pos = np.full(R, -1, np.int64)
    surv_pos[surv_ix] = np.arange(surv_ix.size)
    if is_paired:
        unmapped = weight * (2.0 * params.unmapped_penalty
                             + insert_distr.insert_penalty)
    else:
        unmapped = weight * params.unmapped_penalty
    used_mask = weight[surv_ix] >= params.min_weight
    stats["few_kmers"] = int((~used_mask).sum())

    result = AllAlignments(
        n_haps=n_haps, table=tbl,
        read_ix=surv_ix,
        names=[names[r] for r in surv_ix],
        weights=weight[surv_ix],
        unmapped=unmapped[surv_ix],
        c_read=surv_pos[cand["read"]],
        c_hap=cand["hap"], c_prob=cand["prob"],
        c_mid1=cand["mid1"], c_mid2=cand["mid2"],
        c_a1=cand["a1"], c_a2=cand["a2"],
        used_mask=used_mask)
    yield result, stats


def build_all_alignments_obj(read_pairs, names, contig_set: ContigSet,
                             kmer_counts: KmerCounts, bg: BgDistr,
                             edit_cache: EditDistCache, params: Params,
                             minimizer_k: int = 15, minimizer_w: int = 10):
    """Readable per-read oracle for `build_all_alignments` (the round-1
    implementation).  Kept for the parity test; do NOT use in the hot path.
    Returns (reads, unused_reads, stats) with ReadAlns objects."""
    is_paired = bg.insert_distr.is_paired_end
    tweak = params.tweak if params.tweak is not None else 0
    boundary = params.boundary_size - tweak
    score_vec = bg.err_prof.score_vec()
    hap_index = HapMinimizerIndex(contig_set, minimizer_k, minimizer_w)
    uniq = UniqueKmers(contig_set, kmer_counts,
                       params.kmer_hard_thresh, params.kmer_soft_thresh)
    hap_lens = [s.size for s in contig_set.seqs]

    mates = []
    mate_of_read = []
    for r, (c1, c2) in enumerate(read_pairs):
        mates.append(c1)
        mate_of_read.append((r, 0))
        if c2 is not None:
            mates.append(c2)
            mate_of_read.append((r, 1))
    jobs = hap_index.candidates_batch_flat(mates, minimizer_w, params.band,
                                           params.min_anchor_votes,
                                           max_per_hap=3)
    aln_lists = _align_candidates(mates, jobs, contig_set, score_vec,
                                  params.band).to_lists(len(mates))

    reads, unused = [], []
    n_haps = len(contig_set.seqs)
    stats = dict(total=len(read_pairs), poorly_mapped=0, out_of_bounds=0,
                 few_kmers=0, n_alns=0)
    per_read: dict[int, list] = {}
    for m_ix, alns in enumerate(aln_lists):
        r, mate = mate_of_read[m_ix]
        per_read.setdefault(r, [[], []])[mate] = _dedup_mate_alns(alns)

    short_reads = bg.seq_info.technology.are_short_reads
    neighb = bg.depth.neighb_size
    compl_arrs = (_neighb_complexity_arrays(contig_set, params.complexity_k,
                                            neighb)
                  if short_reads else None)

    for r, (c1, c2) in enumerate(read_pairs):
        alns1, alns2 = per_read.get(r, [[], []])
        well_mapped = True
        for codes, alns in ((c1, alns1), (c2, alns2)):
            if codes is None:
                continue
            good, passable = edit_cache.get(codes.size)
            if short_reads and alns:
                prim = max(alns, key=lambda a: a.ln_prob)
                compl = _neighb_complexity_at(
                    compl_arrs[prim.hap], (prim.start + prim.end) // 2,
                    neighb)
                if compl <= params.poor_compl:
                    thr = max(good, int(params.poor_compl_edit * codes.size))
                    passable += thr - good
                    good = thr
            alns[:] = [a for a in alns if a.edit <= passable]
            if not alns:
                well_mapped = False
                break
            if min(a.edit for a in alns) > good:
                well_mapped = False
                break
        if is_paired and c2 is None:
            well_mapped = False
        if not well_mapped:
            stats["poorly_mapped"] += 1
            continue
        in_bounds = any(
            boundary <= a.middle < hap_lens[a.hap] - boundary
            for a in alns1 + alns2)
        if not in_bounds:
            stats["out_of_bounds"] += 1
            continue

        kmer_count = uniq.count_read(c1) + (uniq.count_read(c2)
                                            if c2 is not None else 0)
        weight = uniq.pair_weight(kmer_count)

        for alns in (alns1, alns2):
            if alns:
                best = max(a.ln_prob for a in alns)
                for a in alns:
                    a.ln_prob -= best

        if is_paired:
            cands = _pair_candidates(alns1, alns2, n_haps, bg.insert_distr,
                                     params, weight)
            unmapped = weight * (2.0 * params.unmapped_penalty
                                 + bg.insert_distr.insert_penalty)
        else:
            cands = _single_candidates(alns1, n_haps, params, weight)
            unmapped = weight * params.unmapped_penalty
        for cand in cands:
            cand.ln_prob *= weight
        cands.sort(key=lambda cnd: (cnd.hap, -cnd.ln_prob))
        stats["n_alns"] += len(cands)
        ra = ReadAlns(names[r], weight, unmapped, cands, read_ix=r)
        if weight >= params.min_weight:
            reads.append(ra)
        else:
            unused.append(ra)
    stats["few_kmers"] = len(unused)
    return reads, unused, stats
