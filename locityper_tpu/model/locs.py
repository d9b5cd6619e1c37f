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
from ..seq import dna
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
        """Vectorized `candidates` over a list of reads: one numpy pass of
        lookup + bucket voting for the whole batch (the per-read Python
        loop is the host pipeline's hotspot)."""
        if self.keys.size == 0:
            return [[] for _ in mates]
        from .. import native
        if native.available():
            read_ix, pos, vals, fwd = native.minimizers32_batch(
                mates, self.k, w)
        else:
            m_read, m_pos, m_hash, m_fwd = [], [], [], []
            for ix, codes in enumerate(mates):
                p_, v_, f_ = minimizers32(codes, self.k, w)
                m_read.append(np.full(p_.size, ix, np.int64))
                m_pos.append(p_)
                m_hash.append(v_)
                m_fwd.append(f_)
            if not m_read:
                return [[] for _ in mates]
            read_ix = np.concatenate(m_read)
            pos = np.concatenate(m_pos)
            vals = np.concatenate(m_hash)
            fwd = np.concatenate(m_fwd)
        if read_ix.size == 0:
            return [[] for _ in mates]
        rlens_per = np.array([m.size for m in mates], np.int64)
        rlen = rlens_per[read_ix]

        lo = np.searchsorted(self.keys, vals, side="left")
        hi = np.searchsorted(self.keys, vals, side="right")
        counts = hi - lo
        nz = counts > 0
        if not np.any(nz):
            return [[] for _ in mates]
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

        out = [[] for _ in mates]
        # Top-N buckets per (read, hap, orient): sort by votes desc within
        # groups, then take the first max_per_hap of each.
        order2 = np.lexsort((-g_votes, g_orient, g_hap, g_read))
        prev = (-1, -1, -1)
        taken = 0
        for i in order2:
            gkey = (int(g_read[i]), int(g_hap[i]), int(g_orient[i]))
            if gkey != prev:
                prev = gkey
                taken = 0
            if taken < max_per_hap:
                out[gkey[0]].append((gkey[1], gkey[2], int(g_diag[i])))
                taken += 1
        return out


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
class AllAlignments:
    reads: list                   # list[ReadAlns] used in the model
    unused_reads: list
    n_haps: int

    def best_aln_matrix(self) -> np.ndarray:
        """[n_haps, n_reads] best ln-prob per hap (locs.rs:1177-1186)."""
        R = len(self.reads)
        out = np.empty((self.n_haps, R))
        for r, ra in enumerate(self.reads):
            for h in range(self.n_haps):
                out[h, r] = ra.best_at_hap(h, ra.unmapped_prob)
        return out


def _align_candidates(mates, cand_lists, contig_set, score_vec, band, batch=2048):
    """Aligns every (mate, candidate); returns per-candidate MateAln drafts.

    mates: list of code arrays; cand_lists: per mate list of (hap, orient,
    diag).  Batches are padded to the longest read in the batch.
    """
    jobs = []          # (mate_ix, hap, orient, diag)
    for m_ix, cands in enumerate(cand_lists):
        for hp, orient, diag in cands:
            jobs.append((m_ix, hp, orient, diag))
    results = [[] for _ in mates]
    if not jobs:
        return results
    # Static shapes: pad N to the batch size and L to a 64-multiple bucket so
    # the device kernel compiles once per (batch, bucket), not per call.
    max_read = max(m.size for m in mates)
    L = -(-max_read // 64) * 64
    for s in range(0, len(jobs), batch):
        chunk = jobs[s:s + batch]
        # Bucket N to powers of two (>=256) to bound distinct compile shapes.
        N = 256
        while N < len(chunk):
            N *= 2
        reads = np.full((N, L), 4, np.int8)
        lens = np.zeros(N, np.int32)
        wins = np.full((N, L + band), 4, np.int8)
        win_starts = np.zeros(N, np.int64)
        for i, (m_ix, hp, orient, diag) in enumerate(chunk):
            codes = mates[m_ix]
            if orient:
                codes = dna.revcomp(codes)
            lens[i] = codes.size
            reads[i, :codes.size] = codes
            ws = diag - band // 2
            win_starts[i] = ws
            wins[i] = A.extract_windows(contig_set.seqs[hp], np.array([ws]),
                                        L + band)[0]
        res = A.align_batch_auto(reads, lens, wins, score_vec, band=band)
        res = {k: np.asarray(v) for k, v in res.items()}
        edit, _ = A.edit_and_matches(res, lens)
        for i, (m_ix, hp, orient, diag) in enumerate(chunk):
            results[m_ix].append(MateAln(
                hap=hp,
                start=int(win_starts[i] + res["start_p"][i]),
                end=int(win_starts[i] + res["end_p"][i]),
                fwd=not orient,
                ln_prob=float(res["score"][i]),
                edit=int(edit[i]),
                n_mism=int(res["n_mism"][i]),
                n_ins=int(res["n_ins"][i]),
                n_del=int(res["n_del"][i]),
                n_clip=int(res["n_clip"][i]),
                ws=int(win_starts[i]),
            ))
    return results


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


def build_all_alignments(read_pairs, names, contig_set: ContigSet,
                         kmer_counts: KmerCounts, bg: BgDistr,
                         edit_cache: EditDistCache, params: Params,
                         minimizer_k: int = 15, minimizer_w: int = 10):
    """The full locs pipeline: candidates → device alignment → filters →
    weights → pairing.  `read_pairs`: list of (codes1, codes2|None)."""
    is_paired = bg.insert_distr.is_paired_end
    tweak = params.tweak if params.tweak is not None else 0
    boundary = params.boundary_size - tweak
    score_vec = bg.err_prof.score_vec()
    hap_index = HapMinimizerIndex(contig_set, minimizer_k, minimizer_w)
    uniq = UniqueKmers(contig_set, kmer_counts,
                       params.kmer_hard_thresh, params.kmer_soft_thresh)
    hap_lens = [s.size for s in contig_set.seqs]

    # Flatten mates, generate candidates, batch-align.
    mates = []
    mate_of_read = []            # (read_ix, mate_ix)
    for r, (c1, c2) in enumerate(read_pairs):
        mates.append(c1)
        mate_of_read.append((r, 0))
        if c2 is not None:
            mates.append(c2)
            mate_of_read.append((r, 1))
    cand_lists = hap_index.candidates_batch(mates, minimizer_w, params.band,
                                            params.min_anchor_votes,
                                            max_per_hap=3)
    aln_lists = _align_candidates(mates, cand_lists, contig_set, score_vec,
                                  params.band)

    reads, unused = [], []
    n_haps = len(contig_set.seqs)
    stats = dict(total=len(read_pairs), poorly_mapped=0, out_of_bounds=0,
                 few_kmers=0, n_alns=0)
    per_read: dict[int, list] = {}
    for m_ix, alns in enumerate(aln_lists):
        r, mate = mate_of_read[m_ix]
        per_read.setdefault(r, [[], []])[mate] = _dedup_mate_alns(alns)

    for r, (c1, c2) in enumerate(read_pairs):
        alns1, alns2 = per_read.get(r, [[], []])
        well_mapped = True
        weight = 1.0
        for codes, alns in ((c1, alns1), (c2, alns2)):
            if codes is None:
                continue
            good, passable = edit_cache.get(codes.size)
            alns[:] = [a for a in alns if a.edit <= passable]
            if not alns:
                well_mapped = False
                break
            best_edit = min(a.edit for a in alns)
            if best_edit > good:
                well_mapped = False
                break
            weight *= 1.0 if best_edit <= good else np.sqrt(good / best_edit)
        if is_paired and c2 is None:
            well_mapped = False
        if not well_mapped:
            stats["poorly_mapped"] += 1
            continue
        # in-bounds check (locs.rs:998-1004).
        in_bounds = any(
            boundary <= a.middle < hap_lens[a.hap] - boundary
            for a in alns1 + alns2)
        if not in_bounds:
            stats["out_of_bounds"] += 1
            continue

        kmer_count = uniq.count_read(c1) + (uniq.count_read(c2) if c2 is not None else 0)
        weight *= uniq.pair_weight(kmer_count)

        # Normalize per mate by best ln-prob (locs.rs:352-354).
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
    return AllAlignments(reads, unused, n_haps), stats
