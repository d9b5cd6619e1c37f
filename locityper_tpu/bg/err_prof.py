"""Error profile: per-op multinomial + Beta-Binomial edit-distance model.

Counterpart of reference bg/err_prof.rs:
* per-op ln-probabilities from aggregate CIGAR op counts with a 1e-5 floor
  (:88-110); clipping prob = max(mismatch, insertion);
* alignment ln-prob = Σ count·ln p(op) (:212-221) — in this framework the
  banded aligner (ops/align.py) maximizes this quantity directly, so the
  profile both scores and *drives* alignment;
* edit-distance Beta-Binomial MLE over (edit, read_len, count) triples with
  uniform-mixture regularization (:176-185);
* good/passable edit thresholds, per-technology defaults (:365-455).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..mathx.distr import BetaBinomial, fit_betabinom_mle

MIN_OP_PROB = 1e-5
UNIF_NOMINATOR = 3.0


@dataclass
class ErrorProfile:
    ln_match: float
    ln_mismatch: float
    ln_insertion: float
    ln_deletion: float
    ln_clipping: float
    edit_distr: BetaBinomial

    @classmethod
    def estimate(cls, n_match: int, n_mism: int, n_ins: int, n_del: int,
                 edit_triples) -> "ErrorProfile":
        """edit_triples: iterable of (edit, read_len, count)."""
        sum_len = float(n_match + n_mism + n_ins + n_del)
        mism_p = max(n_mism / sum_len, MIN_OP_PROB)
        ins_p = max(n_ins / sum_len, MIN_OP_PROB)
        del_p = max(n_del / sum_len, MIN_OP_PROB)
        match_p = 1.0 - mism_p - ins_p - del_p
        assert match_p > 0.5, f"Match probability ({match_p:.5f}) must be over 50%"
        triples = [(min(e, n), n, float(c)) for e, n, c in edit_triples]
        n_reads = sum(c for _, _, c in triples)
        unif_coef = min(UNIF_NOMINATOR / max(n_reads, 1.0), 0.1)
        edit_distr = fit_betabinom_mle(triples, unif_coef)
        return cls(np.log(match_p), np.log(mism_p), np.log(ins_p), np.log(del_p),
                   np.log(max(ins_p, mism_p)), edit_distr)

    @classmethod
    def from_op_counts(cls, res: dict, rlens: np.ndarray) -> "ErrorProfile":
        """Builds the profile from the aligner's batched op-count output."""
        n_mism = np.asarray(res["n_mism"])
        n_ins = np.asarray(res["n_ins"])
        n_del = np.asarray(res["n_del"])
        n_clip = np.asarray(res["n_clip"])
        matches = rlens - n_mism - n_ins - n_clip
        edits = n_mism + n_ins + n_clip + n_del
        obs_len = rlens - n_clip + n_del  # aligned read part + deletions
        keys, counts = np.unique(np.stack([edits, rlens]), axis=1, return_counts=True)
        triples = [(int(e), int(n), float(c))
                   for (e, n), c in zip(keys.T, counts)]
        return cls.estimate(int(matches.sum()), int(n_mism.sum()),
                            int(n_ins.sum()), int(n_del.sum()), triples)

    def ln_prob_counts(self, matches, mism, ins, dele, clip) -> np.ndarray:
        """Vectorized alignment ln-probability (err_prof.rs:212-221)."""
        return (self.ln_match * matches + self.ln_mismatch * mism
                + self.ln_insertion * ins + self.ln_deletion * dele
                + self.ln_clipping * clip)

    def score_vec(self) -> np.ndarray:
        """f32 [5] score vector for the banded aligner."""
        return np.array([self.ln_match, self.ln_mismatch, self.ln_insertion,
                         self.ln_deletion, self.ln_clipping], dtype=np.float32)

    def weighted_aln_ln_prob(self, ops, lens, ref_start: int, ref_end: int,
                             weights: np.ndarray, contig_len: int):
        """Region-weight-aware alignment ln-probability
        (err_prof.rs:225-266 semantics as specialized in
        model/windows.rs:508-575): every CIGAR op contributes
        weight(ref position)·ln p_op; the total is re-normalized by
        sum_len / sum_weight so regions with uniformly high or low weight
        are not penalized globally — only RELATIVE weight differences
        within one alignment matter.

        ops/lens: traceback CIGAR (0 '=', 1 'X', 2 'I', 3 'D', 4 'S');
        ref_start/ref_end: alignment span on the contig; weights: per-bp
        explicit weights [contig_len].  Returns (ln_prob, edit,
        read_aln_len) with edit/read_aln_len matching the unweighted
        accounting (edit = X+I+D, read_aln_len = sum_len − dels)."""
        op_prob = (self.ln_match, self.ln_mismatch, self.ln_insertion,
                   self.ln_deletion, self.ln_clipping)
        prob = 0.0
        sum_weight = 0.0
        sum_len = 0
        sum_dels = 0
        edit = 0
        left_clip = right_clip = 0
        first = True
        rpos = int(ref_start)
        for op, ln in zip(ops, lens):
            op, ln = int(op), int(ln)
            if op == 4:                       # soft clip: handled after
                if first:
                    left_clip = ln
                else:
                    right_clip = ln
                first = False
                continue
            first = False
            if op == 0:
                shift = ln
            elif op == 1:
                shift = ln
                edit += ln
            elif op == 2:
                shift = 0
                edit += ln
            elif op == 3:
                shift = ln
                edit += ln
                sum_dels += ln
            else:
                raise ValueError(f"Unsupported CIGAR op {op}")
            if shift == 0:
                cw = ln * float(weights[min(rpos, contig_len - 1)])
            else:
                cw = float(weights[rpos:rpos + shift].sum())
            prob += cw * op_prob[op]
            sum_weight += cw
            sum_len += ln
            rpos += shift
        # Clipping limited to the contig bounds (aln.rs:288-296), weighted
        # at the alignment's terminal positions (windows.rs:552-563).
        left_clip = min(left_clip, int(ref_start))
        right_clip = min(right_clip, max(contig_len - int(ref_end), 0))
        for rp, clip in ((int(ref_start), left_clip),
                         (int(ref_end), right_clip)):
            if clip > 0:
                cw = clip * float(weights[min(rp, contig_len - 1)])
                prob += cw * self.ln_clipping
                sum_weight += cw
                sum_len += clip
        if sum_weight > 0:
            prob *= sum_len / sum_weight
        return prob, edit, sum_len - sum_dels

    def to_json(self):
        return dict(matches=self.ln_match, mismatches=self.ln_mismatch,
                    insertions=self.ln_insertion, deletions=self.ln_deletion,
                    clipping=self.ln_clipping,
                    alpha=self.edit_distr.alpha, beta=self.edit_distr.beta)

    @classmethod
    def from_json(cls, obj):
        return cls(float(obj["matches"]), float(obj["mismatches"]),
                   float(obj["insertions"]), float(obj["deletions"]),
                   float(obj["clipping"]),
                   BetaBinomial(float(obj["alpha"]), float(obj["beta"])))


@dataclass(frozen=True)
class EditThresh:
    """Good/passable edit-distance thresholds (err_prof.rs:363-412).
    mode 'frac': thresholds = (p1·len, p2·len); mode 'pval': Beta-Binomial
    inverse CDF at (p1, p2)."""
    mode: str
    p1: float
    p2: float

    @classmethod
    def default_for(cls, technology) -> "EditThresh":
        from . import Technology
        if technology is Technology.ILLUMINA:
            return cls("frac", 0.03, 0.06)
        return cls("pval", 0.99, 0.999)


class EditDistCache:
    """Per-read-length (good, passable) thresholds (err_prof.rs:415-455)."""

    def __init__(self, err_prof: ErrorProfile, thresh: EditThresh):
        self.edit_distr = err_prof.edit_distr
        self.thresh = thresh
        self._cache: dict[int, tuple[int, int]] = {}

    def get(self, read_len: int) -> tuple[int, int]:
        v = self._cache.get(read_len)
        if v is None:
            if self.thresh.mode == "frac":
                v = (int(read_len * self.thresh.p1), int(read_len * self.thresh.p2))
            else:
                v = self.edit_distr.inv_cdf2(read_len, self.thresh.p1, self.thresh.p2)
            self._cache[read_len] = v
        return v
