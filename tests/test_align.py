"""Banded-alignment kernel vs a brute-force numpy DP oracle."""
import numpy as np
import pytest

from locityper_tpu.ops import align as A
from locityper_tpu.seq import dna
from locityper_tpu.sim import ErrorModel, random_genome

SC = A.Scores.from_error_rates(0.002, 0.0002, 0.0002)
SCORE_VEC = np.array(SC.astuple(), dtype=np.float32)


def oracle_score(read, hap, scores):
    """Unbanded DP with the same move set (diag/ins/del/clip-start/clip-end);
    returns the maximum alignment log-likelihood."""
    m_sc, x_sc, i_sc, d_sc, c_sc = scores
    L, H = len(read), len(hap)
    NEG = -1e30
    S = np.full((L + 1, H + 1), NEG)
    S[0, :] = 0.0
    for i in range(1, L + 1):
        S[i, :] = max(S[i, 0], i * c_sc)  # clip-start at any hap pos
        S[i, :] = i * c_sc
        for p in range(0, H + 1):
            best = i * c_sc
            if p > 0:
                sub = m_sc if read[i - 1] == hap[p - 1] else x_sc
                best = max(best, S[i - 1, p - 1] + sub, S[i, p - 1] + d_sc)
            best = max(best, S[i - 1, p] + i_sc)
            S[i, p] = best
    final = NEG
    for i in range(0, L + 1):
        final = max(final, S[i, :].max() + (L - i) * c_sc)
    return final


def run_kernel(read, hap, band=48, win_start=0):
    """Aligns `read` against the window hap[win_start : win_start+L+band];
    the true diagonal must satisfy 0 <= read_start_in_hap - win_start < band."""
    L = len(read)
    reads = np.asarray(read, np.int8)[None, :]
    wins = A.extract_windows(np.asarray(hap, np.int8), np.array([win_start]), L + band)
    res = A.align_batch(reads, np.array([L], np.int32), wins, SCORE_VEC, band=band)
    out = {k: np.asarray(v)[0] for k, v in res.items()}
    out["start_p"] += win_start
    out["end_p"] += win_start
    return out


class TestAlignKernel:
    def test_perfect_match(self):
        rng = np.random.default_rng(0)
        hap = random_genome(rng, 250)
        read = hap[20:170]
        res = run_kernel(read, hap)
        assert res["n_mism"] == 0 and res["n_ins"] == 0 and res["n_del"] == 0
        assert res["n_clip"] == 0
        assert res["score"] == pytest.approx(150 * SC.match, rel=1e-5)
        assert res["start_p"] == 20
        assert res["end_p"] == 170

    def test_snps_counted(self):
        rng = np.random.default_rng(1)
        hap = random_genome(rng, 300)
        read = hap[50:200].copy()
        for pos in (10, 70, 120):
            read[pos] = (read[pos] + 1) % 4
        res = run_kernel(read, hap, win_start=30)
        assert res["n_mism"] == 3
        assert res["n_ins"] == 0 and res["n_del"] == 0
        expect = 147 * SC.match + 3 * SC.mismatch
        assert res["score"] == pytest.approx(expect, rel=1e-5)

    def test_insertion_in_read(self):
        rng = np.random.default_rng(2)
        hap = random_genome(rng, 300)
        read = np.concatenate([hap[50:120], np.array([0, 1, 2], np.int8), hap[120:180]])
        res = run_kernel(read, hap, win_start=30)
        assert res["n_ins"] == 3
        assert res["n_del"] == 0

    def test_deletion_in_read(self):
        rng = np.random.default_rng(3)
        hap = random_genome(rng, 300)
        read = np.concatenate([hap[50:120], hap[126:190]])
        res = run_kernel(read, hap, win_start=30)
        assert res["n_del"] == 6
        assert res["n_ins"] == 0
        assert res["end_p"] - res["start_p"] == len(read) + 6

    def test_clip_at_hap_end(self):
        # Read tail hangs off the end of the haplotype: beyond the end the
        # window is padding (unalignable), so the tail must be soft-clipped.
        rng = np.random.default_rng(4)
        hap = random_genome(rng, 100)
        read = np.concatenate([hap[40:100], random_genome(rng, 40)])
        res = run_kernel(read, hap, win_start=20)
        assert res["n_clip"] == 40
        assert res["start_p"] == 40 and res["end_p"] == 100
        expect = 60 * SC.match + 40 * SC.clip
        assert res["score"] == pytest.approx(expect, rel=1e-4)

    def test_matches_oracle_random(self):
        rng = np.random.default_rng(5)
        err = ErrorModel(mismatch=0.02, insertion=0.004, deletion=0.004)
        scores = SC.astuple()
        for trial in range(10):
            hap = random_genome(rng, 220)
            start = int(rng.integers(0, 60))
            read = err.apply(rng, hap[start:start + 150])
            # Window leaves band margin on both sides of the true diagonal.
            got = run_kernel(read, hap, band=64, win_start=start - 32)
            want = oracle_score(read.tolist(), hap.tolist(), scores)
            assert got["score"] == pytest.approx(want, abs=1e-3), f"trial {trial}"
            # Score must equal the op-count decomposition.
            L = len(read)
            matches = L - got["n_mism"] - got["n_ins"] - got["n_clip"]
            recon = (matches * SC.match + got["n_mism"] * SC.mismatch
                     + got["n_ins"] * SC.insertion + got["n_del"] * SC.deletion
                     + got["n_clip"] * SC.clip)
            assert got["score"] == pytest.approx(recon, abs=1e-3)

    def test_batch_consistency(self):
        # Batched result equals per-item results.
        rng = np.random.default_rng(6)
        hap = random_genome(rng, 400)
        band = 48
        L = 150
        N = 8
        reads = np.full((N, L), 4, np.int8)
        wins = np.full((N, L + band), 4, np.int8)
        lens = np.zeros(N, np.int32)
        for i in range(N):
            start = int(rng.integers(0, 200))
            r = ErrorModel().apply(rng, hap[start:start + L])
            lens[i] = min(len(r), L)
            reads[i, :lens[i]] = r[:lens[i]]
            w = A.extract_windows(hap, np.array([start - band // 2]), L + band)
            wins[i] = w[0]
        res = A.align_batch(reads, lens, wins, SCORE_VEC, band=band)
        for i in range(N):
            single = A.align_batch(reads[i:i + 1], lens[i:i + 1], wins[i:i + 1],
                                   SCORE_VEC, band=band)
            assert np.asarray(single["score"])[0] == pytest.approx(
                float(np.asarray(res["score"])[i]), rel=1e-6)

    def test_no_candidate_window(self):
        # Window entirely padding -> everything clipped.
        read = random_genome(np.random.default_rng(7), 100)
        res = run_kernel(read, np.full(0, 4, np.int8))
        assert res["n_clip"] == 100
        assert res["score"] == pytest.approx(100 * SC.clip, rel=1e-5)


class TestExtractWindows:
    def test_padding(self):
        hap = np.arange(10, dtype=np.int8) % 4
        w = A.extract_windows(hap, np.array([-3, 0, 8]), 6)
        assert (w[0, :3] == 4).all() and (w[0, 3:] == hap[:3]).all()
        assert (w[1] == hap[:6]).all()
        assert (w[2, :2] == hap[8:]).all() and (w[2, 2:] == 4).all()
