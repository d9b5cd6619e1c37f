"""Traceback aligner: native/numpy parity, device-score agreement, and
exact CIGAR replay (counterpart of reference cigar.rs/wfa.rs invariants)."""
import numpy as np
import pytest

from locityper_tpu import native
from locityper_tpu.ops import align as A
from locityper_tpu.ops import traceback as T

BAND = 48


def _scores():
    sc = A.Scores.from_error_rates(0.01, 0.002, 0.002)
    return np.array(sc.astuple(), np.float32)


def _mutated_read(rng, hap, start, L):
    read = hap[start:start + L].copy()
    for _ in range(rng.integers(0, 6)):
        p = int(rng.integers(0, read.size))
        r = rng.random()
        if r < 0.5:
            read[p] = rng.integers(0, 4)
        elif r < 0.75:
            read = np.delete(read, p)
        else:
            read = np.insert(read, p, rng.integers(0, 4))
    return read.astype(np.int8)


def _replay(read, twin, ops, lens, info):
    """Reconstructs the query from the target via the CIGAR; asserts
    mismatch ops truly mismatch and the target interval is consistent."""
    q2 = []
    tp, qi = int(info[0]), 0
    for o, l in zip(ops, lens):
        o, l = int(o), int(l)
        if o == 0:
            assert np.array_equal(read[qi:qi + l], twin[tp:tp + l])
            q2.extend(twin[tp:tp + l])
            tp += l
            qi += l
        elif o == 1:
            for _ in range(l):
                assert read[qi] != twin[tp]
                q2.append(read[qi])
                qi += 1
                tp += 1
        elif o == 2:
            q2.extend(read[qi:qi + l])
            qi += l
        elif o == 3:
            tp += l
        else:
            q2.extend(read[qi:qi + l])
            qi += l
    assert np.array_equal(np.array(q2, np.int8), read)
    assert tp == int(info[1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_parity_and_replay(seed):
    rng = np.random.default_rng(seed)
    svec = _scores()
    for trial in range(40):
        L0 = int(rng.integers(30, 160))
        hap = rng.integers(0, 4, 400).astype(np.int8)
        start = int(rng.integers(0, 200))
        read = _mutated_read(rng, hap, start, L0)
        L = read.size
        twin = A.extract_windows(hap, np.array([start - BAND // 2]),
                                 L + BAND)[0]
        out_p = T._align_cigar_numpy(read, twin, BAND, svec)
        assert out_p is not None
        ops, lens, info, score = out_p
        _replay(read, twin, ops, lens, info)
        # Query fully consumed.
        q_consumed = sum(int(l) for o, l in zip(ops, lens)
                         if int(o) in (0, 1, 2, 4))
        assert q_consumed == L
        # Payload counts consistent with the CIGAR.
        from collections import Counter
        c = Counter()
        for o, l in zip(ops, lens):
            c[int(o)] += int(l)
        assert (c[1], c[2], c[3], c[4]) == tuple(int(x) for x in info[2:])
        if native.available():
            out_n = native.banded_align_cigar(read, twin, BAND, svec)
            assert out_n is not None
            n_ops, n_lens, n_info, n_score = out_n
            assert np.array_equal(n_info, info)
            assert np.array_equal(n_ops, ops) and np.array_equal(n_lens, lens)
            assert abs(n_score - score) < 1e-3


def test_score_matches_device_kernel():
    """Traceback score == the device aligner's ML score (same recurrence)."""
    rng = np.random.default_rng(7)
    svec = _scores()
    L_PAD = 160
    reads, rlens, twins, host_scores = [], [], [], []
    for _ in range(32):
        hap = rng.integers(0, 4, 400).astype(np.int8)
        start = int(rng.integers(0, 200))
        read = _mutated_read(rng, hap, start, int(rng.integers(40, 150)))
        twin = A.extract_windows(hap, np.array([start - BAND // 2]),
                                 L_PAD + BAND)[0]
        out = T.align_cigar(read, twin, BAND, svec)
        assert out is not None
        host_scores.append(out[3])
        rp = np.full(L_PAD, 4, np.int8)
        rp[:read.size] = read
        reads.append(rp)
        rlens.append(read.size)
        twins.append(twin)
    res = A.align_batch(np.stack(reads), np.array(rlens, np.int32),
                        np.stack(twins), svec, band=BAND)
    np.testing.assert_allclose(np.asarray(res["score"]),
                               np.array(host_scores, np.float32), atol=1e-2)


def test_clip_and_indel_cigar():
    """A read overhanging the window start is soft-clipped; a clean embedded
    deletion shows as D."""
    rng = np.random.default_rng(11)
    svec = _scores()
    hap = rng.integers(0, 4, 300).astype(np.int8)
    # Deletion: read = hap[50:90] + hap[95:150]  (5bp deletion vs hap).
    read = np.concatenate([hap[50:90], hap[95:150]]).astype(np.int8)
    twin = A.extract_windows(hap, np.array([50 - BAND // 2]),
                             read.size + BAND)[0]
    ops, lens, info, _ = T.align_cigar(read, twin, BAND, svec)
    assert 3 in ops and int(info[4]) == 5
    s = T.cigar_string(ops, lens)
    assert "5D" in s
    # Tail-clip: read runs past the haplotype end; pads (code 4) forbid
    # =/X there, insertions cost more than clips -> the tail must clip.
    alien = ((hap[:30] + 1) % 4).astype(np.int8)
    read2 = np.concatenate([hap[250:300], alien]).astype(np.int8)
    win2 = A.extract_windows(hap, np.array([250 - BAND // 2]),
                             read2.size + BAND)[0]
    ops2, lens2, info2, _ = T.align_cigar(read2, win2, BAND, svec)
    assert int(ops2[-1]) == 4 and int(lens2[-1]) >= 30
    assert int(info2[5]) >= 30
