"""Tests the vectorized k-mer/minimizer engine against a direct scalar
re-implementation of the reference algorithm (seq/kmers.rs)."""
import numpy as np
import pytest

from locityper_tpu.seq import dna
from locityper_tpu.seq import kmers as K
from locityper_tpu.seq.compl import linguistic_complexity

MASK64 = (1 << 64) - 1


def scalar_fasthash(x: int) -> int:
    x = (~x) & MASK64
    x ^= x >> 23
    x = (x * 0x2127599BF4325C37) & MASK64
    x ^= x >> 47
    return x


def scalar_minimizers(seq: str, k: int, w: int):
    """Direct port of the rolling algorithm in kmers.rs:265-331 (spec oracle),
    without the post-N window-delay quirk (see kmers.py docstring)."""
    codes = dna.encode(seq)
    n = len(codes)
    # All k-mer hashes (UNDEF where invalid).
    hashes = []
    fwd = []
    for i in range(n - k + 1):
        window = codes[i:i + k]
        if np.any(window >= 4):
            hashes.append(K.UNDEF)
            fwd.append(True)
            continue
        fw = 0
        for c in window:
            fw = (fw << 2) | int(c)
        rv = 0
        for c in window[::-1]:
            rv = (rv << 2) | int(3 - c)
        if rv < fw:
            kmer, f = rv, False
        else:
            kmer, f = fw, True
        hashes.append(np.uint64(scalar_fasthash(kmer)))
        fwd.append(f)
    out = []
    last_pos = -1
    for start in range(0, len(hashes) - w + 1):
        window = hashes[start:start + w]
        mn = min(window)
        if mn == K.UNDEF:
            continue
        pos = start + window.index(mn)
        if pos > last_pos:
            last_pos = pos
            out.append((pos, mn, fwd[pos]))
    return out


def random_seq(rng, n, with_n=False):
    chars = "ACGTN" if with_n else "ACGT"
    p = [0.23, 0.27, 0.26, 0.24] if not with_n else [0.22, 0.25, 0.25, 0.23, 0.05]
    return "".join(rng.choice(list(chars), n, p=p))


class TestKmers:
    def test_canonical_simple(self):
        # AAC fw = 0b000001 = 1; revcomp(AAC)=GTT fw = 0b101111 = 47 -> canonical AAC.
        kmer, is_fw, valid = K.canonical_kmers("AAC", 3)
        assert kmer[0] == 1 and is_fw[0] and valid[0]
        # revcomp pair maps to same canonical value.
        k1, _, _ = K.canonical_kmers("ACGTTG", 6)
        k2, _, _ = K.canonical_kmers("CAACGT", 6)
        assert k1[0] == k2[0]

    def test_invalid_positions(self):
        kmer, _, valid = K.canonical_kmers("ACGNACG", 3)
        assert not valid[1] and not valid[2] and not valid[3]
        assert kmer[1] == K.UNDEF
        assert valid[0] and valid[4]

    def test_minimizers_match_scalar_oracle(self):
        rng = np.random.default_rng(3)
        for trial in range(8):
            seq = random_seq(rng, 300, with_n=(trial % 2 == 1))
            for (k, w) in [(15, 10), (7, 5), (21, 8)]:
                got = K.minimizers(seq, k, w)
                want = scalar_minimizers(seq, k, w)
                got_list = list(zip(got[0].tolist(),
                                    [np.uint64(h) for h in got[1]],
                                    got[2].tolist()))
                assert got_list == want, f"k={k} w={w} trial={trial}"

    def test_minimizers_revcomp_invariance(self):
        # Canonical minimizer hash sets are strand-independent.
        rng = np.random.default_rng(4)
        seq = random_seq(rng, 500)
        rc = dna.decode(dna.revcomp(dna.encode(seq)))
        s1 = K.sorted_minimizer_set(seq, 15, 10)
        s2 = K.sorted_minimizer_set(rc, 15, 10)
        np.testing.assert_array_equal(s1, s2)

    def test_minimizer_density(self):
        # ~2L/(w+1) minimizers per sequence (recruit.rs:93-95 citation).
        rng = np.random.default_rng(5)
        seq = random_seq(rng, 20000)
        pos, vals, _ = K.minimizers(seq, 15, 10)
        expect = 2 * 20000 / 11
        assert abs(pos.size - expect) / expect < 0.15

    def test_jaccard(self):
        rng = np.random.default_rng(6)
        seq = random_seq(rng, 2000)
        s = K.sorted_minimizer_set(seq, 15, 10)
        uniq, d = K.jaccard_distance(s, s)
        assert uniq == 0 and d == 0.0
        other = random_seq(rng, 2000)
        o = K.sorted_minimizer_set(other, 15, 10)
        uniq2, d2 = K.jaccard_distance(s, o)
        assert d2 > 0.9  # unrelated sequences share almost nothing


class TestComplexity:
    def brute(self, seq, k, w):
        codes = dna.encode(seq)
        n = len(codes)
        win = w - k + 1
        mult = 1.0 / min(win, 1 << (2 * k))
        out = []
        for i in range(n - w + 1):
            kmers = set()
            for j in range(i, i + win):
                window = codes[j:j + k]
                if np.any(window >= 4):
                    continue
                v = 0
                for c in window:
                    v = (v << 2) | int(c)
                kmers.add(v)
            out.append(len(kmers) * mult)
        return np.array(out)

    def test_matches_bruteforce(self):
        rng = np.random.default_rng(7)
        seq = "".join(rng.choice(list("ACGT"), 300))
        got = linguistic_complexity(seq, 5, 100)
        want = self.brute(seq, 5, 100)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_low_complexity_detected(self):
        homo = "A" * 200
        c = linguistic_complexity(homo, 5, 100)
        assert np.all(c < 0.02)
        rng = np.random.default_rng(8)
        rand = "".join(rng.choice(list("ACGT"), 200))
        c2 = linguistic_complexity(rand, 5, 100)
        assert np.all(c2 > 0.5)


class TestDna:
    def test_roundtrip(self):
        s = "ACGTNacgt"
        assert dna.decode(dna.encode(s)) == "ACGTNACGT"

    def test_revcomp(self):
        assert dna.revcomp_str("ACGTN") == "NACGT"

    def test_gc(self):
        assert dna.gc_content(dna.encode("GCGC")) == 100.0
        assert dna.gc_content(dna.encode("ATAT")) == 0.0
        assert dna.gc_content(dna.encode("ACGT")) == 50.0
