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
