"""Deterministic RNG streams.

The reference uses Xoshiro256++ with `jump()` per worker thread and
`long_jump()` per locus (ext/rand.rs:3-22, solvers/solve.rs:998,
command/genotype.rs:1290-1292) so that results are reproducible for a fixed
seed regardless of thread count.  We reproduce the *semantics* (independent,
deterministic streams addressable by (seed, locus, role)) using numpy's
Philox streams on the host and `jax.random` keys on the device.  Identical
calls — not identical random sequences — are the reproducibility contract
(SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

import numpy as np


class RngHub:
    """Derives independent child streams from a root seed, addressable by path."""

    def __init__(self, seed: int):
        self.seed = int(seed)

    def host(self, *path) -> np.random.Generator:
        """Returns a numpy Generator for the given stream path."""
        ss = np.random.SeedSequence([self.seed, *(_hash_part(p) for p in path)])
        return np.random.Generator(np.random.Philox(ss))

    def device_key(self, *path):
        """Returns a jax PRNG key for the given stream path."""
        import jax
        ss = np.random.SeedSequence([self.seed, *(_hash_part(p) for p in path)])
        return jax.random.PRNGKey(int(ss.generate_state(1, np.uint32)[0]))


def _hash_part(p) -> int:
    if isinstance(p, int):
        return p & 0xFFFFFFFF
    h = 2166136261
    for b in str(p).encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
