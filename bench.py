#!/usr/bin/env python
"""Benchmark: reads aligned per second per chip on the banded ML aligner.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured kernel is the pipeline's hot path (SURVEY.md §3.1 hot loops
#2+#3): banded alignment of every recruited read against candidate haplotype
windows, including op counting (edit distance + error-profile likelihood).

Baseline: the reference outsources this step to strobealign
(command/genotype.rs:978-1074); strobealign-class short-read mappers sustain
~10k reads/s/core at these read lengths (order-of-magnitude figure, the repo
publishes no numbers — BASELINE.md).  vs_baseline = our reads/s / 10_000.
"""
import json
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 10_000.0


def main():
    import jax
    from locityper_tpu.cli import _enable_compile_cache
    from locityper_tpu.utils.malloc import tune_host_allocator
    _enable_compile_cache()
    tune_host_allocator()
    from locityper_tpu.ops import align as A
    from locityper_tpu import sim

    rng = np.random.default_rng(0)
    L, band, batch = 152, 48, 4096
    hap = sim.random_genome(rng, 200_000)
    err = sim.ErrorModel(0.002, 0.0002, 0.0002)
    sc = A.Scores.from_error_rates(0.002, 0.0002, 0.0002)
    score_vec = np.array(sc.astuple(), np.float32)

    def make_inputs():
        reads = np.full((batch, L), 4, np.int8)
        lens = np.zeros(batch, np.int32)
        wins = np.full((batch, L + band), 4, np.int8)
        for i in range(batch):
            start = int(rng.integers(0, hap.size - L - 1))
            r = err.apply(rng, hap[start:start + L])[:L]
            lens[i] = r.size
            reads[i, :r.size] = r
            wins[i] = A.extract_windows(hap, np.array([start - band // 2]),
                                        L + band)[0]
        return jax.device_put(reads), jax.device_put(lens), jax.device_put(wins)

    # Kernel choice: Pallas (VMEM-resident DP state) with XLA fallback.
    try:
        from locityper_tpu.ops.align_pallas import align_batch_pallas

        def run(r, l, w):
            return align_batch_pallas(r, l, w, score_vec, band=band, tile=128)
        kernel = "pallas"
    except Exception:
        def run(r, l, w):
            return A.align_batch(r, l, w, score_vec, band=band)
        kernel = "xla"

    # Measurement: N kernel invocations CHAINED inside one jit — each
    # iteration rolls the batch so its data differ (no loop hoisting, no
    # result reuse) and the returned scalar sums every kernel's scores, so
    # fetching it cannot complete before all N kernels ran.  One D2H per
    # timed call: wall = N*kernel + one round trip.  (Per-iteration D2H
    # measures the HOST<->CHIP round trip instead of the chip: on this
    # relay it saturates near ~50-140k reads/s regardless of kernel --
    # see BENCH_NOTES.md.)
    import functools

    import jax.numpy as jnp

    N_CHAIN = 32

    @jax.jit
    def chained(reads, lens, wins):
        def body(i, acc):
            r = jnp.roll(reads, i, axis=0)
            l = jnp.roll(lens, i, axis=0)
            w = jnp.roll(wins, i, axis=0)
            out = run(r, l, w)
            return acc + jnp.sum(out["score"])
        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.float32(0.0))

    inputs = [make_inputs() for _ in range(2)]
    _ = float(np.asarray(chained(*inputs[0])))              # compile + run

    best_dt = None
    acc = 0.0
    for it in range(3):
        r, l, w = inputs[it % len(inputs)]
        t0 = time.perf_counter()
        acc += float(np.asarray(chained(r, l, w)))
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    dt = best_dt
    reads_per_sec = N_CHAIN * batch / dt
    print(f"kernel={kernel} acc={acc:.1f}", file=sys.stderr)
    res = run(*inputs[0])

    n_mism = np.asarray(res["n_mism"])
    print(f"devices={jax.devices()} batch={batch} L={L} band={band} "
          f"chain={N_CHAIN} wall={dt:.3f}s median_mism={np.median(n_mism)}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "reads_aligned_per_sec_per_chip",
        "value": round(float(reads_per_sec), 1),
        "unit": "reads/s",
        "vs_baseline": round(float(reads_per_sec) / BASELINE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
