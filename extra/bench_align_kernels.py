import numpy as np, time, sys
import jax
from locityper_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from locityper_tpu.ops import align as A
from locityper_tpu.ops.align_pallas import align_batch_pallas
from locityper_tpu import sim

rng = np.random.default_rng(0)
L, band, batch = 152, 48, 4096
hap = sim.random_genome(rng, 200_000)
err = sim.ErrorModel(0.002, 0.0002, 0.0002)
sc = A.Scores.from_error_rates(0.002, 0.0002, 0.0002)
sv = np.array(sc.astuple(), np.float32)
def mk():
    reads = np.full((batch, L), 4, np.int8); lens = np.zeros(batch, np.int32)
    wins = np.full((batch, L + band), 4, np.int8)
    for i in range(batch):
        s = int(rng.integers(0, hap.size - L - 1))
        r = err.apply(rng, hap[s:s+L])[:L]
        lens[i] = r.size; reads[i,:r.size] = r
        wins[i] = A.extract_windows(hap, np.array([s - band//2]), L+band)[0]
    return jax.device_put(reads), jax.device_put(lens), jax.device_put(wins)
ins = [mk() for _ in range(2)]

def bench(fn, name, iters=16):
    # Warm + force real execution via D2H.
    t0=time.perf_counter()
    first = float(np.asarray(fn(*ins[0])["score"]).sum())
    print(f"{name}: first call (compile) {time.perf_counter()-t0:.1f}s", flush=True)
    t0=time.perf_counter()
    acc=0.0
    for it in range(iters):
        a,b,c = ins[it % 2]
        acc += float(np.asarray(fn(a,b,c)["score"]).sum())
    dt=time.perf_counter()-t0
    print(f"{name}: {iters*batch/dt:,.0f} reads/s  ({dt/iters*1000:.1f} ms/batch) acc={acc:.1f}", flush=True)
    return acc

accx = bench(lambda a,b,c: A.align_batch(a,b,c,sv,band=band), "xla")
accp = bench(lambda a,b,c: align_batch_pallas(a,b,c,sv,band=band,tile=128), "pallas")
print("parity(sum scores):", abs(accx-accp) / abs(accx), flush=True)
# exact elementwise parity
x = {k: np.asarray(v) for k,v in A.align_batch(*ins[0], sv, band=band).items()}
p = {k: np.asarray(v) for k,v in align_batch_pallas(*ins[0], sv, band=band, tile=128).items()}
print("score max diff:", float(np.abs(x['score']-p['score']).max()), flush=True)
print("mism equal frac:", float(np.mean(x['n_mism']==p['n_mism'])), flush=True)
