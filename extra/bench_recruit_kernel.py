import numpy as np, time
import jax
from locityper_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from locityper_tpu import sim
from locityper_tpu.seq.contigs import ContigSet
from locityper_tpu.seq.counts import GenomeKmerCounter, off_target_counts
from locityper_tpu.seq.recruit import RecruitParams, TargetIndex
from locityper_tpu.ops.recruit import DeviceIndex, recruit_pairs_batch

rng = np.random.default_rng(0)
# Build a 20-locus panel index.
genome = sim.random_genome(rng, 500_000)
counter = GenomeKmerCounter(25); counter.add_seq(genome); counter.finalize()
idx = TargetIndex(RecruitParams(match_frac=0.5))
loci = []
for i in range(20):
    locus = sim.simulate_locus(rng, f"L{i}", length=4000, n_haps=6)
    kc = off_target_counts(counter, locus.haplotypes, np.empty(0, np.int8))
    idx.add_locus(ContigSet(f"L{i}", locus.hap_names, locus.haplotypes), kc)
    loci.append(locus)
idx.finalize()
dev = DeviceIndex.from_index(idx)
print(f"index: {idx.keys.size} keys, {idx.n_loci} loci, groups={dev.n_groups}", flush=True)

B, L = 8192, 152
err = sim.ErrorModel(0.002, 0.0002, 0.0002)
def mk():
    m1 = np.full((B, L), 4, np.int8); m2 = np.full((B, L), 4, np.int8)
    for i in range(B):
        if i % 4 == 0:   # 25% locus reads
            l = loci[i % 20]; h = l.haplotypes[i % 6]
            s = int(rng.integers(0, h.size - 400))
            from locityper_tpu.seq import dna
            a = err.apply(rng, h[s:s+150])[:150]
            b = err.apply(rng, dna.revcomp(h[s+250:s+400]))[:150]
            m1[i,:a.size] = a
            m2[i,:b.size] = b
        else:
            s = int(rng.integers(0, genome.size - 400))
            m1[i,:150] = genome[s:s+150]; m2[i,:150] = genome[s+250:s+400]
    return jax.device_put(m1), jax.device_put(m2)
ins = [mk() for _ in range(2)]
ta, tb = map(jax.device_put, dev.tables())

def run(a, b):
    return recruit_pairs_batch(dev.cfg, a, b, ta, tb)

t0=time.perf_counter()
first = np.asarray(run(*ins[0]))
print(f"compile+1: {time.perf_counter()-t0:.1f}s  recruited={first.any(1).sum()}/{B}", flush=True)
iters=16
t0=time.perf_counter()
acc=0
for it in range(iters):
    acc += int(np.asarray(run(*ins[it%2])).sum())
dt=time.perf_counter()-t0
print(f"device recruit: {iters*B/dt:,.0f} pairs/s ({2*iters*B/dt:,.0f} reads/s)  acc={acc}", flush=True)
