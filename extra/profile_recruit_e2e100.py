"""Recruit-phase breakdown at 100-locus / 1M-pair scale (round 4).

The e2e recruit phase runs at ~55-68k pairs/s while the device kernel
alone sustains ~200k+: this isolates the legs by running the SAME input
through (a) parse only, (b) parse + dispatch (device decisions computed
but never fetched... fetched once at the end to sync), (c) the full
production pass (parse + dispatch + fetch + scatter).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.cli import _enable_compile_cache  # noqa: E402
from locityper_tpu.utils.malloc import tune_host_allocator  # noqa: E402

_enable_compile_cache()
tune_host_allocator()

import jax                      # noqa: E402

from locityper_tpu import sim                         # noqa: E402
from locityper_tpu.pipeline import LocusData          # noqa: E402
from locityper_tpu.commands.genotype import (          # noqa: E402
    _tail_chunks, recruit_reads_fast)
from locityper_tpu.seq.contigs import ContigSet       # noqa: E402
from locityper_tpu.seq.counts import (GenomeKmerCounter,  # noqa: E402
                                      off_target_counts)
from locityper_tpu.seq.fastx import (Read, fast_paired_batches,  # noqa: E402
                                     write_fastq)
from locityper_tpu.seq.recruit import RecruitParams, TargetIndex  # noqa: E402
from locityper_tpu.ops import recruit as R            # noqa: E402

N_LOCI = int(sys.argv[1]) if len(sys.argv) > 1 else 100
rng = np.random.default_rng(0)
loci = [sim.simulate_locus(rng, f"B{i}", length=4000, n_haps=6,
                           divergence=0.015) for i in range(N_LOCI)]
flanks = [sim.random_genome(rng, 20000) for _ in range(N_LOCI + 1)]
genome = np.concatenate(
    [p for pair in zip(flanks, [l.haplotypes[0] for l in loci])
     for p in pair] + [flanks[-1]])
counter = GenomeKmerCounter(25)
counter.add_seq(genome)
counter.finalize()
data = {}
for locus in loci:
    kc = off_target_counts(counter, locus.haplotypes, locus.haplotypes[0])
    data[locus.name] = LocusData(
        ContigSet(locus.name, locus.hap_names, locus.haplotypes), kc)

err = sim.ErrorModel(0.002, 0.0002, 0.0002)
reads1, reads2, names = [], [], []
for locus in loci:
    r = sim.simulate_paired_reads(
        rng, [locus.haplotypes[i] for i in locus.true_genotype],
        depth=15.0, read_len=150, errors=err, prefix=locus.name)
    reads1 += list(r.reads1)
    reads2 += list(r.reads2)
    names += list(r.names)
bgr = sim.simulate_paired_reads(rng, flanks * 10, depth=15.0,
                                read_len=150, errors=err, prefix="bg")
reads1 += list(bgr.reads1)
reads2 += list(bgr.reads2)
names += list(bgr.names)
total = len(reads1)
import tempfile
tmpd = Path(tempfile.mkdtemp(prefix="prof_rec100_"))
fq1, fq2 = tmpd / "r1.fq", tmpd / "r2.fq"
with open(fq1, "w") as f1, open(fq2, "w") as f2:
    for n, a, b in zip(names, reads1, reads2):
        write_fastq(f1, Read(n, a))
        write_fastq(f2, Read(n, b))
print(json.dumps(dict(stage="setup", pairs=total, loci=N_LOCI)), flush=True)

rp = RecruitParams(match_frac=0.5)
idx = TargetIndex(rp)
order = []
for locus in loci:
    idx.add_locus(data[locus.name].contig_set, data[locus.name].kmer_counts)
    order.append(locus.name)
idx.finalize()
dev = R.DeviceIndex.from_index(idx)
ta, tb = dev.device_args()
cfg = dev.cfg
BATCH, MAXLEN = 32768, 192

# Warm the kernel shapes (full + tail buckets).
out, _ = recruit_reads_fast(data, str(fq1), str(fq2), rp, seed=1,
                            batch=BATCH, max_len=MAXLEN)
print(json.dumps(dict(stage="warm_recruited",
                      hits=sum(len(v[0]) for v in out.values()))),
      flush=True)


def parse_only():
    t0 = time.perf_counter()
    n = 0
    for nm, m1, l1, m2, l2, count in fast_paired_batches(
            str(fq1), str(fq2), batch=BATCH, max_len=MAXLEN):
        n += count
    return time.perf_counter() - t0, n


def parse_dispatch():
    t0 = time.perf_counter()
    pend = []
    for nm, m1, l1, m2, l2, count in fast_paired_batches(
            str(fq1), str(fq2), batch=BATCH, max_len=MAXLEN):
        for st, take, bsz in _tail_chunks(count, m1.shape[0]):
            res = R.run_pairs_async_packed(dev, m1[st:st + bsz],
                                           m2[st:st + bsz])
            res.copy_to_host_async()
            pend.append(res)
            while len(pend) > 3:
                np.asarray(pend.pop(0))
    while pend:
        np.asarray(pend.pop(0))
    return time.perf_counter() - t0, None


def full_pass():
    t0 = time.perf_counter()
    out, speed = recruit_reads_fast(data, str(fq1), str(fq2), rp, seed=1,
                                    batch=BATCH, max_len=MAXLEN)
    return time.perf_counter() - t0, speed


LEGS = [("parse", parse_only), ("parse+dispatch+fetch", parse_dispatch),
        ("full", full_pass)]
times = {k: [] for k, _ in LEGS}
for _round in range(4):
    for k, f in LEGS:
        dt, _x = f()
        times[k].append(dt)
for k, ts in times.items():
    best = min(ts)
    print(json.dumps(dict(stage=k, s_best=round(best, 2),
                          s_med=round(sorted(ts)[len(ts) // 2], 2),
                          pairs_per_s=round(total / best))), flush=True)
