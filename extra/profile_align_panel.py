"""Align-phase breakdown at panel scale (round 4).

The 100-locus panel spends 8.9-10.4 s in build_all_alignments_panel;
this splits it into the legs the function actually runs:

  cand    per-locus host candidate generation (minimizer index + votes
          + window extraction), i.e. driving each generator to its yield
  concat  np.concatenate of the per-locus job arrays
  device  run_align_batches (H2D + kernel + single packed D2H)
  post    per-locus host post-processing (dedup/filters/pairing),
          i.e. gen.send(results)

Usage: python extra/profile_align_panel.py [n_loci] [rounds]
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

import os  # noqa: E402
if os.environ.get("PROF_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

from extra.panel_setup import make_bg, make_panel  # noqa: E402
from locityper_tpu.bg.err_prof import EditDistCache, EditThresh  # noqa: E402
from locityper_tpu.commands.genotype import recruit_reads_fast  # noqa: E402
from locityper_tpu.model import Params  # noqa: E402
from locityper_tpu.model.locs import (  # noqa: E402
    _build_all_alignments_gen, run_align_batches)
from locityper_tpu.seq.recruit import RecruitParams  # noqa: E402

N_LOCI = int(sys.argv[1]) if len(sys.argv) > 1 else 100
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

loci, data, fq1, fq2, total = make_panel(N_LOCI, prefix="prof_align_")
print(json.dumps(dict(stage="setup", pairs=total, loci=N_LOCI)), flush=True)

bg = make_bg()
tech = bg.seq_info.technology
params = Params(unmapped_penalty=tech.default_unmapped_penalty())
params.set_tweak_size(bg.depth.window_size)
if params.band is None:
    params.band = 48
edit_cache = EditDistCache(bg.err_prof, EditThresh.default_for(tech))
rp = RecruitParams(match_frac=tech.default_match_frac(True))

rec, _speed = recruit_reads_fast(data, fq1, fq2, rp, seed=1)
panel = [(rec[l.name][0], rec[l.name][1], data[l.name].contig_set,
          data[l.name].kmer_counts) for l in loci]
n_rec = sum(len(item[0]) for item in panel)
print(json.dumps(dict(stage="recruited", pairs=n_rec)), flush=True)


def one_round():
    ts = {}
    max_read = max((m.size for item in panel for pair in item[0]
                    for m in pair if m is not None), default=64)
    L = -(-max_read // 64) * 64
    t0 = time.perf_counter()
    gens, reqs = [], []
    for read_pairs, names, contig_set, kmer_counts in panel:
        g = _build_all_alignments_gen(read_pairs, names, contig_set,
                                      kmer_counts, bg, edit_cache, params,
                                      15, 10, panel_L=L)
        reqs.append(next(g))
        gens.append(g)
    ts["cand"] = time.perf_counter() - t0

    live = [i for i, r in enumerate(reqs) if r is not None]
    t0 = time.perf_counter()
    score_vec, band = reqs[live[0]][3], reqs[live[0]][4]
    cat_reads = np.concatenate([reqs[i][0] for i in live])
    cat_lens = np.concatenate([reqs[i][1] for i in live])
    cat_wins = np.concatenate([reqs[i][2] for i in live])
    ts["concat"] = time.perf_counter() - t0
    ts["jobs"] = int(cat_reads.shape[0])

    t0 = time.perf_counter()
    res = run_align_batches(cat_reads, cat_lens, cat_wins, score_vec, band)
    ts["device"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = [None] * len(gens)
    off = 0
    for i in live:
        n = reqs[i][0].shape[0]
        results[i] = {k: v[off:off + n] for k, v in res.items()}
        off += n
    out = [g.send(results[i]) for i, g in enumerate(gens)]
    ts["post"] = time.perf_counter() - t0
    ts["total"] = sum(v for k, v in ts.items()
                      if k in ("cand", "concat", "device", "post"))
    return ts, out


best = None
for r in range(ROUNDS):
    ts, out = one_round()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in ts.items()}), flush=True)
    if best is None or ts["total"] < best["total"]:
        best = ts
print(json.dumps(dict(stage="best",
                      **{k: (round(v, 3) if isinstance(v, float) else v)
                         for k, v in best.items()})), flush=True)
