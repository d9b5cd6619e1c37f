"""Full-pipeline 100-locus panel run with phase + solve sub-timings
(round 4): recruit (packed dispatch) -> panel-batched align (packed
upload) -> panel solve (DEBUG sub-timings from _solve_panel_group).

Usage: python extra/profile_panel_e2e.py [n_loci] [passes]
"""
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from locityper_tpu.cli import _enable_compile_cache  # noqa: E402
from locityper_tpu.utils.malloc import tune_host_allocator  # noqa: E402

_enable_compile_cache()
tune_host_allocator()

logging.basicConfig(level=logging.DEBUG,
                    format="%(asctime)s %(name)s %(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)

from extra.panel_setup import make_bg, make_panel  # noqa: E402
from locityper_tpu.bg.err_prof import EditDistCache, EditThresh  # noqa: E402
from locityper_tpu.commands.genotype import recruit_reads_fast  # noqa: E402
from locityper_tpu.model import Params  # noqa: E402
from locityper_tpu.model.locs import build_all_alignments_panel  # noqa: E402
from locityper_tpu.pipeline import genotype_panel  # noqa: E402
from locityper_tpu.seq.recruit import RecruitParams  # noqa: E402
from locityper_tpu.solvers.solve import Scheme  # noqa: E402

N_LOCI = int(sys.argv[1]) if len(sys.argv) > 1 else 100
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 3

loci, data, fq1, fq2, total = make_panel(N_LOCI, prefix="prof_e2e_")
print(json.dumps(dict(stage="setup", pairs=total, loci=N_LOCI)), flush=True)

bg = make_bg()
tech = bg.seq_info.technology
params = Params(unmapped_penalty=tech.default_unmapped_penalty())
params.set_tweak_size(bg.depth.window_size)
if params.band is None:
    params.band = 48
edit_cache = EditDistCache(bg.err_prof, EditThresh.default_for(tech))
rp = RecruitParams(match_frac=tech.default_match_frac(True))
scheme = Scheme.parse(["greedy:i=5k,a=1", "anneal:i=8,a=8,n=3000,p=2000"])


def one_pass(seed):
    t0 = time.perf_counter()
    rec, _speed = recruit_reads_fast(data, fq1, fq2, rp, seed=seed)
    t1 = time.perf_counter()
    panel = [(rec[l.name][0], rec[l.name][1], data[l.name].contig_set,
              data[l.name].kmer_counts) for l in loci]
    built = build_all_alignments_panel(panel, bg, edit_cache, params)
    t2 = time.perf_counter()
    entries = [dict(locus=data[l.name], read_pairs=rec[l.name][0],
                    names=rec[l.name][1], tag=l.name, prebuilt=built[i])
               for i, l in enumerate(loci)]
    solved = genotype_panel(entries, bg, params=params, scheme=scheme,
                            seed=seed)
    calls = [tuple(sorted(res.genotypes[0])) for res, _ in solved]
    t3 = time.perf_counter()
    return dict(recruit=round(t1 - t0, 2), align=round(t2 - t1, 2),
                solve=round(t3 - t2, 2), total=round(t3 - t0, 2)), calls


truth = [tuple(sorted(l.true_genotype)) for l in loci]
best = None
for p in range(PASSES):
    ts, calls = one_pass(p + 1)
    acc = sum(c == t for c, t in zip(calls, truth))
    ts["exact"] = f"{acc}/{N_LOCI}"
    ts["pairs_per_s"] = round(total / ts["total"])
    print(json.dumps(dict(stage=f"pass{p}", **ts)), flush=True)
    if best is None or ts["total"] < best["total"]:
        best = ts
print(json.dumps(dict(stage="best", **best)), flush=True)
