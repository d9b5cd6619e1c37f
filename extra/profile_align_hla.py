"""Align-phase breakdown at HLA scale (round 5): candidate voting /
concat / device / post for 5 x 200-hap loci — the warm align leg is
~10-15 s and co-dominates the HLA wall with solve.

Usage: python extra/profile_align_hla.py [n_loci] [n_haps] [rounds]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from locityper_tpu.cli import _enable_compile_cache  # noqa: E402
_enable_compile_cache()
from locityper_tpu.utils.malloc import tune_host_allocator  # noqa: E402
tune_host_allocator()

import bench  # noqa: E402
from extra.hla_scale import build_panel  # noqa: E402
from locityper_tpu.bg.err_prof import EditDistCache, EditThresh  # noqa: E402
from locityper_tpu.commands.genotype import recruit_reads_fast  # noqa: E402
from locityper_tpu.model import Params  # noqa: E402
from locityper_tpu.model.locs import (  # noqa: E402
    _build_all_alignments_gen, run_align_batches)
from locityper_tpu.seq.fastx import Read, write_fastq  # noqa: E402
from locityper_tpu.seq.recruit import RecruitParams  # noqa: E402


class Args:
    n_loci = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_haps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_clades = 10
    within_div = 0.003
    length = 4000
    depth = 15.0
    seed = 0


ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

loci, data, (names, reads1, reads2) = build_panel(Args)
import tempfile
tmpd = Path(tempfile.mkdtemp(prefix="prof_hla_"))
fq1, fq2 = tmpd / "r1.fq", tmpd / "r2.fq"
with open(fq1, "w") as f1, open(fq2, "w") as f2:
    for n, a, b in zip(names, reads1, reads2):
        write_fastq(f1, Read(n, a))
        write_fastq(f2, Read(n, b))

bg = bench._make_bg(depth_per_hap=Args.depth)
tech = bg.seq_info.technology
params = Params(unmapped_penalty=tech.default_unmapped_penalty())
params.set_tweak_size(bg.depth.window_size)
if params.band is None:
    params.band = 48
edit_cache = EditDistCache(bg.err_prof, EditThresh.default_for(tech))
rp = RecruitParams(match_frac=tech.default_match_frac(True))
rec, _ = recruit_reads_fast(data, str(fq1), str(fq2), rp, seed=1)
panel = [(rec[l.name][0], rec[l.name][1], data[l.name].contig_set,
          data[l.name].kmer_counts) for l in loci]
print(json.dumps(dict(stage="recruited",
                      pairs=sum(len(p[0]) for p in panel))), flush=True)


def one_round():
    ts = {}
    max_read = max((m.size for item in panel for pair in item[0]
                    for m in pair if m is not None), default=64)
    L = -(-max_read // 64) * 64
    t0 = time.perf_counter()
    gens, reqs = [], []
    for read_pairs, names_, contig_set, kmer_counts in panel:
        g = _build_all_alignments_gen(read_pairs, names_, contig_set,
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
    _ = [g.send(results[i]) for i, g in enumerate(gens)]
    ts["post"] = time.perf_counter() - t0
    ts["total"] = ts["cand"] + ts["concat"] + ts["device"] + ts["post"]
    return ts


for r in range(ROUNDS):
    ts = one_round()
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in ts.items()}), flush=True)
