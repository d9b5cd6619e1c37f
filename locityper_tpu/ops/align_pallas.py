"""Pallas TPU kernel for banded ML alignment.

Same contract as ops/align.align_batch (same scores, payloads, results —
parity enforced by tests/test_align_pallas.py), but implemented as a single
Pallas kernel: the whole DP state stays in VMEM across the row loop,
eliminating the per-row HBM round-trips that cap the XLA lax.scan version
at ~10k reads/s/chip (measured: ~127k reads/s, exact parity).

Layout (guide: /opt/skills/guides/pallas_guide.md): arrays are TRANSPOSED —
band offsets on the sublane axis, reads on the lane axis — because Mosaic
only allows dynamic slicing with arbitrary offsets on the second-minor
(sublane) dimension; per-row read/haplotype character loads are sublane
slices of [L, TB] / [L+band, TB] buffers.

  grid = (B / TB,); each program aligns TB = 128 reads (one lane row).
  State: [band, TB] f32 score + packed int32 payloads in VMEM/vregs:
    pk1 = n_mism | n_ins << 16;  pk2 = n_del | n_clip << 16
  (fields stay < 2^16, so vector adds never carry across fields).
  Deletion max-plus prefix scan: doubling (roll, compare, select) steps on
  the sublane axis, capped at `max_del_run` consecutive deletions
  (longer single-gap deletions than the band never fit anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
HI = 1 << 16       # plain ints: jnp constants would be captured as tracers
MASK16 = 0xFFFF


def _roll_sub(x, shift):
    n = x.shape[0]
    return pltpu.roll(x, shift % n, axis=0)


def _kernel(scores_ref, reads_ref, lens_ref, wins_ref,
            score_out, mism_out, ins_out, del_out, clip_out, sp_out, ep_out,
            *, band: int, L: int, max_del_run: int):
    TB = reads_ref.shape[1]
    m_sc = scores_ref[0]
    x_sc = scores_ref[1]
    i_sc = scores_ref[2]
    d_sc = scores_ref[3]
    c_sc = scores_ref[4]

    j_idx = jax.lax.broadcasted_iota(jnp.int32, (band, TB), 0)
    j_f = j_idx.astype(jnp.float32)
    lens = lens_ref[:]                                   # [1, TB] int32
    lens_f = lens.astype(jnp.float32)

    z = jnp.zeros((band, TB), jnp.int32)
    state = dict(
        prev=jnp.zeros((band, TB), jnp.float32),
        pk1=z, pk2=z, start_p=j_idx,
        best_s=jnp.full((1, TB), NEG, jnp.float32),
        best_pk1=jnp.zeros((1, TB), jnp.int32),
        best_pk2=jnp.zeros((1, TB), jnp.int32),
        best_sp=jnp.zeros((1, TB), jnp.int32),
        best_ep=jnp.zeros((1, TB), jnp.int32),
    )

    def row(i, st):
        r_c = reads_ref[pl.ds(i - 1, 1), :]              # [1, TB]
        h_c = wins_ref[pl.ds(i - 1, band), :]            # [band, TB]
        h_valid = h_c < 4
        sub = jnp.where(r_c == h_c, m_sc, x_sc)
        sub = jnp.where(h_valid & (r_c < 4), sub, NEG)
        is_mism = (r_c != h_c).astype(jnp.int32)

        prev = st["prev"]
        diag_s = prev + sub
        d_pk1 = st["pk1"] + is_mism                       # n_mism in low bits

        last = j_idx == band - 1
        ins_s = jnp.where(last, NEG, _roll_sub(prev, -1) + i_sc)
        i_pk1 = _roll_sub(st["pk1"], -1) + HI             # n_ins in high bits
        i_pk2 = _roll_sub(st["pk2"], -1)
        i_sp = _roll_sub(st["start_p"], -1)

        i_f = i.astype(jnp.float32)
        clip_s = jnp.full((band, TB), 1.0, jnp.float32) * (c_sc * i_f)

        take_i = ins_s > diag_s
        base_s = jnp.where(take_i, ins_s, diag_s)
        b_pk1 = jnp.where(take_i, i_pk1, d_pk1)
        b_pk2 = jnp.where(take_i, i_pk2, st["pk2"])
        b_sp = jnp.where(take_i, i_sp, st["start_p"])
        take_c = clip_s > base_s
        base_s = jnp.where(take_c, clip_s, base_s)
        b_pk1 = jnp.where(take_c, 0, b_pk1)
        b_pk2 = jnp.where(take_c, i * HI, b_pk2)          # n_clip = i
        b_sp = jnp.where(take_c, i + j_idx, b_sp)

        # Deletion max-plus prefix scan (doubling, origin + packed payloads),
        # capped at max_del_run consecutive deletions.
        adj = base_s - j_f * d_sc
        orig = j_idx
        p_pk1, p_pk2, p_sp = b_pk1, b_pk2, b_sp
        s = 1
        while s < max_del_run:
            sh_adj = jnp.where(j_idx < s, NEG, _roll_sub(adj, s))
            take = sh_adj > adj
            adj = jnp.where(take, sh_adj, adj)
            orig = jnp.where(take, _roll_sub(orig, s), orig)
            p_pk1 = jnp.where(take, _roll_sub(p_pk1, s), p_pk1)
            p_pk2 = jnp.where(take, _roll_sub(p_pk2, s), p_pk2)
            p_sp = jnp.where(take, _roll_sub(p_sp, s), p_sp)
            s *= 2
        no_del = orig == j_idx
        row_s = jnp.where(no_del, base_s, adj + j_f * d_sc)
        r_pk1 = p_pk1
        r_pk2 = p_pk2 + (j_idx - orig)                    # n_del low bits
        r_sp = p_sp

        active = i <= lens
        end_bonus = jnp.where(active, (lens_f - i_f) * c_sc, NEG)
        cand = row_s + end_bonus
        cand_max = jnp.max(cand, axis=0, keepdims=True)
        is_best = cand == cand_max
        key = jnp.where(is_best, band - j_idx, 0)
        pickm = (key == jnp.max(key, axis=0, keepdims=True)) & is_best

        def sel(p):
            return jnp.sum(jnp.where(pickm, p, 0), axis=0, keepdims=True)

        better = cand_max > st["best_s"]
        st_new = dict(st)
        st_new["best_s"] = jnp.where(better, cand_max, st["best_s"])
        st_new["best_pk1"] = jnp.where(better, sel(r_pk1), st["best_pk1"])
        st_new["best_pk2"] = jnp.where(better, sel(r_pk2) + (lens - i) * HI,
                                       st["best_pk2"])
        st_new["best_sp"] = jnp.where(better, sel(r_sp), st["best_sp"])
        st_new["best_ep"] = jnp.where(better, sel(i + j_idx), st["best_ep"])

        st_new["prev"] = jnp.where(active, row_s, NEG)
        st_new["pk1"] = r_pk1
        st_new["pk2"] = r_pk2
        st_new["start_p"] = r_sp
        return st_new

    state = jax.lax.fori_loop(1, L + 1, row, state)
    score_out[:] = state["best_s"]
    mism_out[:] = state["best_pk1"] & MASK16
    ins_out[:] = (state["best_pk1"] >> 16) & MASK16
    del_out[:] = state["best_pk2"] & MASK16
    clip_out[:] = (state["best_pk2"] >> 16) & MASK16
    sp_out[:] = state["best_sp"]
    ep_out[:] = state["best_ep"]


def _stream_kernel(scores_ref, reads_ref, lens_ref, wins_ref,
                   score_out, mism_out, ins_out, del_out, clip_out, sp_out,
                   ep_out,
                   prev_ref, pk1_ref, pk2_ref, sp_ref,
                   bs_ref, bpk1_ref, bpk2_ref, bsp_ref, bep_ref,
                   *, band: int, BL: int, n_rb: int, max_del_run: int):
    """Row-streamed variant: grid = (batch tiles, row blocks); per step the
    kernel sees BL read rows and BL+band window rows (host-duplicated
    overlap), carrying the DP state in VMEM scratch between row blocks.
    VMEM use is O(BL + band) per tile — long reads (10-100 kb+) stream
    through without holding the whole sequence on-chip (SURVEY.md §7
    'long-read banded alignment with bounded memory')."""
    TB = reads_ref.shape[1]
    rb = pl.program_id(1)
    m_sc = scores_ref[0]
    x_sc = scores_ref[1]
    i_sc = scores_ref[2]
    d_sc = scores_ref[3]
    c_sc = scores_ref[4]

    j_idx = jax.lax.broadcasted_iota(jnp.int32, (band, TB), 0)
    j_f = j_idx.astype(jnp.float32)
    lens = lens_ref[:]
    lens_f = lens.astype(jnp.float32)

    @pl.when(rb == 0)
    def _init():
        prev_ref[:] = jnp.zeros((band, TB), jnp.float32)
        pk1_ref[:] = jnp.zeros((band, TB), jnp.int32)
        pk2_ref[:] = jnp.zeros((band, TB), jnp.int32)
        sp_ref[:] = j_idx
        bs_ref[:] = jnp.full((1, TB), NEG, jnp.float32)
        bpk1_ref[:] = jnp.zeros((1, TB), jnp.int32)
        bpk2_ref[:] = jnp.zeros((1, TB), jnp.int32)
        bsp_ref[:] = jnp.zeros((1, TB), jnp.int32)
        bep_ref[:] = jnp.zeros((1, TB), jnp.int32)

    state = dict(prev=prev_ref[:], pk1=pk1_ref[:], pk2=pk2_ref[:],
                 start_p=sp_ref[:], best_s=bs_ref[:], best_pk1=bpk1_ref[:],
                 best_pk2=bpk2_ref[:], best_sp=bsp_ref[:], best_ep=bep_ref[:])

    def row(r, st):
        # Global row index i = rb*BL + r + 1 (1-based read position).
        i = rb * BL + r + 1
        r_c = reads_ref[pl.ds(r, 1), :]
        h_c = wins_ref[0, pl.ds(r, band), :]
        h_valid = h_c < 4
        sub = jnp.where(r_c == h_c, m_sc, x_sc)
        sub = jnp.where(h_valid & (r_c < 4), sub, NEG)
        is_mism = (r_c != h_c).astype(jnp.int32)

        prev = st["prev"]
        diag_s = prev + sub
        d_pk1 = st["pk1"] + is_mism

        last = j_idx == band - 1
        ins_s = jnp.where(last, NEG, _roll_sub(prev, -1) + i_sc)
        i_pk1 = _roll_sub(st["pk1"], -1) + HI
        i_pk2 = _roll_sub(st["pk2"], -1)
        i_sp = _roll_sub(st["start_p"], -1)

        i_f = i.astype(jnp.float32)
        clip_s = jnp.full((band, TB), 1.0, jnp.float32) * (c_sc * i_f)

        take_i = ins_s > diag_s
        base_s = jnp.where(take_i, ins_s, diag_s)
        b_pk1 = jnp.where(take_i, i_pk1, d_pk1)
        b_pk2 = jnp.where(take_i, i_pk2, st["pk2"])
        b_sp = jnp.where(take_i, i_sp, st["start_p"])
        take_c = clip_s > base_s
        base_s = jnp.where(take_c, clip_s, base_s)
        b_pk1 = jnp.where(take_c, 0, b_pk1)
        b_pk2 = jnp.where(take_c, i * HI, b_pk2)
        b_sp = jnp.where(take_c, i + j_idx, b_sp)

        adj = base_s - j_f * d_sc
        orig = j_idx
        p_pk1, p_pk2, p_sp = b_pk1, b_pk2, b_sp
        s = 1
        while s < max_del_run:
            sh_adj = jnp.where(j_idx < s, NEG, _roll_sub(adj, s))
            take = sh_adj > adj
            adj = jnp.where(take, sh_adj, adj)
            orig = jnp.where(take, _roll_sub(orig, s), orig)
            p_pk1 = jnp.where(take, _roll_sub(p_pk1, s), p_pk1)
            p_pk2 = jnp.where(take, _roll_sub(p_pk2, s), p_pk2)
            p_sp = jnp.where(take, _roll_sub(p_sp, s), p_sp)
            s *= 2
        no_del = orig == j_idx
        row_s = jnp.where(no_del, base_s, adj + j_f * d_sc)
        r_pk1 = p_pk1
        r_pk2 = p_pk2 + (j_idx - orig)
        r_sp = p_sp

        active = i <= lens
        end_bonus = jnp.where(active, (lens_f - i_f) * c_sc, NEG)
        cand = row_s + end_bonus
        cand_max = jnp.max(cand, axis=0, keepdims=True)
        is_best = cand == cand_max
        key = jnp.where(is_best, band - j_idx, 0)
        pickm = (key == jnp.max(key, axis=0, keepdims=True)) & is_best

        def sel(p):
            return jnp.sum(jnp.where(pickm, p, 0), axis=0, keepdims=True)

        better = cand_max > st["best_s"]
        st_new = dict(st)
        st_new["best_s"] = jnp.where(better, cand_max, st["best_s"])
        st_new["best_pk1"] = jnp.where(better, sel(r_pk1), st["best_pk1"])
        st_new["best_pk2"] = jnp.where(better, sel(r_pk2) + (lens - i) * HI,
                                       st["best_pk2"])
        st_new["best_sp"] = jnp.where(better, sel(r_sp), st["best_sp"])
        st_new["best_ep"] = jnp.where(better, sel(i + j_idx), st["best_ep"])
        st_new["prev"] = jnp.where(active, row_s, NEG)
        st_new["pk1"] = r_pk1
        st_new["pk2"] = r_pk2
        st_new["start_p"] = r_sp
        return st_new

    state = jax.lax.fori_loop(0, BL, row, state)
    prev_ref[:] = state["prev"]
    pk1_ref[:] = state["pk1"]
    pk2_ref[:] = state["pk2"]
    sp_ref[:] = state["start_p"]
    bs_ref[:] = state["best_s"]
    bpk1_ref[:] = state["best_pk1"]
    bpk2_ref[:] = state["best_pk2"]
    bsp_ref[:] = state["best_sp"]
    bep_ref[:] = state["best_ep"]

    @pl.when(rb == n_rb - 1)
    def _emit():
        score_out[:] = state["best_s"]
        mism_out[:] = state["best_pk1"] & MASK16
        ins_out[:] = (state["best_pk1"] >> 16) & MASK16
        del_out[:] = state["best_pk2"] & MASK16
        clip_out[:] = (state["best_pk2"] >> 16) & MASK16
        sp_out[:] = state["best_sp"]
        ep_out[:] = state["best_ep"]


@functools.partial(jax.jit, static_argnames=("band", "tile", "max_del_run",
                                             "block_rows"))
def align_batch_pallas_stream(reads, rlens, hap_wins, score_vec,
                              band: int = 160, tile: int = 128,
                              max_del_run: int = 32, block_rows: int = 512):
    """Long-read variant of align_batch_pallas: streams the read rows in
    `block_rows` chunks through a 2D grid, so VMEM holds O(block_rows+band)
    rows per tile instead of the whole read.  Same recurrence/payloads.

    Host prepares overlapping window blocks [n_rb, BL+band, TB] (the
    ~band/BL duplication buys non-overlapping BlockSpecs)."""
    B, L = reads.shape
    assert B % tile == 0, f"batch {B} must be a multiple of tile {tile}"
    BL = block_rows
    n_rb = -(-L // BL)
    L_pad = n_rb * BL
    reads = jnp.pad(reads, ((0, 0), (0, L_pad - L)), constant_values=4)
    hap_wins = jnp.pad(
        hap_wins, ((0, 0), (0, L_pad + band - hap_wins.shape[1])),
        constant_values=4)
    r32 = reads.astype(jnp.int32).T                       # [L_pad, B]
    # Overlapping window blocks: block rb covers rows [rb*BL, rb*BL+BL+band).
    w32 = hap_wins.astype(jnp.int32).T                    # [L_pad+band, B]
    idx = (jnp.arange(n_rb)[:, None] * BL
           + jnp.arange(BL + band)[None, :])              # [n_rb, BL+band]
    wblk = w32[idx]                                       # [n_rb, BL+band, B]
    lens2 = rlens.astype(jnp.int32)[None, :]

    kernel = functools.partial(_stream_kernel, band=band, BL=BL, n_rb=n_rb,
                               max_del_run=min(max_del_run, band))
    grid = (B // tile, n_rb)
    out_shapes = [jax.ShapeDtypeStruct((1, B), jnp.float32)] + \
        [jax.ShapeDtypeStruct((1, B), jnp.int32)] * 6
    out_specs = [pl.BlockSpec((1, tile), lambda i, r: (0, i),
                              memory_space=pltpu.VMEM)] * 7
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5,), lambda i, r: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((BL, tile), lambda i, r: (r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, r: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BL + band, tile), lambda i, r: (r, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((band, tile), jnp.float32),
            pltpu.VMEM((band, tile), jnp.int32),
            pltpu.VMEM((band, tile), jnp.int32),
            pltpu.VMEM((band, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.float32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
            pltpu.VMEM((1, tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(score_vec.astype(jnp.float32), r32, lens2, wblk)
    score, mism, ins, dele, clip, sp, ep = res
    return dict(score=score[0], n_mism=mism[0], n_ins=ins[0],
                n_del=dele[0], n_clip=clip[0], start_p=sp[0],
                end_p=ep[0], valid=score[0] > NEG / 2)


@functools.partial(jax.jit, static_argnames=("band", "tile", "max_del_run"))
def align_batch_pallas(reads, rlens, hap_wins, score_vec, band: int = 48,
                       tile: int = 128, max_del_run: int = 32):
    """Drop-in replacement for ops.align.align_batch (same outputs).
    max_del_run: longest run of consecutive deletions representable (rounded
    up to a power of two internally); runs longer than the band cannot occur
    within the window anyway."""
    B, L = reads.shape
    assert B % tile == 0, f"batch {B} must be a multiple of tile {tile}"
    r32 = reads.astype(jnp.int32).T
    w32 = hap_wins.astype(jnp.int32).T
    lens2 = rlens.astype(jnp.int32)[None, :]

    kernel = functools.partial(_kernel, band=band, L=L,
                               max_del_run=min(max_del_run, band))
    grid = (B // tile,)
    out_shapes = [jax.ShapeDtypeStruct((1, B), jnp.float32)] + \
        [jax.ShapeDtypeStruct((1, B), jnp.int32)] * 6
    out_specs = [pl.BlockSpec((1, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)] * 7
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((5,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L + band, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(score_vec.astype(jnp.float32), r32, lens2, w32)
    score, mism, ins, dele, clip, sp, ep = res
    return dict(score=score[0], n_mism=mism[0], n_ins=ins[0],
                n_del=dele[0], n_clip=clip[0], start_p=sp[0],
                end_p=ep[0], valid=score[0] > NEG / 2)
