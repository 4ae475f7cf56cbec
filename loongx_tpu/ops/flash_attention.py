"""Pallas TPU flash-attention kernel for the unified [txt|img|cond] sequence.

This is the hot kernel of the framework (SURVEY §2c row 1): the reference
leans on cuDNN SDPA with a materialised [S, S] mask / bias tensor
(/root/reference/src/flux/block.py:106-131); here the block structure is
computed *inside* the kernel from one scalar boundary (``cond_start``), so no
mask is ever materialised and HBM traffic is exactly Q, K, V and O.

Supported modes (static):
  * ``union``        — full bidirectional attention;
  * ``no_union``     — cond <-> non-cond attention blocked both ways;
  * ``independent``  — cond queries blind to non-cond keys;
plus an additive log-bias on the cond<->non-cond blocks driven by a traced
scalar (``c_factor``; condition-strength, reference block.py:121-128).

Standard online-softmax tiling: fp32 running max / sum / accumulator in VMEM
scratch, bf16 matmul inputs, fp32 MXU accumulation.  RoPE can be fused into
the kernel (``rope=`` — the rotation partner is a tiny antisymmetric MXU
matmul, no lane shuffles).  Sequence lengths are padded to the block size;
padded keys are masked, padded query rows are sliced away by the wrapper.

Differentiable via ``jax.custom_vjp``: mask modes use Pallas dKV + dQ
backward kernels that rebuild probabilities from the saved (m, l) statistics
(never materialising [S, S] in HBM); the inference-only ``cfactor`` mode
falls back to exact XLA recompute because its bias needs a gradient.

Measured on v5e at the FLUX operating point (S=2560, D=128, 24 heads):
138 TF/s with the default `auto_blocks` policy — equal to the chip's
measured matmul roofline; XLA SDPA measures ~11 TF/s on the same shapes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
# v5e has 128 MB VMEM; the compiler's default scoped limit is 16 MB — raise
# it so the measured-optimal large tiles (and residual outputs) fit.
VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def use_int8_attn() -> bool:
    """Serving knob: LOONGX_INT8_ATTN=1 computes the QK^T logits on the
    int8 MXU (per-query-row / per-key-tile dynamic scales, fp32 softmax and
    bf16 PV unchanged) — ~2x the bf16 MXU rate on the score matmul.  Adds
    ~1% RMS logit noise on top of bf16; OFF by default — measure end-to-end
    agreement (benchmarks/) before serving with it.  Read at call time (the
    wrapper passes it as a static arg, so it participates in jit caching).
    Serving-only: gradients recompute probabilities from bf16 scores."""
    import os

    return os.environ.get("LOONGX_INT8_ATTN", "0") == "1"


# Forward block caps (with VMEM_LIMIT raised, big tiles win: measured on
# v5e at S=2560 — (512,512): 76 TF/s, (1280,1280): 121 TF/s,
# (1280,2560): 138 TF/s = the chip's matmul roofline).  Full-row kv tiles
# turn the online softmax into one pass; block_q caps the fp32 scores tile.
MAX_BLOCK_Q = 1280
MAX_BLOCK_K = 2560
# backward tiles hold two [bq, bk] fp32 temporaries (p and dp) -> smaller cap
MAX_BLOCK_BWD = 896
# full-row-kv cap on the [512, S] fp32 scores tile.  The kernel's true
# working set is ~2.5-3x this tile (fp32 exp(p), its bf16 cast, the
# double-buffered full-row bf16 K/V strips, fp32 rope tiles, the cached
# int8 K) — 24 MB scores (S up to 12288) keeps the total under the 100 MB
# Mosaic budget with margin; measured good at S=8704 (the 1024 px point).
# Longer sequences take the narrow-q online-softmax tiling instead.
FULLROW_SCORES_BYTES = 24 * 1024 * 1024


def _auto_blocks(seq_len: int, cap: int) -> Tuple[int, int]:
    s128 = _round_up(seq_len, LANES)
    if s128 <= cap:
        return s128, s128
    ntiles = 2
    while True:
        b = _round_up(-(-s128 // ntiles), LANES)
        if b <= cap:
            return b, b
        ntiles += 1


def auto_blocks(seq_len: int) -> Tuple[int, int]:
    """(block_q, block_k) policy: prefer a single full-row kv tile (online
    softmax degenerates to one exact pass), with block_q | block_k so one
    padded length serves both grid axes."""
    s128 = _round_up(seq_len, LANES)
    if s128 <= MAX_BLOCK_K:
        # one (S, S) tile: exact single-pass softmax, no online rescale.
        # Measured at the 512px point (S=2560): 131 TF/s vs 124 for
        # (1280, 2560) — the fp32 scores tile (26 MB at 2560) fits the
        # raised VMEM budget (benchmarks/flash_tile_sweep.py)
        return s128, s128
    # long sequences: FULL-ROW kv tiles — one exact softmax pass per q tile
    # (no online rescale), and the int8-QK scratch cache quantizes K once
    # per (b, h).  Measured 144.9 vs 138.0 TF/s over the previous 512x4352
    # online-softmax tiles at S=8704 (the 1024px point; wider 1024-row q
    # tiles are invalid there — 1024 does not divide 8704), and 147.7 vs
    # 140.2 over the old (1280, 2560) square tiling at S=5120 (the 768px
    # point — exact-2560-multiple lengths used to early-exit to square
    # tiles; SWEEP_S=5120 benchmarks/flash_long_s_sweep.py refuted that).
    if 512 * s128 * 4 <= FULLROW_SCORES_BYTES:
        # 128-row q tiles would shrink the MXU M-dim 4x below anything
        # measured — lengths divisible by none of these fall through to
        # the (measured) online-softmax tiling instead
        for bq in (512, 384, 256):
            if s128 % bq == 0:  # the grid needs block_q | padded length
                return bq, s128
    if s128 % MAX_BLOCK_K == 0:
        # full-row scores tile too big (or no dividing q tile): exact-2560-
        # multiple lengths tile squarely with no padding
        return MAX_BLOCK_Q, MAX_BLOCK_K
    # scores tile too big for full-row: narrow-q x wide-kv online softmax
    # (measured 126 vs 117 TF/s over square 1280 tiles at S=8704)
    long_bk = 4352  # 512x4352 fp32 scores tile = 8.9 MB VMEM
    ntiles = -(-s128 // long_bk)
    bk = _round_up(-(-s128 // ntiles), LANES)
    s_pad = _round_up(s128, bk)
    for bq in (512, 384, 256, LANES):
        if s_pad % bq == 0:
            return bq, bk
    raise AssertionError(
        f"unreachable: s_pad={s_pad} is a multiple of LANES"
    )  # bk | s_pad and LANES | bk, so the bq=LANES candidate always divides


def _covers(block: int, s: int, s_pad: int) -> bool:
    """Does a floor-truncated grid of `block`-row tiles over `s_pad` reach
    every REAL row of S=s?  The single source of the coverage invariant —
    `_check_grid_coverage` (trace-time guard) and `_bwd_blocks` (fallback
    decision) must agree or the fallback can approve a pair the kernel then
    rejects."""
    return (s_pad // block) * block >= s


def _check_grid_coverage(block_q: int, block_k: int, s: int, s_pad: int):
    """Floor-truncated grids may skip PADDING rows (benign — the backward
    mixes its smaller block cap with the forward's, e.g. (512, 896) over
    s_pad=8960 covers exactly the 8704 real rows) but must never skip REAL
    rows: a non-dividing block size that drops real rows silently zeroes
    their outputs (and once made a tile-sweep timing look fast)."""
    if not (_covers(block_q, s, s_pad) and _covers(block_k, s, s_pad)):
        q_cover = (s_pad // block_q) * block_q
        kv_cover = (s_pad // block_k) * block_k
        raise ValueError(
            f"block_q={block_q}, block_k={block_k} grids cover only "
            f"{q_cover}/{kv_cover} rows of S={s} (padded {s_pad}) — real "
            f"rows would be dropped"
        )


def _pair_swap_matrix(d: int) -> jnp.ndarray:
    """Antisymmetric [D, D] matrix R with (x @ R)[2k] = -x[2k+1],
    (x @ R)[2k+1] = x[2k] — the interleaved-pair rotation partner used by
    RoPE, expressed as a tiny MXU matmul (lane shuffles are slow on TPU)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    plus = (row % 2 == 0) & (col == row + 1)  # x[2k] -> out[2k+1]
    minus = (row % 2 == 1) & (col == row - 1)  # x[2k+1] -> -out[2k]
    return jnp.where(plus, 1.0, jnp.where(minus, -1.0, 0.0)).astype(
        jnp.float32
    )


def _rope_rotate(x, cos, sin, r):
    """x [S, D] (any float dtype) -> RoPE-rotated, fp32 math, x.dtype out."""
    xf = x.astype(jnp.float32)
    xr = jax.lax.dot(xf, r, preferred_element_type=jnp.float32)
    return (xf * cos + xr * sin).astype(x.dtype)


def _tile(ref, bshd: bool):
    """Extract the [block_s, D] tile from a q/k/v/o ref in either layout:
    [1, 1, block_s, D] (bhsd) or [1, block_s, D] (bshd — the array is viewed
    [B, S, H*D] and the BlockSpec slices head h's D-wide column strip, so the
    last two block dims stay (block_s, D) as Mosaic requires)."""
    return ref[0] if bshd else ref[0, 0]


def _fwd_kernel(
    cbias_ref,  # SMEM (1, 1) fp32: log(c_factor) (0 when unused)
    q_ref, k_ref, v_ref,  # VMEM tiles
    cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,  # VMEM rope tiles (or dummies)
    *refs,  # outputs (o [+ m_out, l_out]) then scratch (m, l, acc)
    scale: float,
    mode: str,
    use_cfactor: bool,
    use_rope: bool,
    save_residuals: bool,
    cond_start: int,
    seq_len: int,
    block_q: int,
    block_k: int,
    num_kv: int,
    bshd: bool = False,
    int8_qk: bool = False,
    int8_cache: bool = False,
    pv_chunks: int = 1,
):
    if int8_cache:
        *refs, qq_ref, qs_ref, kq_ref, ks_ref = refs
    if save_residuals:
        o_ref, m_out_ref, l_out_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    kv_idx = pl.program_id(3)
    q_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _quant(x, per_row: bool):
        xf = x.astype(jnp.float32)
        a = (
            jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            if per_row else jnp.max(jnp.abs(xf))
        )
        sc = jnp.where(a == 0, 1.0, a / 127.0)
        return jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8), sc

    if int8_qk and int8_cache:
        # Multi-tile grids (long S): rope-rotate + quantize each q tile
        # ONCE per kv sweep and each k tile ONCE per grid (round-2 measured
        # a 14% regression from per-step re-quantization — the reason int8
        # scores were auto-disabled at 1024px).  The quantized tiles live
        # in scratch across grid steps; the q axis is sequential
        # ("arbitrary") so every core fills its own k cache at q_idx == 0.
        r = _pair_swap_matrix(q_ref.shape[-1]) if use_rope else None

        @pl.when(kv_idx == 0)
        def _cache_q():
            qt = _tile(q_ref, bshd)
            if use_rope:
                qt = _rope_rotate(qt, cos_q_ref[...], sin_q_ref[...], r)
            qq, qsc = _quant(qt, per_row=True)
            qq_ref[...] = qq
            qs_ref[...] = jnp.broadcast_to(qsc, qs_ref.shape)

        @pl.when(q_idx == 0)
        def _cache_k():
            kt = _tile(k_ref, bshd)
            if use_rope:
                kt = _rope_rotate(kt, cos_k_ref[...], sin_k_ref[...], r)
            kq, ksc = _quant(kt, per_row=False)
            kq_ref[pl.ds(kv_idx * block_k, block_k), :] = kq
            ks_ref[pl.ds(kv_idx, 1), :] = jnp.full(
                (1, ks_ref.shape[-1]), ksc, jnp.float32
            )

        q_q = qq_ref[...]
        q_scale = qs_ref[:, 0:1]
        k_q = kq_ref[pl.ds(kv_idx * block_k, block_k), :]
        k_scale = ks_ref[pl.ds(kv_idx, 1), 0:1]
        s = jax.lax.dot_general(
            q_q, k_q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (q_scale * k_scale[0, 0])
    else:
        q = _tile(q_ref, bshd)  # [block_q, D]
        k = _tile(k_ref, bshd)  # [block_k, D]
        if use_rope:
            r = _pair_swap_matrix(q.shape[-1])
            q = _rope_rotate(q, cos_q_ref[...], sin_q_ref[...], r)
            k = _rope_rotate(k, cos_k_ref[...], sin_k_ref[...], r)
        if int8_qk:
            # int8 MXU scores: per-query-row scales (broadcast over columns
            # — no transpose) x one per-key-tile scalar (post-RMS-norm key
            # rows are near-homogeneous, so a tile scalar costs <0.5%
            # extra noise)
            q_q, q_scale = _quant(q, per_row=True)
            k_q, k_scale = _quant(k, per_row=False)
            s = jax.lax.dot_general(
                q_q, k_q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (q_scale * k_scale)
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [block_q, block_k]
    s = s * scale

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + q_idx * block_q
    )
    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        + kv_idx * block_k
    )
    # Padding mask (keys beyond the real sequence).
    if num_kv * block_k != seq_len:
        s = jnp.where(col_ids < seq_len, s, MASK_VALUE)

    row_cond = row_ids >= cond_start
    col_cond = col_ids >= cond_start
    if use_cfactor:
        # Additive log-bias replaces masks (reference precedence).
        s = s + jnp.where(row_cond != col_cond, cbias_ref[0, 0], 0.0)
    elif mode == "no_union":
        s = jnp.where(row_cond == col_cond, s, MASK_VALUE)
    elif mode == "independent":
        s = jnp.where(row_cond & ~col_cond, MASK_VALUE, s)

    m_prev = m_ref[...]  # [block_q, LANES]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast to LANES
    alpha = jnp.exp(m_prev - m_next)
    m_ref[...] = m_next

    v = _tile(v_ref, bshd)  # [block_k, D]
    if pv_chunks > 1:
        # Software-pipelined softmax+PV: the kernel's dependency chain
        # QK (MXU) -> exp (VPU) -> PV (MXU) serialises the units, leaving
        # the MXU idle through the whole [block_q, block_k] exp.  Chunking
        # the key axis and issuing chunk i's exp (VPU) independent of chunk
        # i-1's PV matmul (MXU) lets Mosaic overlap the two units; the
        # softmax stays EXACT — the row max is still taken over the full
        # row before any chunk exponentiates (same numbers, reordered).
        ck = block_k // pv_chunks
        acc = acc_ref[...] * alpha[:, :1]
        l_add = jnp.zeros((block_q, 1), jnp.float32)
        prev_p = prev_v = None
        for i in range(pv_chunks):
            s_i = jax.lax.slice_in_dim(s, i * ck, (i + 1) * ck, axis=1)
            p_i = jnp.exp(s_i - m_next[:, :1])
            l_add = l_add + jnp.sum(p_i, axis=1, keepdims=True)
            if prev_p is not None:
                acc = acc + jax.lax.dot(
                    prev_p, prev_v, preferred_element_type=jnp.float32
                )
            prev_p = p_i.astype(v.dtype)
            prev_v = jax.lax.slice_in_dim(v, i * ck, (i + 1) * ck, axis=0)
        acc = acc + jax.lax.dot(
            prev_p, prev_v, preferred_element_type=jnp.float32
        )
        acc_ref[...] = acc
        l_ref[...] = l_prev * alpha + l_add
    else:
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # [block_q, D]
        acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l_final = l_ref[...][:, :1]
        safe_l = jnp.where(l_final == 0.0, 1.0, l_final)
        o = (acc_ref[...] / safe_l).astype(o_ref.dtype)
        if bshd:
            o_ref[0] = o
        else:
            o_ref[0, 0] = o
        if save_residuals:
            # stats stay [B, H, S, LANES] in both layouts
            m_out_ref[0, 0] = m_ref[...]
            l_out_ref[0, 0] = l_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cond_start", "mode", "block_q", "block_k", "use_rope",
        "save_residuals", "interpret", "bshd", "int8_qk", "pv_chunks",
    ),
)
def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cbias: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cond_start: int,
    mode: str,
    block_q: int,
    block_k: int,
    use_rope: bool,
    interpret: bool,
    save_residuals: bool = False,
    bshd: bool = False,
    int8_qk: bool = False,
    pv_chunks: int = 1,
):
    if bshd:
        b, s, h, d = q.shape
        s_axis = 1
    else:
        b, h, s, d = q.shape
        s_axis = 2
    scale = 1.0 / math.sqrt(d)
    use_cfactor = mode == "cfactor"

    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        pad = [(0, 0)] * 4
        pad[s_axis] = (0, s_pad - s)
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if use_rope:
            cos = jnp.pad(cos, [(0, s_pad - s), (0, 0)])
            sin = jnp.pad(sin, [(0, s_pad - s), (0, 0)])
    num_q = s_pad // block_q
    num_kv = s_pad // block_k
    _check_grid_coverage(block_q, block_k, s, s_pad)
    if pv_chunks > 1 and (
        block_k % pv_chunks or (block_k // pv_chunks) % LANES
    ):
        raise ValueError(
            f"pv_chunks={pv_chunks} must split block_k={block_k} into "
            f"lane-aligned ({LANES}) chunks"
        )
    # Multi-tile grids quantize via scratch caches (each q tile once per kv
    # sweep, each k tile once per grid) — round 2 re-quantized per step and
    # had to auto-disable int8 scores off the single-(S,S)-tile policy
    # (measured S=8704: 9.39 ms int8 vs 8.26 bf16; now cached).
    int8_cache = int8_qk and (num_q > 1 or num_kv > 1)
    if bshd:
        # view as [B, S, H*D]: head h is the D-wide column strip h*D:(h+1)*D,
        # sliced by the BlockSpec index maps (free bitcast, no transpose)
        q = q.reshape(b, s_pad, h * d)
        k = k.reshape(b, s_pad, h * d)
        v = v.reshape(b, s_pad, h * d)

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        mode=mode,
        use_cfactor=use_cfactor,
        use_rope=use_rope,
        save_residuals=save_residuals,
        cond_start=cond_start,
        seq_len=s,
        block_q=block_q,
        block_k=block_k,
        num_kv=num_kv,
        bshd=bshd,
        int8_qk=int8_qk,
        int8_cache=int8_cache,
        pv_chunks=pv_chunks,
    )
    if use_rope:
        rope_specs = [
            pl.BlockSpec((block_q, d), lambda b, h, qi, ki: (qi, 0)),
            pl.BlockSpec((block_q, d), lambda b, h, qi, ki: (qi, 0)),
            pl.BlockSpec((block_k, d), lambda b, h, qi, ki: (ki, 0)),
            pl.BlockSpec((block_k, d), lambda b, h, qi, ki: (ki, 0)),
        ]
        rope_args = (cos, sin, cos, sin)
    else:
        # tiny dummies; kernel never reads them when use_rope=False
        dummy = jnp.zeros((8, d), jnp.float32)
        rope_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        rope_args = (dummy, dummy, dummy, dummy)

    if bshd:
        o_spec = pl.BlockSpec(
            (1, block_q, d), lambda b, h, qi, ki: (b, qi, h)
        )
        o_struct = jax.ShapeDtypeStruct((b, s_pad, h * d), q.dtype)
        q_spec = pl.BlockSpec(
            (1, block_q, d), lambda b, h, qi, ki: (b, qi, h)
        )
        kv_spec = pl.BlockSpec(
            (1, block_k, d), lambda b, h, qi, ki: (b, ki, h)
        )
    else:
        o_spec = pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)
        )
        o_struct = jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype)
        q_spec = pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, qi, ki: (b, h, qi, 0)
        )
        kv_spec = pl.BlockSpec(
            (1, 1, block_k, d), lambda b, h, qi, ki: (b, h, ki, 0)
        )
    stat_spec = pl.BlockSpec(
        (1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)
    )
    if save_residuals:
        out_specs = (o_spec, stat_spec, stat_spec)
        out_shape = (
            o_struct,
            jax.ShapeDtypeStruct((b, h, s_pad, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, h, s_pad, LANES), jnp.float32),
        )
    else:
        out_specs = o_spec
        out_shape = o_struct

    out = pl.pallas_call(
        kernel,
        grid=(b, h, num_q, num_kv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            q_spec,
            kv_spec,
            kv_spec,
            *rope_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ] + ([
            pltpu.VMEM((block_q, d), jnp.int8),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((s_pad, d), jnp.int8),
            pltpu.VMEM((max(num_kv, 8), LANES), jnp.float32),
        ] if int8_cache else []),
        compiler_params=pltpu.CompilerParams(
            # the k-quant scratch cache is filled at q_idx == 0 and reused
            # by later q tiles -> the q axis must stay sequential per core
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary", "arbitrary")
                if int8_cache
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(cbias, q, k, v, *rope_args)

    def _slice_s(x):
        if bshd:
            return x.reshape(b, s_pad, h, d)[:, :s]
        return x[:, :, :s, :]

    if save_residuals:
        o, m, l = out
        return _slice_s(o), m[:, :, :s, :1], l[:, :, :s, :1]
    return _slice_s(out)


# ---------------------------------------------------------------------------
# Backward kernels (dKV + dQ, Dao-style two-pass)
# ---------------------------------------------------------------------------


def _bwd_mask_and_p(
    s, row0, col0, m_tile, l_tile, *, scale, mode, cond_start, seq_len,
    block_q, block_k, padded,
):
    """Recompute normalised attention probabilities for one (q, kv) tile pair
    from the saved (m, l) statistics, applying the same masks as forward."""
    s = s * scale
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + col0
    if padded:
        s = jnp.where(col_ids < seq_len, s, MASK_VALUE)
    row_cond = row_ids >= cond_start
    col_cond = col_ids >= cond_start
    if mode == "no_union":
        s = jnp.where(row_cond == col_cond, s, MASK_VALUE)
    elif mode == "independent":
        s = jnp.where(row_cond & ~col_cond, MASK_VALUE, s)
    l_safe = jnp.where(l_tile == 0.0, 1.0, l_tile)
    m_safe = jnp.where(l_tile == 0.0, 0.0, m_tile)
    p = jnp.exp(s - m_safe) / l_safe
    if padded:
        p = jnp.where(row_ids[:, :1] < seq_len, p, 0.0)
    return p


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
    cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    scale, mode, use_rope, cond_start, seq_len, block_q, block_k, num_q,
    padded, bshd=False,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = _tile(q_ref, bshd)
    k = _tile(k_ref, bshd)
    if use_rope:
        r = _pair_swap_matrix(q.shape[-1])
        q = _rope_rotate(q, cos_q_ref[...], sin_q_ref[...], r)
        k = _rope_rotate(k, cos_k_ref[...], sin_k_ref[...], r)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _bwd_mask_and_p(
        s, qi * block_q, ki * block_k, m_ref[0, 0][:, :1], l_ref[0, 0][:, :1],
        scale=scale, mode=mode, cond_start=cond_start, seq_len=seq_len,
        block_q=block_q, block_k=block_k, padded=padded,
    )
    do = _tile(do_ref, bshd).astype(jnp.float32)
    # dv += p^T do
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp = do v^T ; ds = p (dp - di) * scale
    v = _tile(v_ref, bshd).astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di_ref[0, 0][:, :1]) * scale
    # dk += ds^T q
    dk_acc[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == num_q - 1)
    def _store():
        dk = dk_acc[...]
        if use_rope:
            r = _pair_swap_matrix(dk.shape[-1])
            rot = jax.lax.dot(dk, r, preferred_element_type=jnp.float32)
            dk = dk * cos_k_ref[...] - rot * sin_k_ref[...]
        if bshd:
            dk_ref[0] = dk.astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)
        else:
            dk_ref[0, 0] = dk.astype(dk_ref.dtype)
            dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
    cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref,
    dq_ref,
    dq_acc,
    *,
    scale, mode, use_rope, cond_start, seq_len, block_q, block_k, num_kv,
    padded, bshd=False,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = _tile(q_ref, bshd)
    k = _tile(k_ref, bshd)
    if use_rope:
        r = _pair_swap_matrix(q.shape[-1])
        q = _rope_rotate(q, cos_q_ref[...], sin_q_ref[...], r)
        k = _rope_rotate(k, cos_k_ref[...], sin_k_ref[...], r)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _bwd_mask_and_p(
        s, qi * block_q, ki * block_k, m_ref[0, 0][:, :1], l_ref[0, 0][:, :1],
        scale=scale, mode=mode, cond_start=cond_start, seq_len=seq_len,
        block_q=block_q, block_k=block_k, padded=padded,
    )
    do = _tile(do_ref, bshd).astype(jnp.float32)
    v = _tile(v_ref, bshd).astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di_ref[0, 0][:, :1]) * scale
    dq_acc[...] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_kv - 1)
    def _store():
        dq = dq_acc[...]
        if use_rope:
            r = _pair_swap_matrix(dq.shape[-1])
            rot = jax.lax.dot(dq, r, preferred_element_type=jnp.float32)
            dq = dq * cos_q_ref[...] - rot * sin_q_ref[...]
        if bshd:
            dq_ref[0] = dq.astype(dq_ref.dtype)
        else:
            dq_ref[0, 0] = dq.astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cond_start", "mode", "block_q", "block_k", "use_rope", "interpret",
        "bshd",
    ),
)
def _flash_bwd_pallas(
    q, k, v, cos, sin, o, m, l, do,
    cond_start, mode, block_q, block_k, use_rope, interpret, bshd=False,
):
    """Pallas dKV + dQ passes.  Returns (dq, dk, dv)."""
    if bshd:
        b, s, h, d = q.shape
        s_axis = 1
    else:
        b, h, s, d = q.shape
        s_axis = 2
    scale = 1.0 / math.sqrt(d)
    di = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    if bshd:
        # stats layout is [B, H, S, 1] in both layouts (tiny tensor)
        di = jnp.swapaxes(di, 1, 2)

    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        pad = [(0, 0)] * 4
        pad[s_axis] = (0, s_pad - s)
        q, k, v, do = (jnp.pad(x, pad) for x in (q, k, v, do))
        stat_pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        m = jnp.pad(m, stat_pad)
        l = jnp.pad(l, stat_pad)
        di = jnp.pad(di, stat_pad)
        if use_rope:
            cos = jnp.pad(cos, [(0, s_pad - s), (0, 0)])
            sin = jnp.pad(sin, [(0, s_pad - s), (0, 0)])
    num_q = s_pad // block_q
    num_kv = s_pad // block_k
    _check_grid_coverage(block_q, block_k, s, s_pad)
    if bshd:
        # view as [B, S, H*D]; BlockSpecs slice head strips (see _flash_fwd)
        q, k, v, do = (x.reshape(b, s_pad, h * d) for x in (q, k, v, do))

    # stats tiles are loaded [block_q, LANES]; broadcast the single column
    stats = [
        jnp.broadcast_to(x, x.shape[:3] + (LANES,)) for x in (m, l, di)
    ]

    dummy = jnp.zeros((8, d), jnp.float32)
    rope_args = (cos, sin, cos, sin) if use_rope else (dummy,) * 4

    def _qkv_spec(bs, to_block):
        """Spec for a q/k/v/do/dq/dk/dv tensor tile of bs rows; ``to_block``
        maps grid ids to the sequence-block index."""
        if bshd:
            return pl.BlockSpec(
                (1, bs, d), lambda b, h, i, j: (b, to_block(i, j), h)
            )
        return pl.BlockSpec(
            (1, 1, bs, d), lambda b, h, i, j: (b, h, to_block(i, j), 0)
        )

    def _qkv_struct():
        shape = (b, s_pad, h * d) if bshd else (b, h, s_pad, d)
        return jax.ShapeDtypeStruct(shape, q.dtype)

    common = dict(
        scale=scale, mode=mode, use_rope=use_rope, cond_start=cond_start,
        seq_len=s, block_q=block_q, block_k=block_k, padded=(s_pad != s),
        bshd=bshd,
    )

    # ---- dKV pass: grid (b, h, kv, q) — q innermost accumulation ----
    dkv_kernel = functools.partial(_bwd_dkv_kernel, num_q=num_q, **common)
    qi_spec = _qkv_spec(block_q, lambda ki, qi: qi)
    ki_spec = _qkv_spec(block_k, lambda ki, qi: ki)
    stat_q = pl.BlockSpec(
        (1, 1, block_q, LANES), lambda b, h, ki, qi: (b, h, qi, 0)
    )
    rope_q = (
        pl.BlockSpec((block_q, d), lambda b, h, ki, qi: (qi, 0))
        if use_rope else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    rope_k = (
        pl.BlockSpec((block_k, d), lambda b, h, ki, qi: (ki, 0))
        if use_rope else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, h, num_kv, num_q),
        in_specs=[qi_spec, ki_spec, ki_spec, qi_spec, stat_q, stat_q, stat_q,
                  rope_q, rope_q, rope_k, rope_k],
        out_specs=(
            _qkv_spec(block_k, lambda ki, qi: ki),
            _qkv_spec(block_k, lambda ki, qi: ki),
        ),
        out_shape=(_qkv_struct(), _qkv_struct()),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(q, k, v, do, *stats, *rope_args)

    # ---- dQ pass: grid (b, h, q, kv) — kv innermost accumulation ----
    dq_kernel = functools.partial(_bwd_dq_kernel, num_kv=num_kv, **common)
    qi_spec2 = _qkv_spec(block_q, lambda qi, ki: qi)
    ki_spec2 = _qkv_spec(block_k, lambda qi, ki: ki)
    stat_q2 = pl.BlockSpec(
        (1, 1, block_q, LANES), lambda b, h, qi, ki: (b, h, qi, 0)
    )
    rope_q2 = (
        pl.BlockSpec((block_q, d), lambda b, h, qi, ki: (qi, 0))
        if use_rope else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    rope_k2 = (
        pl.BlockSpec((block_k, d), lambda b, h, qi, ki: (ki, 0))
        if use_rope else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h, num_q, num_kv),
        in_specs=[qi_spec2, ki_spec2, ki_spec2, qi_spec2, stat_q2, stat_q2,
                  stat_q2, rope_q2, rope_q2, rope_k2, rope_k2],
        out_specs=_qkv_spec(block_q, lambda qi, ki: qi),
        out_shape=_qkv_struct(),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )(q, k, v, do, *stats, *rope_args)

    if bshd:
        return tuple(
            g.reshape(b, s_pad, h, d)[:, :s] for g in (dq, dk, dv)
        )
    return dq[:, :, :s], dk[:, :, :s], dv[:, :, :s]


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


def _bias_for(s_q: int, cond_start: int, mode: str, cbias: jnp.ndarray):
    """XLA-side bias reconstruction for the backward pass.

    Same block rules as ops/attention._block_bias (keep the mode table in
    sync), but NOT interchangeable with it: cbias arrives pre-log-transformed
    here, and masks use the finite MASK_VALUE instead of -inf so the
    recomputed softmax stays NaN-free under differentiation."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_q), 0) >= cond_start
    col = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_q), 1) >= cond_start
    if mode == "cfactor":
        return jnp.where(row != col, cbias[0, 0], 0.0)
    if mode == "no_union":
        return jnp.where(row == col, 0.0, MASK_VALUE)
    if mode == "independent":
        return jnp.where(row & ~col, MASK_VALUE, 0.0)
    return jnp.zeros((s_q, s_q), jnp.float32)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14)
)
def _flash_attention(q, k, v, cbias, cos, sin, cond_start, mode, block_q,
                     block_k, use_rope, interpret, bshd, int8_qk=False,
                     pv_chunks=1):
    return _flash_fwd(q, k, v, cbias, cos, sin, cond_start, mode, block_q,
                      block_k, use_rope, interpret, bshd=bshd,
                      int8_qk=int8_qk, pv_chunks=pv_chunks)


def _flash_attention_fwd(q, k, v, cbias, cos, sin, cond_start, mode, block_q,
                         block_k, use_rope, interpret, bshd, int8_qk=False,
                         pv_chunks=1):
    # This path only runs under differentiation (training).  The backward
    # kernels rebuild probabilities from bf16 scores, so an int8 forward
    # would make the saved (m, l) stats inconsistent with the recomputed
    # probs — force bf16 scores whenever gradients flow (the int8 knob is a
    # serving-only optimization; see use_int8_attn).
    int8_qk = False
    if mode == "cfactor":
        # cbias needs a gradient — XLA recompute backward keeps it exact
        o = _flash_fwd(q, k, v, cbias, cos, sin, cond_start, mode, block_q,
                       block_k, use_rope, interpret, bshd=bshd,
                       int8_qk=int8_qk, pv_chunks=pv_chunks)
        return o, (q, k, v, cbias, cos, sin, None, None, None)
    o, m, l = _flash_fwd(q, k, v, cbias, cos, sin, cond_start, mode, block_q,
                         block_k, use_rope, interpret, save_residuals=True,
                         bshd=bshd, int8_qk=int8_qk, pv_chunks=pv_chunks)
    return o, (q, k, v, cbias, cos, sin, o, m, l)


def _xla_rope(x, cos, sin):
    """XLA-side rotation matching the in-kernel interleaved-pair RoPE."""
    xf = x.astype(jnp.float32)
    x_pair = xf.reshape(*xf.shape[:-1], -1, 2)
    x_rot = jnp.stack([-x_pair[..., 1], x_pair[..., 0]], axis=-1).reshape(
        xf.shape
    )
    return xf * cos + x_rot * sin


def _xla_rope_bwd(g, cos, sin):
    """Transpose of `_xla_rope` w.r.t. x (rotation by -angle)."""
    gf = g.astype(jnp.float32)
    g_pair = gf.reshape(*gf.shape[:-1], -1, 2)
    g_rot = jnp.stack([g_pair[..., 1], -g_pair[..., 0]], axis=-1).reshape(
        gf.shape
    )
    return gf * cos + g_rot * sin


def _bwd_blocks(s: int, block_q: int, block_k: int) -> Tuple[int, int]:
    """Backward block pair: the backward kernels carry two [bq, bk] fp32
    temporaries, so they take their own (smaller, MAX_BLOCK_BWD) block
    policy regardless of the forward's.  Mixing the forward's block_q with
    the backward cap can produce non-covering floor grids (e.g. S=4353:
    (512, 896) covers only 4096 of the 4480-padded rows) — fall back to an
    EQUAL block pair, which divides its own padding and so always covers
    every real row.  The fallback is min(bq, bk), never larger: explicit
    caller block sizes are VMEM caps and must stay upper bounds."""
    bq_bwd, bk_bwd = _auto_blocks(s, MAX_BLOCK_BWD)
    bq, bk = min(block_q, bq_bwd), min(block_k, bk_bwd)
    s_pad = _round_up(s, max(bq, bk))
    if not (_covers(bq, s, s_pad) and _covers(bk, s, s_pad)):
        b = min(bq, bk)
        return b, b
    return bq, bk


def _flash_attention_bwd(cond_start, mode, block_q, block_k, use_rope,
                         interpret, bshd, int8_qk, pv_chunks, residuals, do):
    """Backward pass.

    Mask modes (union / no_union / independent) use the Pallas dKV + dQ
    kernels with the saved (o, m, l) residuals — no [S, S] materialisation.
    The ``cfactor`` mode (inference-only condition strength, which would need
    a cbias gradient) falls back to exact XLA recompute."""
    q, k, v, cbias, cos, sin, o, m, l = residuals
    if mode != "cfactor":
        bq, bk = _bwd_blocks(q.shape[1 if bshd else 2], block_q, block_k)
        dq, dk, dv = _flash_bwd_pallas(
            q, k, v, cos, sin, o, m, l, do, cond_start, mode,
            bq, bk, use_rope, interpret,
            bshd=bshd,
        )
        return (
            dq, dk, dv, jnp.zeros((1, 1), jnp.float32),
            jnp.zeros_like(cos), jnp.zeros_like(sin),
        )
    if bshd:
        # cfactor backward is the XLA recompute path — swap to [B,H,S,D],
        # recurse, swap the grads back (inference-only mode; simplicity wins)
        t = functools.partial(jnp.swapaxes, axis1=1, axis2=2)
        outs = _flash_attention_bwd(
            cond_start, mode, block_q, block_k, use_rope, interpret, False,
            int8_qk, pv_chunks,
            (t(q), t(k), t(v), cbias, cos, sin, None, None, None), t(do),
        )
        dq, dk, dv, dcbias, dcos, dsin = outs
        return t(dq), t(dk), t(dv), dcbias, dcos, dsin
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    if use_rope:
        qf = _xla_rope(qf, cos, sin)
        kf = _xla_rope(kf, cos, sin)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    s = s + _bias_for(q.shape[2], cond_start, mode, cbias)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    if use_rope:
        dq = _xla_rope_bwd(dq, cos, sin)
        dk = _xla_rope_bwd(dk, cos, sin)
    if mode == "cfactor":
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 0) >= cond_start
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape[-2:], 1) >= cond_start
        dcb = jnp.sum(jnp.where((row != col)[None, None], ds, 0.0))
        dcbias = jnp.full((1, 1), dcb, jnp.float32)
    else:
        dcbias = jnp.zeros((1, 1), jnp.float32)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dcbias,
        jnp.zeros_like(cos), jnp.zeros_like(sin),
    )


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    cond_start: int,
    mode: str = "union",
    c_factor: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    layout: str = "bhsd",
) -> jnp.ndarray:
    """Flash attention with condition block semantics.

    ``layout`` selects the q/k/v/output memory layout: "bhsd" = [B, H, S, D]
    (classic), "bshd" = [B, S, H, D] (heads-last — the projection output
    layout; the kernel head-slices tiles directly via its BlockSpecs, so the
    caller never pays an HBM transpose to/from head-major).
    ``cond_start`` is the first condition-token index (== S when no condition
    stream).  ``rope`` = (cos, sin) tables [S, D] fuses the rotary embedding
    of q/k into the kernel (interleaved-pair convention, as ops/rope.py).
    The tables are treated as CONSTANTS under differentiation: their
    cotangents are zero (position ids are integers everywhere in this
    framework — learned/continuous positions would need a d(cos,sin) path).
    Block sizes default to the measured-optimal `auto_blocks` policy.
    """
    if layout == "bhsd":
        b, h, s, d = q.shape
    elif layout == "bshd":
        b, s, h, d = q.shape
    else:
        raise ValueError(f"unknown layout {layout!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    abq, abk = auto_blocks(s)
    block_q = abq if block_q is None else min(block_q, _round_up(s, LANES))
    block_k = abk if block_k is None else min(block_k, _round_up(s, LANES))
    int8_qk = use_int8_attn()
    pv_chunks = _pv_chunk_policy(block_k, int8_qk)
    if c_factor is not None:
        mode = "cfactor"
        cbias = jnp.log(
            jnp.asarray(c_factor, jnp.float32).reshape(1, 1)
        )
    else:
        cbias = jnp.zeros((1, 1), jnp.float32)
    use_rope = rope is not None
    if use_rope:
        cos, sin = rope
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
    else:
        cos = sin = jnp.zeros((8, d), jnp.float32)
    return _flash_attention(
        q, k, v, cbias, cos, sin, cond_start, mode, block_q, block_k,
        use_rope, interpret, layout == "bshd", int8_qk, pv_chunks,
    )


def _pv_chunk_policy(block_k: int, int8_qk: bool = False) -> int:
    """How many key-axis chunks to software-pipeline the softmax+PV over
    (see `_fwd_kernel`).  LOONGX_FLASH_PV_CHUNKS overrides (0/1 disables);
    resolved at call time like the other serving knobs — trace-time capture,
    flip only at process start.

    Default (measured on v5e, benchmarks/flash_pv_pipeline_sweep.py): the
    largest lane-aligned divisor <= 4 on the int8-QK long-S full-row-kv
    path, where the overlap wins — 1.805→1.781 ms at S=4352, 3.742→3.647
    at 6656, 6.427→6.192 at 8704 (+1.3/+2.6/+3.7%); OFF for bf16 scores
    (neutral-to-negative at every S) and for the <=2560 single-tile path
    (0.582→0.590 ms at 2560)."""
    import os

    raw = os.environ.get("LOONGX_FLASH_PV_CHUNKS", "")
    if raw:
        n = int(raw)
    elif int8_qk and block_k > 2560:
        n = 4
    else:
        n = 1
    if n <= 1:
        return 1
    # shrink until the chunks are lane-aligned divisors of block_k
    while n > 1 and (block_k % n or (block_k // n) % LANES):
        n -= 1
    return n
