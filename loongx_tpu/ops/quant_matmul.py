"""Pallas TPU kernel: bf16-activation x int8-weight matmul.

y[m, n] = (sum_k x[m, k] * w_q[k, n]) * scale[n] (+ bias)

The int8 weight tile is dequantised to bf16 *inside VMEM* right before the
MXU — HBM reads stay int8 (half the weight bandwidth of bf16) and no
full-size bf16 weight copy ever exists, which is what lets the 12B
FLUX.1-dev run inside a 16 GB v5e (XLA's fused dequant materialises whole
[K, N] bf16 kernels as transients; see ops/quant.py).

Per-output-channel scales are applied in the fp32 epilogue after the K
reduction (mathematically identical to pre-scaling the weights).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def use_w8a8() -> bool:
    """Serving knob: LOONGX_W8A8=1 routes int8-weight linears through the
    native int8-MXU W8A8 kernel (2x the bf16 MXU rate on v5e) with dynamic
    per-row-per-k-tile activation scales.  Read at trace time."""
    import os

    return os.environ.get("LOONGX_W8A8", "0") == "1"


def _accum_tile(acc_ref, x, w_int8, w8a8: bool):
    """Shared MAC body for every quant kernel: either the W8A8 path
    (per-row dynamic activation int8 quant -> native s8xs8->s32 MXU dot ->
    fp32 rescale) or the weight-only path (int8 weight dequantised to bf16
    in VMEM, bf16 MXU dot, fp32 accumulation).  ``x`` is the already-loaded
    (possibly prologue-transformed) activation tile; ``w_int8`` the
    already-indexed [block_k, block_n] weight tile."""
    if w8a8:
        x = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        x_scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
        acc_i32 = jax.lax.dot(x_q, w_int8, preferred_element_type=jnp.int32)
        acc_ref[...] += acc_i32.astype(jnp.float32) * x_scale
    else:
        acc_ref[...] += jax.lax.dot(
            x.astype(jnp.bfloat16), w_int8.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )


def _epilogue(acc, scale_ref, bias_ref, activation):
    """Shared store epilogue: per-channel rescale, optional bias, optional
    fused activation (all fp32, in VMEM) — fusing the activation here saves
    a full HBM round-trip over the matmul output (the 4x-wide ff hidden is
    the single largest elementwise tensor in a FLUX block)."""
    z = acc * scale_ref[...]
    if bias_ref is not None:
        z = z + bias_ref[...]
    if activation == "gelu_tanh":
        z = jax.nn.gelu(z, approximate=True)
    elif activation is not None:
        raise ValueError(f"unknown fused activation {activation!r}")
    return z


def _qmm_kernel(x_ref, wq_ref, scale_ref, *refs, num_k, activation=None,
                w8a8=False):
    """Flat-weight kernel body shared by the weight-only and W8A8 paths
    (the flag only switches the `_accum_tile` MAC)."""
    bias_ref, o_ref, acc_ref = refs if len(refs) == 3 else (None, *refs)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _accum_tile(acc_ref, x_ref[...], wq_ref[...], w8a8=w8a8)

    @pl.when(ki == num_k - 1)
    def _store():
        o_ref[...] = _epilogue(
            acc_ref[...], scale_ref, bias_ref, activation
        ).astype(o_ref.dtype)


def _qmm_flat(x, w_q, scale, *, w8a8, block_m, block_n, block_k,
              interpret, bias, activation):
    """Shared scaffolding (clamp/pad/specs/grid) for the flat [K, N]
    kernels; `w8a8` picks the MAC path.  Callers are jitted."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (1, n), (x.shape, w_q.shape, scale.shape)
    x = x.astype(jnp.bfloat16)

    # clamp tiles for small operands (embedders: K=64/256) so padding stays
    # bounded; lane/sublane minimums 128 keep the MXU fed
    block_m = min(block_m, _round_up(m, 128))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 128))

    m_pad, k_pad, n_pad = (
        _round_up(m, block_m), _round_up(k, block_k), _round_up(n, block_n)
    )
    if (m_pad, k_pad) != (m, k):
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k)))
    if (k_pad, n_pad) != (k, n):
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        scale = jnp.pad(scale, ((0, 0), (0, n_pad - n)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, n_pad - n)))

    vec_spec = pl.BlockSpec((1, block_n), lambda i, j, ki: (0, j))
    extra_specs, extra_args = [], []
    if bias is not None:
        extra_specs, extra_args = [vec_spec], [bias.astype(jnp.float32)]
    num_k = k_pad // block_k
    out = pl.pallas_call(
        functools.partial(
            _qmm_kernel, num_k=num_k, activation=activation, w8a8=w8a8
        ),
        grid=(m_pad // block_m, n_pad // block_n, num_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((block_k, block_n), lambda i, j, ki: (ki, j)),
            vec_spec,
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget (~22 MB) is within 1 MB of the
            # wide-N ff tiles' double-buffered working set; the fused bias
            # input tipped it over -> give the kernel the same generous
            # budget as the flash kernels
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n_pad,
            bytes_accessed=m_pad * k_pad * 2 + k_pad * n_pad + m_pad * n_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, scale.astype(jnp.float32), *extra_args)
    return out[:m, :n]


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "activation"),
)
def quant_matmul(
    x: jnp.ndarray,          # [M, K] bf16/fp32
    w_q: jnp.ndarray,        # [K, N] int8
    scale: jnp.ndarray,      # [1, N] fp32
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1536,
    interpret: Optional[bool] = None,
    bias: Optional[jnp.ndarray] = None,       # [1, N] fp32
    activation: Optional[str] = None,         # fused epilogue ("gelu_tanh")
) -> jnp.ndarray:
    # Default tiles from a v5e sweep at FLUX shapes (M=2560, K/N in
    # {3072, 12288, 15360}): (512, 1024, 1536) reaches 144-180 TF/s —
    # above the XLA bf16 dot on the same shapes (138-166 TF/s) because the
    # int8 weight tiles halve HBM traffic.  The old (256, 512, 512) default
    # measured 102-122 TF/s.
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _qmm_flat(
        x, w_q, scale, w8a8=False, block_m=block_m, block_n=block_n,
        block_k=block_k, interpret=interpret, bias=bias, activation=activation,
    )


# ---------------------------------------------------------------------------
# Backward: dx = dy @ (w_q * scale)^T without materialising the bf16 weight
# ---------------------------------------------------------------------------


def _qmm_t_kernel(dy_ref, wq_ref, scale_ref, o_ref, acc_ref, *, num_n):
    """dx[m, k] = sum_n dy[m, n] * scale[n] * w_q[k, n].  The weight tile is
    read in its stored [K, N] layout and contracted on N in-register — no
    transposed copy, int8 HBM reads."""
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dy = (dy_ref[...].astype(jnp.float32) * scale_ref[...]).astype(jnp.bfloat16)
    w = wq_ref[...].astype(jnp.bfloat16)  # [bk, bn]
    acc_ref[...] += jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ni == num_n - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def quant_matmul_t(
    dy: jnp.ndarray,         # [M, N] bf16/fp32
    w_q: jnp.ndarray,        # [K, N] int8 (stored layout)
    scale: jnp.ndarray,      # [1, N] fp32
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1536,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """dx = dy @ (w_q * scale)^T -> [M, K]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, n = dy.shape
    k, n2 = w_q.shape
    assert n == n2 and scale.shape == (1, n), (dy.shape, w_q.shape, scale.shape)
    dy = dy.astype(jnp.bfloat16)

    block_m = min(block_m, _round_up(m, 128))
    block_n = min(block_n, _round_up(n, 128))
    block_k = min(block_k, _round_up(k, 128))

    m_pad, k_pad, n_pad = (
        _round_up(m, block_m), _round_up(k, block_k), _round_up(n, block_n)
    )
    if (m_pad, n_pad) != (m, n):
        dy = jnp.pad(dy, ((0, m_pad - m), (0, n_pad - n)))
    if (k_pad, n_pad) != (k, n):
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    if n_pad != n:
        scale = jnp.pad(scale, ((0, 0), (0, n_pad - n)))

    num_n = n_pad // block_n
    out = pl.pallas_call(
        functools.partial(_qmm_t_kernel, num_n=num_n),
        grid=(m_pad // block_m, k_pad // block_k, num_n),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j, ni: (i, ni)),
            pl.BlockSpec((block_k, block_n), lambda i, j, ni: (j, ni)),
            pl.BlockSpec((1, block_n), lambda i, j, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_k), lambda i, j, ni: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_pad), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_m, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # same generous budget as the forward kernels: the wide-N dy
            # tiles' double-buffered working set sits right at the default
            # scoped-VMEM limit (~22 MB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_pad * n_pad,
            bytes_accessed=m_pad * n_pad * 2 + k_pad * n_pad + m_pad * k_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(dy, w_q, scale.astype(jnp.float32))
    return out[:m, :k]


@jax.custom_vjp
def quant_matmul_vjp(x, w_q, scale):
    """Differentiable (wrt x) int8-weight matmul: forward = quant_matmul,
    backward dx via the transposed-contraction kernel.  Weights/scales are
    frozen (QLoRA-style: the quantized base never receives gradients — the
    reference likewise trains only LoRA, model.py:533-543)."""
    return quant_matmul(x, w_q, scale)


def _qmm_fwd(x, w_q, scale):
    # the zero-size sentinel only carries x.dtype: cotangents must match the
    # primal dtype exactly (custom_vjp's inexact-mismatch leniency is a
    # deprecated JAX exception slated for removal)
    return quant_matmul(x, w_q, scale), (w_q, scale, jnp.zeros((), x.dtype))


def _qmm_bwd(res, dy):
    w_q, scale, x_proto = res
    import numpy as np

    dx = quant_matmul_t(dy, w_q, scale).astype(x_proto.dtype)
    return (
        dx,
        np.zeros(w_q.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


quant_matmul_vjp.defvjp(_qmm_fwd, _qmm_bwd)


# ---------------------------------------------------------------------------
# W8A8: dynamic activation quant + native int8 MXU matmul
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "activation"),
)
def quant_matmul_w8a8(
    x: jnp.ndarray,          # [M, K] bf16/fp32
    w_q: jnp.ndarray,        # [K, N] int8
    scale: jnp.ndarray,      # [1, N] fp32 (per-out-channel weight scale)
    block_m: int = 512,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    bias: Optional[jnp.ndarray] = None,       # [1, N] fp32
    activation: Optional[str] = None,         # fused epilogue ("gelu_tanh")
) -> jnp.ndarray:
    """y = (dyn-int8(x) @ w_q) * x_scale * scale using the int8 MXU path.

    Per (row, k-tile) dynamic activation quantization fused into the
    matmul: the bf16 x tile is quantized to int8 in VMEM, the MXU runs a
    native s8 x s8 -> s32 dot (2x the bf16 MXU rate on v5e), and each
    k-tile's contribution is rescaled into an fp32 accumulator.  Group-wise
    (per-row-per-k-tile) activation scales are *finer* than whole-row W8A8,
    so quantization error stays below weight-only int8 + bf16 rounding.

    Default (block_n, block_k) come from a v5e sweep on the FLUX shapes:
    wide-N shapes (ff-in, N >= 4K) run fastest at (2048, 1024) = 211 TF/s;
    everything else at (1024, 1536) = 193-279 TF/s."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_n is None or block_k is None:
        wide_n = w_q.shape[1] >= 4 * w_q.shape[0]
        block_n = block_n or (2048 if wide_n else 1024)
        block_k = block_k or (1024 if wide_n else 1536)
    return _qmm_flat(
        x, w_q, scale, w8a8=True, block_m=block_m, block_n=block_n,
        block_k=block_k, interpret=interpret, bias=bias, activation=activation,
    )


@jax.custom_vjp
def quant_matmul_w8a8_vjp(x, w_q, scale):
    """Differentiable (wrt x) W8A8 matmul: the forward quantizes activations
    (straight-through); the backward is the same transposed int8 kernel as
    the weight-only path — standard STE treatment of activation quant, so
    QLoRA keeps working when LOONGX_W8A8=1 is set for serving."""
    return quant_matmul_w8a8(x, w_q, scale)


def _qmm_w8a8_fwd(x, w_q, scale):
    return (
        quant_matmul_w8a8(x, w_q, scale),
        (w_q, scale, jnp.zeros((), x.dtype)),
    )


quant_matmul_w8a8_vjp.defvjp(_qmm_w8a8_fwd, _qmm_bwd)


# ---------------------------------------------------------------------------
# Stacked-weight kernels (scalar-prefetch block indexing)
#
# Inside the scan over FLUX blocks, the weights live stacked as [NB, K, N];
# feeding the plain kernels forces XLA to materialise each block's slice as
# a standalone buffer before the custom call (~7 ms/step of dynamic-slice
# copies at full-dev).  These variants take the WHOLE stacked array plus the
# loop index as a scalar-prefetch operand: the BlockSpec index maps pick
# block `blk` directly, so the kernel DMAs weight tiles straight out of the
# stacked array and no slice copy ever exists.
# ---------------------------------------------------------------------------


def _seg_rows(block_m: int, boundary: int):
    """[block_m, 1] bool: does this output row belong to the cond segment?
    Row ids are global (grid i * block_m + in-tile row) — the same
    row-vs-boundary trick the flash kernel uses for cond_start."""
    i = pl.program_id(0)
    rows = i * block_m + jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0)
    return rows >= boundary


def _ln_mod_prologue(x_ref, ab_ref, stats_ref, boundary: int):
    """LayerNorm apply (no learned affine — FLUX convention) + per-segment
    adaLN affine on the x tile in VMEM (PERF_NOTES headroom #1).

    The per-row (mean, rstd) arrive PRECOMPUTED in ``stats_ref`` (cols 0/1
    of a [block_m, 128] tile): one cheap XLA reduction per stream instead
    of a VPU lane-reduction per (m, n, k) kernel tile — the in-kernel
    reduction variant measured ~11 ms/fwd SLOWER at full-dev
    (benchmarks/fused_ew_ab.py).  Also frees the prologue from the
    one-k-iteration restriction.  ab rows: 0=a_main 1=b_main 2=a_cond
    3=b_cond."""
    xf = x_ref[...].astype(jnp.float32)
    mean = stats_ref[:, 0:1]
    rstd = stats_ref[:, 1:2]
    xn = (xf - mean) * rstd
    is_cond = _seg_rows(xf.shape[0], boundary)
    a = jnp.where(is_cond, ab_ref[2:3, :], ab_ref[0:1, :])
    b = jnp.where(is_cond, ab_ref[3:4, :], ab_ref[1:2, :])
    return xn * a + b


def _gate_res_epilogue(z, resid_ref, gate_ref, is_cond):
    """out = resid + gate_seg(row) * z (PERF_NOTES headroom #2) — the
    adaLN-zero gated residual add fused into the matmul store.  gate rows:
    0=gate_main 1=gate_cond.  ``is_cond`` is computed at kernel-body top
    level (pl.program_id inside a pl.when region breaks interpret mode)."""
    g = jnp.where(is_cond, gate_ref[1:2, :], gate_ref[0:1, :])
    return resid_ref[...].astype(jnp.float32) + g * z


def _qmm_stacked_kernel(
    idx_ref, x_ref, wq_ref, scale_ref, *refs,
    num_k, activation=None, w8a8=False, has_bias=False,
    ab_boundary=None, res_boundary=None,
):
    del idx_ref  # consumed by the BlockSpec index maps
    refs = list(refs)
    bias_ref = refs.pop(0) if has_bias else None
    if ab_boundary is not None:
        ab_ref = refs.pop(0)
        stats_ref = refs.pop(0)
    else:
        ab_ref = stats_ref = None
    if res_boundary is not None:
        resid_ref = refs.pop(0)
        gate_ref = refs.pop(0)
    else:
        resid_ref = gate_ref = None
    o_ref, acc_ref = refs
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = (
        _ln_mod_prologue(x_ref, ab_ref.at[0], stats_ref, ab_boundary)
        if ab_ref is not None
        else x_ref[...]
    )
    _accum_tile(acc_ref, x, wq_ref[0], w8a8=w8a8)

    res_is_cond = (
        _seg_rows(o_ref.shape[0], res_boundary)
        if resid_ref is not None
        else None
    )

    @pl.when(ki == num_k - 1)
    def _store():
        z = _epilogue(
            acc_ref[...], scale_ref.at[0], None if bias_ref is None else bias_ref.at[0],
            activation,
        )
        if resid_ref is not None:
            z = _gate_res_epilogue(z, resid_ref, gate_ref.at[0], res_is_cond)
        o_ref[...] = z.astype(o_ref.dtype)


def _stacked_blocks(k: int, n: int):
    """(block_n, block_k) for a stacked call; the stacked arrays are never
    padded (see `_stacked_ok`).

    v5e sweep at the full-dev shapes (benchmarks/stacked_tile_sweep.py +
    _sweep2): (3072, 3072) tiles win broadly — one k-iteration on the
    K=3072 linears, 3072-wide N chunks — at 344-354 TF/s per shape vs
    259-302 under the flat-path (1024/2048, 1536/1024) tiles; every
    full-dev linear dimension is a 3072 multiple.  Non-multiples fall back
    to the flat-policy tiles."""
    wide_n = n >= 4 * k
    if n % 3072 == 0:
        block_n = 3072
    elif n % 1536 == 0:
        block_n = 1536  # TP-local shards of the 3072-wide FLUX linears
    elif n % 2048 == 0:
        block_n = 2048  # power-of-two widths (T5/CLIP linears)
    elif n % 2560 == 0:
        block_n = 2560  # Whisper-large ff (5120)
    elif n % 1280 == 0:
        block_n = 1280  # Whisper-large d_model
    else:
        block_n = 2048 if wide_n else 1024
    for bk in (3072, 2048, 2560, 1280):  # K=4096/10240/5120/1280 encoders
        if k % bk == 0:
            return block_n, bk
    return block_n, (1024 if wide_n else 1536)


def _stacked_ok(k: int, n: int, block_n: int, block_k: int) -> bool:
    """Stacked kernels require K/N divisible by the tile sizes: padding the
    whole [NB, K, N] stack would copy it, defeating the point."""
    return k % block_k == 0 and n % block_n == 0


def quant_matmul_stacked(
    x: jnp.ndarray,          # [M, K]
    w_q3: jnp.ndarray,       # [NB, K, N] int8
    scale3: jnp.ndarray,     # [NB, 1, N] fp32
    blk: jnp.ndarray,        # scalar int32 — which block of the stack
    bias3: Optional[jnp.ndarray] = None,   # [NB, 1, N] fp32
    activation: Optional[str] = None,
    block_m: int = 512,
    interpret: Optional[bool] = None,
    w8a8: Optional[bool] = None,
    block_n: Optional[int] = None,   # tile overrides (benchmarking; must
    block_k: Optional[int] = None,   # divide N / K — no stack padding)
    ab: Optional[jnp.ndarray] = None,      # [8, K] fp32 LN+adaLN prologue
    resid: Optional[jnp.ndarray] = None,   # [M, N] residual stream
    gate: Optional[jnp.ndarray] = None,    # [8, N] fp32 gate epilogue
    seg_boundary: int = 0,   # first cond row (static under jit)
) -> jnp.ndarray:
    """Optionally fuses the block's surrounding elementwise work into the
    matmul (PERF_NOTES headroom #1/#2):

      ab:   y = ((layernorm(x) * a_seg(row) + b_seg(row)) @ W) ...
            rows 0..3 of ab are a_main/b_main/a_cond/b_cond ([K] each);
            works at any k-grid depth — the per-row (mean, rstd) arrive
            precomputed in a stats operand and the ab rows are sliced
            per k-tile (see `_ln_mod_prologue`).
      resid+gate: out = resid + gate_seg(row) * (acc * scale + bias)
            gate rows 0..1 are gate_main/gate_cond ([N] each).

    Row segments split at ``seg_boundary`` ([main | cond] fused streams,
    B=1 serving).  Callers must fall back when these can't be represented
    (see models.flux.model helpers)."""
    # Resolve env-dependent defaults OUTSIDE the inner jit so they reach it
    # as static args (a read inside `_quant_matmul_stacked_jit` would pin the
    # first value seen per shape forever).  NOTE: when this wrapper is itself
    # traced inside an outer jit (the denoise scan / train step), the env
    # read still happens at that outer trace — env knobs are process-start
    # configuration, not runtime switches (see models.flux.model._env_knob).
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if w8a8 is None:
        w8a8 = use_w8a8()
    # explicit tile overrides must divide the operand dims — a silent
    # _stacked_ok fallback would time the FLAT kernel under a stacked label
    if block_n is not None:
        assert w_q3.shape[-1] % block_n == 0, (w_q3.shape, block_n)
    if block_k is not None:
        assert x.shape[-1] % block_k == 0, (x.shape, block_k)
    return _quant_matmul_stacked_jit(
        x, w_q3, scale3, blk, bias3, ab, resid, gate,
        activation=activation, block_m=block_m, interpret=interpret,
        w8a8=w8a8, block_n=block_n, block_k=block_k,
        seg_boundary=seg_boundary,
    )


_LN_EPS = 1e-6  # FLUX layernorm epsilon — single source for kernel,
                # fallback, and backward (a desynchronized copy would make
                # fused-vs-fallback numerics silently diverge)


def _ln_mean_rstd(x):
    """Shared LN reduction: [M, K] any-dtype -> fp32 ([M,1] mean, [M,1]
    rstd).  Every LN-touching path (kernel stats operand, XLA fallback,
    custom_vjp backward) MUST go through this one recipe."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return mean, jax.lax.rsqrt(var + _LN_EPS)


def _ln_row_stats(x):
    """[M, K] -> [M, 128] fp32 with col 0 = mean, col 1 = rstd (the
    kernel-prologue stats operand; 128 lanes for TPU tiling)."""
    mean, rstd = _ln_mean_rstd(x)
    return jnp.concatenate(
        [mean, rstd, jnp.zeros((x.shape[0], 126), jnp.float32)], axis=-1
    )


def _xla_ln_mod(x, ab, boundary):
    """XLA reference/fallback for the fused LN + segment-affine prologue."""
    mean, rstd = _ln_mean_rstd(x)
    xn = (x.astype(jnp.float32) - mean) * rstd
    m = x.shape[0]
    a = _seg_select(jnp.stack([ab[0], ab[2]]), m, boundary)
    b = _seg_select(jnp.stack([ab[1], ab[3]]), m, boundary)
    return (xn * a + b).astype(jnp.bfloat16)


def _xla_gate_res(y, resid, gate, boundary):
    """XLA reference/fallback for the fused gate + residual epilogue."""
    g = _seg_select(gate[0:2], y.shape[0], boundary)
    return (resid.astype(jnp.float32) + g * y.astype(jnp.float32)).astype(
        jnp.bfloat16
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_m", "interpret", "activation", "w8a8", "block_n", "block_k",
        "seg_boundary",
    ),
)
def _quant_matmul_stacked_jit(
    x, w_q3, scale3, blk, bias3=None, ab=None, resid=None, gate=None, *,
    activation=None, block_m=512, interpret=False, w8a8=False,
    block_n=None, block_k=None, seg_boundary=0,
):
    m, k = x.shape
    nb, k2, n = w_q3.shape
    assert k == k2 and scale3.shape == (nb, 1, n), (x.shape, w_q3.shape, scale3.shape)
    assert (resid is None) == (gate is None)
    auto_n, auto_k = _stacked_blocks(k, n)
    block_n = min(block_n or auto_n, n)
    block_k = min(block_k or auto_k, k)
    if not _stacked_ok(k, n, block_n, block_k):
        # fall back to the flat kernel on a sliced copy (rare small shapes);
        # prologue/epilogue compose in XLA so semantics are identical
        if ab is not None:
            x = _xla_ln_mod(x, ab, seg_boundary)
        qmm = quant_matmul_w8a8 if w8a8 else quant_matmul
        y = qmm(
            x, w_q3[blk], scale3[blk],
            bias=None if bias3 is None else bias3[blk],
            activation=activation, interpret=interpret,
        )
        if resid is not None:
            y = _xla_gate_res(y, resid, gate, seg_boundary)
        return y
    stats = _ln_row_stats(x) if ab is not None else None
    x = x.astype(jnp.bfloat16)
    block_m = min(block_m, _round_up(m, 128))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        if resid is not None:
            resid = jnp.pad(resid, ((0, m_pad - m), (0, 0)))
        if stats is not None:
            stats = jnp.pad(stats, ((0, m_pad - m), (0, 0)))

    num_k = k // block_k
    vec_spec = pl.BlockSpec((1, 1, block_n), lambda i, j, ki, b: (b[0], 0, j))
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, ki, b: (i, ki)),
        pl.BlockSpec((1, block_k, block_n), lambda i, j, ki, b: (b[0], ki, j)),
        vec_spec,
    ]
    args = [x, w_q3, scale3.astype(jnp.float32)]
    if bias3 is not None:
        in_specs.append(vec_spec)
        args.append(bias3.astype(jnp.float32))
    if ab is not None:
        assert ab.shape == (8, k), ab.shape
        in_specs.append(
            pl.BlockSpec((1, 8, block_k), lambda i, j, ki, b: (0, 0, ki))
        )
        args.append(ab.astype(jnp.float32)[None])
        in_specs.append(
            pl.BlockSpec((block_m, 128), lambda i, j, ki, b: (i, 0))
        )
        args.append(stats)
    if resid is not None:
        assert gate.shape == (8, n), gate.shape
        # index map ignores ki -> Pallas re-uses the buffer across the k
        # iterations (one DMA per (i, j) tile, read only at the store)
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda i, j, ki, b: (i, j))
        )
        args.append(resid.astype(jnp.bfloat16))
        in_specs.append(
            pl.BlockSpec((1, 8, block_n), lambda i, j, ki, b: (0, 0, j))
        )
        args.append(gate.astype(jnp.float32)[None])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // block_m, n // block_n, num_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki, b: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_stacked_kernel, num_k=num_k, activation=activation,
            w8a8=w8a8, has_bias=bias3 is not None,
            ab_boundary=seg_boundary if ab is not None else None,
            res_boundary=seg_boundary if resid is not None else None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * k * 2 + k * n + m_pad * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(blk, jnp.int32).reshape(1), *args)
    return out[:m]


def _qmm_t_stacked_kernel(
    idx_ref, dy_ref, wq_ref, scale_ref, o_ref, acc_ref, *, num_n
):
    del idx_ref
    ni = pl.program_id(2)

    @pl.when(ni == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dy = (dy_ref[...].astype(jnp.float32) * scale_ref[0]).astype(jnp.bfloat16)
    w = wq_ref[0].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ni == num_n - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def quant_matmul_t_stacked(
    dy: jnp.ndarray,         # [M, N]
    w_q3: jnp.ndarray,       # [NB, K, N] int8
    scale3: jnp.ndarray,     # [NB, 1, N] fp32
    blk: jnp.ndarray,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """dx = dy @ (w_q3[blk] * scale3[blk])^T without slicing the stack."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, n = dy.shape
    nb, k, n2 = w_q3.shape
    assert n == n2 and scale3.shape == (nb, 1, n), (
        dy.shape, w_q3.shape, scale3.shape
    )
    block_n, block_k = _stacked_blocks(k, n)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    if not _stacked_ok(k, n, block_n, block_k):
        return quant_matmul_t(dy, w_q3[blk], scale3[blk], interpret=interpret)
    dy = dy.astype(jnp.bfloat16)
    block_m = min(block_m, _round_up(m, 128))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        dy = jnp.pad(dy, ((0, m_pad - m), (0, 0)))
    num_n = n // block_n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // block_m, k // block_k, num_n),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j, ni, b: (i, ni)),
            pl.BlockSpec((1, block_k, block_n), lambda i, j, ni, b: (b[0], j, ni)),
            pl.BlockSpec((1, 1, block_n), lambda i, j, ni, b: (b[0], 0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_k), lambda i, j, ni, b: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_k), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_t_stacked_kernel, num_n=num_n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, k), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n,
            bytes_accessed=m_pad * n * 2 + k * n + m_pad * k * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(blk, jnp.int32).reshape(1), dy, w_q3, scale3.astype(jnp.float32))
    return out[:m]


@jax.custom_vjp
def quant_matmul_stacked_vjp(x, w_q3, scale3, blk):
    """Differentiable (wrt x) stacked-weight matmul; the W8A8/weight-only
    routing follows LOONGX_W8A8 like the flat path."""
    return quant_matmul_stacked(x, w_q3, scale3, blk)


def _qms_fwd(x, w_q3, scale3, blk):
    return (
        quant_matmul_stacked(x, w_q3, scale3, blk),
        (w_q3, scale3, blk, jnp.zeros((), x.dtype)),
    )


def _qms_bwd(res, dy):
    import numpy as np

    w_q3, scale3, blk, x_proto = res
    dx = quant_matmul_t_stacked(dy, w_q3, scale3, blk).astype(x_proto.dtype)
    return (
        dx,
        np.zeros(w_q3.shape, jax.dtypes.float0),
        jnp.zeros_like(scale3),
        np.zeros(jnp.shape(blk), jax.dtypes.float0),
    )


quant_matmul_stacked_vjp.defvjp(_qms_fwd, _qms_bwd)


@jax.custom_vjp
def quant_linear_gelu_stacked(x, w_q3, scale3, bias3, blk):
    """Stacked-weight variant of `quant_linear_gelu` (fused bias + gelu
    epilogue, recompute backward)."""
    return quant_matmul_stacked(
        x, w_q3, scale3, blk, bias3=bias3, activation="gelu_tanh"
    )


def _qlgs_fwd(x, w_q3, scale3, bias3, blk):
    return (
        quant_linear_gelu_stacked(x, w_q3, scale3, bias3, blk),
        (x, w_q3, scale3, bias3, blk),
    )


def _qlgs_bwd(res, dy):
    import numpy as np

    x, w_q3, scale3, bias3, blk = res
    z = quant_matmul_stacked(x, w_q3, scale3, blk, bias3=bias3)
    _, act_vjp = jax.vjp(
        lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=True), z
    )
    (dz,) = act_vjp(dy.astype(jnp.float32))
    dx = quant_matmul_t_stacked(dz.astype(dy.dtype), w_q3, scale3, blk)
    return (
        dx.astype(x.dtype),
        np.zeros(w_q3.shape, jax.dtypes.float0),
        jnp.zeros_like(scale3),
        jnp.zeros_like(bias3),
        np.zeros(jnp.shape(blk), jax.dtypes.float0),
    )


quant_linear_gelu_stacked.defvjp(_qlgs_fwd, _qlgs_bwd)


# ---------------------------------------------------------------------------
# Fused elementwise variants (serving-hot, but differentiable so the same
# model code serves QLoRA training: backward recomputes through the
# unfused composition + the transposed stacked kernel).  Frozen quantized
# leaves (w/scale/bias) get zero cotangents like every other quant vjp;
# ab/gate get REAL gradients — they chain back into the (LoRA-targeted)
# adaLN projections.
# ---------------------------------------------------------------------------


def _ln_stats(x):
    """(normalized x, rstd) for the custom_vjp backward — same reduction
    recipe as the kernel prologue via `_ln_mean_rstd`."""
    mean, rstd = _ln_mean_rstd(x)
    return (x.astype(jnp.float32) - mean) * rstd, rstd


def _seg_select(vec2, m, boundary):
    """[2-row fp32] -> [M, D] per-row segment select (main | cond)."""
    rows = jnp.arange(m)[:, None]
    return jnp.where(rows >= boundary, vec2[1:2, :], vec2[0:1, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def quant_ln_mod_linear_stacked(seg_boundary, activation, x, w_q3, scale3,
                                bias3, ab, blk):
    """act(((layernorm(x) * a_seg + b_seg) @ W_q[blk]) * scale + bias) with
    the LN + per-segment adaLN affine fused into the kernel's x load
    (PERF_NOTES headroom #1).  ab: [8, K], rows a_main/b_main/a_cond/b_cond.
    """
    return quant_matmul_stacked(
        x, w_q3, scale3, blk, bias3=bias3, activation=activation,
        ab=ab, seg_boundary=seg_boundary,
    )


def _qlml_fwd(seg_boundary, activation, x, w_q3, scale3, bias3, ab, blk):
    return (
        quant_ln_mod_linear_stacked(
            seg_boundary, activation, x, w_q3, scale3, bias3, ab, blk
        ),
        (x, w_q3, scale3, bias3, ab, blk),
    )


def _qlml_bwd(seg_boundary, activation, res, dy):
    import numpy as np

    x, w_q3, scale3, bias3, ab, blk = res
    m, k = x.shape
    xn, rstd = _ln_stats(x)
    a_seg = _seg_select(jnp.stack([ab[0], ab[2]]), m, seg_boundary)
    b_seg = _seg_select(jnp.stack([ab[1], ab[3]]), m, seg_boundary)
    if activation == "gelu_tanh":
        x_mod = (xn * a_seg + b_seg).astype(jnp.bfloat16)
        z = quant_matmul_stacked(x_mod, w_q3, scale3, blk, bias3=bias3)
        _, act_vjp = jax.vjp(
            lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=True), z
        )
        (dz,) = act_vjp(dy.astype(jnp.float32))
        dz = dz.astype(dy.dtype)
    else:
        dz = dy
    dxmod = quant_matmul_t_stacked(dz, w_q3, scale3, blk).astype(jnp.float32)
    # affine backward
    dn = dxmod * a_seg
    is_cond = jnp.arange(m)[:, None] >= seg_boundary
    da_main = jnp.sum(jnp.where(is_cond, 0.0, dxmod * xn), axis=0)
    da_cond = jnp.sum(jnp.where(is_cond, dxmod * xn, 0.0), axis=0)
    db_main = jnp.sum(jnp.where(is_cond, 0.0, dxmod), axis=0)
    db_cond = jnp.sum(jnp.where(is_cond, dxmod, 0.0), axis=0)
    dab = jnp.zeros_like(ab).at[0].set(da_main).at[1].set(db_main)
    dab = dab.at[2].set(da_cond).at[3].set(db_cond)
    # layernorm backward (no learned affine)
    dn_mean = jnp.mean(dn, axis=-1, keepdims=True)
    proj = jnp.mean(dn * xn, axis=-1, keepdims=True)
    dx = (rstd * (dn - dn_mean - xn * proj)).astype(x.dtype)
    return (
        dx,
        np.zeros(w_q3.shape, jax.dtypes.float0),
        jnp.zeros_like(scale3),
        jnp.zeros_like(bias3),
        dab,
        np.zeros(jnp.shape(blk), jax.dtypes.float0),
    )


quant_ln_mod_linear_stacked.defvjp(_qlml_fwd, _qlml_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def quant_gate_res_linear_stacked(seg_boundary, x, w_q3, scale3, bias3,
                                  resid, gate, blk):
    """resid + gate_seg(row) * ((x @ W_q[blk]) * scale + bias) — the
    adaLN-zero gated residual add fused into the kernel's store epilogue
    (PERF_NOTES headroom #2).  gate: [8, N], rows gate_main/gate_cond."""
    return quant_matmul_stacked(
        x, w_q3, scale3, blk, bias3=bias3,
        resid=resid, gate=gate, seg_boundary=seg_boundary,
    )


def _qgrl_fwd(seg_boundary, x, w_q3, scale3, bias3, resid, gate, blk):
    return (
        quant_gate_res_linear_stacked(
            seg_boundary, x, w_q3, scale3, bias3, resid, gate, blk
        ),
        (x, w_q3, scale3, bias3, gate, blk, jnp.zeros((), resid.dtype)),
    )


def _qgrl_bwd(seg_boundary, res, dy):
    import numpy as np

    x, w_q3, scale3, bias3, gate, blk, resid_proto = res
    m = x.shape[0]
    g_seg = _seg_select(jnp.stack([gate[0], gate[1]]), m, seg_boundary)
    dyf = dy.astype(jnp.float32)
    dz = (dyf * g_seg).astype(dy.dtype)
    dx = quant_matmul_t_stacked(dz, w_q3, scale3, blk)
    z = quant_matmul_stacked(x, w_q3, scale3, blk, bias3=bias3).astype(
        jnp.float32
    )
    is_cond = jnp.arange(m)[:, None] >= seg_boundary
    dg_main = jnp.sum(jnp.where(is_cond, 0.0, dyf * z), axis=0)
    dg_cond = jnp.sum(jnp.where(is_cond, dyf * z, 0.0), axis=0)
    dgate = jnp.zeros_like(gate).at[0].set(dg_main).at[1].set(dg_cond)
    return (
        dx.astype(x.dtype),
        np.zeros(w_q3.shape, jax.dtypes.float0),
        jnp.zeros_like(scale3),
        jnp.zeros_like(bias3),
        dy.astype(resid_proto.dtype),  # d(resid + ...)/d(resid) = identity
        dgate,
        np.zeros(jnp.shape(blk), jax.dtypes.float0),
    )


quant_gate_res_linear_stacked.defvjp(_qgrl_fwd, _qgrl_bwd)


@jax.custom_vjp
def quant_linear_gelu(x, w_q, scale, bias):
    """gelu_tanh((x @ w_q) * scale + bias) with the bias + activation fused
    into the quant-matmul store epilogue — the matmul output (the 4x-wide ff
    hidden, the largest elementwise tensor in a FLUX block) never makes an
    extra HBM round-trip through a separate gelu fusion.

    Differentiable wrt x: the backward recomputes the pre-activation z with
    one extra kernel call — under the training path's remat policy the
    forward is recomputed anyway, so this costs nothing new; at inference the
    backward never runs and the fusion is a pure win.  bias: [1, N] fp32.
    """
    qmm = quant_matmul_w8a8 if use_w8a8() else quant_matmul
    return qmm(x, w_q, scale, bias=bias, activation="gelu_tanh")


def _qlg_fwd(x, w_q, scale, bias):
    return quant_linear_gelu(x, w_q, scale, bias), (x, w_q, scale, bias)


def _qlg_bwd(res, dy):
    import numpy as np

    x, w_q, scale, bias = res
    qmm = quant_matmul_w8a8 if use_w8a8() else quant_matmul
    z = qmm(x, w_q, scale, bias=bias)  # recompute pre-activation
    _, act_vjp = jax.vjp(
        lambda t: jax.nn.gelu(t.astype(jnp.float32), approximate=True), z
    )
    (dz,) = act_vjp(dy.astype(jnp.float32))
    dx = quant_matmul_t(dz.astype(dy.dtype), w_q, scale)
    return (
        dx.astype(x.dtype),
        np.zeros(w_q.shape, jax.dtypes.float0),
        jnp.zeros_like(scale),
        jnp.zeros_like(bias),
    )


quant_linear_gelu.defvjp(_qlg_fwd, _qlg_bwd)


def quant_linear_apply(p, x: jnp.ndarray) -> jnp.ndarray:
    """Apply an int8-quantized linear dict to [..., in] activations via the
    Pallas kernel — on TPU natively, elsewhere in interpret mode.  The bias
    rides the kernel's fused store epilogue (no separate [M, N] HBM pass)."""
    *lead, d_in = x.shape
    x2 = x.reshape(-1, d_in)
    w_q, scale = p["kernel_q"], p["kernel_scale"]
    if w_q.ndim != 2:
        raise ValueError("quant_linear_apply expects an unstacked [K,N] slice")
    bias = p["bias"].reshape(1, -1) if "bias" in p else None
    y = quant_matmul(x2, w_q, scale.reshape(1, -1), bias=bias)
    return y.reshape(*lead, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused QKV projection kernel (stacked weights, in-kernel split + q/k RMS)
#
# One matmul over the concatenated [K, 3H] qkv weight (x read from HBM and
# W8A8-quantized in VMEM once, not three times), with the q/k/v split done
# by the OUTPUT BlockSpec — each N tile lands in its own plane of a
# [3, M, H] output, so no [M, 3H] intermediate or post-hoc jnp.split copy
# ever exists — and the per-head RMS q/k norms (block.py:84-95 /
# diffusers qk_norm) applied in the fp32 store epilogue, eliminating their
# separate elementwise HBM pass.
# ---------------------------------------------------------------------------


def _qmm_qkv_stacked_kernel(
    idx_ref, x_ref, wq_ref, scale_ref, bias_ref, nw_ref, *refs,
    num_k, jh, head_dim, w8a8, ab_boundary=None, eps=1e-6,
):
    del idx_ref
    refs = list(refs)
    if ab_boundary is not None:
        ab_ref = refs.pop(0)
        stats_ref = refs.pop(0)
    else:
        ab_ref = stats_ref = None
    o_ref, acc_ref = refs
    ki = pl.program_id(2)
    seg = pl.program_id(1) // jh  # 0=q, 1=k, 2=v

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = (
        _ln_mod_prologue(x_ref, ab_ref.at[0], stats_ref, ab_boundary)
        if ab_ref is not None
        else x_ref[...]
    )
    _accum_tile(acc_ref, x, wq_ref[0], w8a8=w8a8)

    @pl.when(ki == num_k - 1)
    def _store():
        z = acc_ref[...] * scale_ref.at[0][...] + bias_ref.at[0][...]
        bm, bn = z.shape
        zg = z.reshape(bm, bn // head_dim, head_dim)
        rms = jax.lax.rsqrt(jnp.mean(zg * zg, axis=-1, keepdims=True) + eps)
        normed = (zg * rms).reshape(bm, bn) * nw_ref[0]
        o_ref[0] = jnp.where(seg < 2, normed, z).astype(o_ref.dtype)


def _qkv_block_n(h: int, head_dim: int) -> int:
    """Largest candidate tile dividing H (so no tile straddles the q/k/v
    boundary) and a multiple of head_dim (so RMS groups stay whole);
    3072-first per the stacked tile sweep (full-width N chunks win).
    2048/1536 cover power-of-two head widths and the 1536 TP-local shards
    of the 3072-wide FLUX projections."""
    for bn in (3072, 2048, 1536, 1024, 768, 512, 384, 256, 128):
        if h % bn == 0 and bn % head_dim == 0:
            return bn
    return h


def quant_qkv_stacked(
    x: jnp.ndarray,          # [M, K]
    w_q3: jnp.ndarray,       # [NB, K, 3H] int8 (fuse_qkv_projections)
    scale3: jnp.ndarray,     # [NB, 1, 3H] fp32
    bias3: jnp.ndarray,      # [NB, 1, 3H] fp32
    norm_w: jnp.ndarray,     # [3, H] fp32: tiled norm_q / norm_k / ones
    blk: jnp.ndarray,
    head_dim: int,
    block_m: int = 512,
    interpret: Optional[bool] = None,
    w8a8: Optional[bool] = None,
    ab: Optional[jnp.ndarray] = None,   # [8, K] LN+adaLN prologue (B=1)
    seg_boundary: int = 0,
):
    """(q, k, v) each [M, H] with per-head RMS already applied to q and k.

    Forward-only (serving): LoRA-carrying projections are never fused
    (ops/quant.fuse_qkv_projections skips them), so no custom_vjp needed.
    ``ab`` fuses the block's layernorm + per-segment adaLN affine into the
    kernel's x load (same contract as `quant_matmul_stacked`: precomputed
    row stats, any k-grid depth).  Shapes the stacked tiling can't
    cover (K not divisible by the k-tile, H not a lane multiple on
    hardware) fall back to the flat kernel on a sliced stack + XLA
    split/RMS, mirroring `_quant_matmul_stacked_jit`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if w8a8 is None:
        w8a8 = use_w8a8()
    k = x.shape[1]
    n3 = w_q3.shape[-1]
    h = n3 // 3
    block_n = _qkv_block_n(h, head_dim)
    _, block_k = _stacked_blocks(k, n3)
    block_k = min(block_k, k)
    supported = (
        n3 % 3 == 0
        and h % head_dim == 0
        and k % block_k == 0
        # on hardware the weight/out N-tile must be a lane multiple (the
        # [NB, K, 3H] block can never equal the full 3H axis)
        and (interpret or block_n % 128 == 0)
    )
    if not supported:
        if ab is not None:
            x = _xla_ln_mod(x, ab, seg_boundary)
        qmm = quant_matmul_w8a8 if w8a8 else quant_matmul
        y = qmm(
            x, w_q3[blk], scale3[blk],
            bias=bias3[blk], interpret=interpret,
        ).astype(jnp.float32)
        q, kk, v = jnp.split(y, 3, axis=-1)
        m = x.shape[0]

        def rms(t, w_row):
            t4 = t.reshape(m, h // head_dim, head_dim)
            t4 = t4 * jax.lax.rsqrt(
                jnp.mean(t4 * t4, axis=-1, keepdims=True) + 1e-6
            )
            return t4.reshape(m, h) * w_row.astype(jnp.float32)

        return (
            rms(q, norm_w[0]).astype(jnp.bfloat16),
            rms(kk, norm_w[1]).astype(jnp.bfloat16),
            v.astype(jnp.bfloat16),
        )
    out = _quant_qkv_stacked_jit(
        x, w_q3, scale3, bias3, norm_w, blk, ab,
        head_dim=head_dim, block_m=block_m, interpret=interpret, w8a8=w8a8,
        seg_boundary=seg_boundary,
    )
    return out[0], out[1], out[2]


@functools.partial(
    jax.jit,
    static_argnames=("head_dim", "block_m", "interpret", "w8a8", "seg_boundary"),
)
def _quant_qkv_stacked_jit(
    x, w_q3, scale3, bias3, norm_w, blk, ab=None, *,
    head_dim, block_m=512, interpret=False, w8a8=False, seg_boundary=0,
):
    m, k = x.shape
    nb, k2, n3 = w_q3.shape
    assert k == k2 and n3 % 3 == 0, (x.shape, w_q3.shape)
    h = n3 // 3
    assert h % head_dim == 0 and norm_w.shape == (3, h), (h, norm_w.shape)
    # [3, 1, H]: a (1, 1, block_n) block keeps the TPU sublane rule happy
    # (block dim -2 == array dim -2 == 1); a (1, block_n) block over [3, H]
    # would violate it
    norm_w = norm_w.reshape(3, 1, h)
    block_n = _qkv_block_n(h, head_dim)
    _, block_k = _stacked_blocks(k, n3)
    block_k = min(block_k, k)
    assert k % block_k == 0, (k, block_k)

    stats = _ln_row_stats(x) if ab is not None else None
    x = x.astype(jnp.bfloat16)
    block_m = min(block_m, _round_up(m, 128))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        if stats is not None:
            stats = jnp.pad(stats, ((0, m_pad - m), (0, 0)))

    jh = h // block_n
    num_k = k // block_k
    vec_spec = pl.BlockSpec((1, 1, block_n), lambda i, j, ki, b: (b[0], 0, j))
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, ki, b: (i, ki)),
        pl.BlockSpec((1, block_k, block_n), lambda i, j, ki, b: (b[0], ki, j)),
        vec_spec,
        vec_spec,
        pl.BlockSpec(
            (1, 1, block_n), lambda i, j, ki, b: (j // jh, 0, j % jh)
        ),
    ]
    args = [
        x, w_q3, scale3.astype(jnp.float32), bias3.astype(jnp.float32),
        norm_w.astype(jnp.float32),
    ]
    if ab is not None:
        assert ab.shape == (8, k), ab.shape
        in_specs.append(
            pl.BlockSpec((1, 8, block_k), lambda i, j, ki, b: (0, 0, ki))
        )
        args.append(ab.astype(jnp.float32)[None])
        in_specs.append(
            pl.BlockSpec((block_m, 128), lambda i, j, ki, b: (i, 0))
        )
        args.append(stats)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // block_m, 3 * jh, num_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_m, block_n), lambda i, j, ki, b: (j // jh, i, j % jh)
        ),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_qkv_stacked_kernel,
            num_k=num_k, jh=jh, head_dim=head_dim, w8a8=w8a8,
            ab_boundary=seg_boundary if ab is not None else None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, m_pad, h), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * n3,
            bytes_accessed=m_pad * k * 2 + k * n3 + 3 * m_pad * h * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(blk, jnp.int32).reshape(1), *args)
    return out[:, :m]
