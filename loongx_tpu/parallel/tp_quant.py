"""Tensor-parallel wrappers for the stacked int8 quant-matmul kernels.

Under pjit SPMD a Pallas custom call cannot be auto-partitioned — until
round 2 every quantized linear fell back to the XLA dequant dot whenever a
"tensor" axis was active (~1.5-2x slower than the kernels, PERF_NOTES
headroom #5).  These wrappers run the SAME stacked scalar-prefetch kernels
per shard via `shard_map` (the pattern tp_attention.py established for the
flash kernel), with the Megatron-style column/row split the TP rules in
`parallel.mesh` lay out:

  col  — W sharded on the output axis (qkv / ff.in / proj_mlp): x arrives
         replicated, each shard computes its N-slice, output stays
         N-sharded into the next op.  Bias, fused gelu, and the LN+adaLN
         prologue (full K rows per shard) all ride inside the kernel.
  row  — W sharded on the input axis (to_out / ff.out / proj_out): x
         arrives N-sharded from the preceding col op, each shard computes
         a partial sum, one psum over ICI finishes the contraction; bias
         and the gate+residual epilogue apply after the psum in XLA.
  repl — replicated weights (modulation/embedders): every shard runs the
         whole kernel redundantly — still faster than the XLA dequant dot.

Serving-only forward (no custom_vjp): training under TP keeps the XLA
dequant fallback, whose gradients GSPMD partitions automatically.

Under a `mesh_context` the wrappers ALSO shard the row (batch*seq) axis
over the data axis — batch-sharded serving and 2D (data x tensor) fused
serving run the same kernels per shard.  For pure data parallelism (DP
training / batch-sharded inference with no tensor axis),
`maybe_dp_rowshard` wraps the custom_vjp kernels so reverse-mode AD shards
the Pallas backward kernels too (round-4: kernel-grade multi-device
training — reference scope: train.py:181-182, DDP trains with full-speed
kernels per rank).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def _data_axis_for(mesh, m: int) -> Optional[str]:
    """The active mesh_context data axis if it belongs to ``mesh`` and
    divides the row count ``m``, else None (specs drop the axis)."""
    from loongx_tpu.parallel.mesh import current_dp

    dp = current_dp()
    if dp is None or dp[0] is not mesh:
        return None
    axis = dp[1]
    return axis if m % mesh.shape[axis] == 0 else None


def maybe_dp_rowshard(fn, n_row: int, n_out: int, *args):
    """Run a row-parallel kernel per data shard under an active mesh
    context (pure data parallelism: no collectives inside), or run the
    bare kernel when no data sharding applies.

    The first ``n_row`` args shard on their leading axis over the data
    axis; the rest are replicated; every output is leading-axis sharded.
    Falls back to ``fn(*args)`` directly when no non-trivial data axis is
    active, a tensor axis is active (the TP wrappers own that case), or a
    row count doesn't divide the axis.  ``fn`` keeps its custom_vjp:
    shard_map differentiates the body per shard, so DP training runs the
    Pallas forward AND backward kernels; weight/scale cotangents (zeros —
    the int8 base is frozen) psum over the data axis exactly as GSPMD
    would."""
    from loongx_tpu.parallel.mesh import current_dp, current_tp

    def plain():
        return fn(*args)

    dp = current_dp()
    if dp is None or current_tp() is not None:
        return plain()
    mesh, axis = dp
    n = mesh.shape[axis]
    for a in args[:n_row]:
        if a is None or a.shape[0] % n:
            return plain()

    def row_spec(a):
        return P(axis, *([None] * (a.ndim - 1)))

    in_specs = tuple(
        row_spec(a) if i < n_row else P() for i, a in enumerate(args)
    )
    out_specs = (
        P(axis, None) if n_out == 1 else tuple([P(axis, None)] * n_out)
    )
    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)


def tp_quant_matmul_stacked(
    kind: str,
    x2: jnp.ndarray,                 # [M, K] (row: N-sharded on last dim)
    w_q3: jnp.ndarray,               # [NB, K, N] int8 (sharded per kind)
    scale3: jnp.ndarray,             # [NB, 1, N] fp32
    blk: jnp.ndarray,
    bias2: Optional[jnp.ndarray] = None,   # [NB, N] stacked bias
    activation: Optional[str] = None,
    ab: Optional[jnp.ndarray] = None,      # [8, K] LN+adaLN prologue (col)
    seg_boundary: int = 0,
    resid: Optional[jnp.ndarray] = None,   # [M, N] (row epilogue)
    gate: Optional[jnp.ndarray] = None,    # [8, N] (row epilogue)
) -> jnp.ndarray:
    """Per-shard stacked quant matmul under the active tp_context.

    Returns [M, N]: N-sharded for "col", replicated (post-psum) for
    "row"/"repl"."""
    from loongx_tpu.ops.quant_matmul import quant_matmul_stacked
    from loongx_tpu.parallel.mesh import current_tp

    tp = current_tp()
    assert tp is not None, "tp_quant_matmul_stacked outside tp_context"
    mesh, axis = tp
    assert kind in ("col", "row", "repl"), kind
    if kind == "row":
        # the in-kernel LN prologue needs full feature rows; K is sharded
        assert ab is None and activation is None
    else:
        assert resid is None and gate is None

    wspec = {
        "col": P(None, None, axis), "row": P(None, axis, None), "repl": P()
    }[kind]
    # a simultaneous data axis (mesh_context) shards the row (batch*seq)
    # dim of x / resid / out — 2D data x tensor serving in one wrapper.
    # NOT with the ab prologue or gate epilogue: both segment rows against
    # the GLOBAL seg_boundary (img|cond split), and a row shard restarts
    # its local indices at 0 — every shard past the first would apply the
    # wrong segment's affine/gate.  Those fusions are b=1-only anyway
    # (_elementwise_fusable), so the rows are one sequence, not a batch.
    da = (
        None if (ab is not None or gate is not None)
        else _data_axis_for(mesh, x2.shape[0])
    )
    sspec = P(None, None, axis) if kind == "col" else P()
    xspec = P(da, axis) if kind == "row" else P(da, None)
    ospec = P(da, axis) if kind == "col" else P(da, None)
    bspec = P(None, axis) if kind == "col" else P()
    rspec = P(da, None)  # resid [M, N] (row epilogue)

    def local(x_l, w_l, s_l, b_l, ab_l, resid_l, gate_l, blk_l):
        nb, _, n_l = w_l.shape
        if kind == "row":
            y = quant_matmul_stacked(
                x_l, w_l, s_l.reshape(nb, 1, n_l), blk_l,
            ).astype(jnp.float32)
            y = jax.lax.psum(y, axis)
            if b_l is not None:
                y = y + jax.lax.dynamic_index_in_dim(
                    b_l, blk_l, 0, keepdims=False
                ).astype(jnp.float32)[None, :]
            if gate_l is not None:
                rows = jnp.arange(y.shape[0])[:, None]
                g = jnp.where(
                    rows >= seg_boundary, gate_l[1:2, :], gate_l[0:1, :]
                )
                y = resid_l.astype(jnp.float32) + g * y
            return y.astype(jnp.bfloat16)
        bias3 = None if b_l is None else (
            b_l.astype(jnp.float32).reshape(nb, 1, n_l)
        )
        return quant_matmul_stacked(
            x_l, w_l, s_l.reshape(nb, 1, n_l), blk_l, bias3=bias3,
            activation=activation, ab=ab_l, seg_boundary=seg_boundary,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(xspec, wspec, sspec, bspec, P(), rspec, P(), P()),
        out_specs=ospec,
        check_vma=False,
    )(x2, w_q3, scale3, bias2, ab, resid, gate, blk)


def tp_quant_qkv_stacked(
    x2: jnp.ndarray,                 # [M, K] replicated
    w_q4: jnp.ndarray,               # [NB, K, 3, H] int8, H-sharded
    scale4: jnp.ndarray,             # [NB, 1, 3, H] fp32
    bias4: jnp.ndarray,              # [NB, 1, 3, H] fp32
    norm_w: jnp.ndarray,             # [3, H] (tiled per-head q/k norms)
    blk: jnp.ndarray,
    head_dim: int,
    ab: Optional[jnp.ndarray] = None,
    seg_boundary: int = 0,
):
    """Fused-qkv projection under TP.  A flat fused [K, 3H] axis cannot
    column-shard (it would cut across the q/k/v boundary — the round-2
    refusal in parallel/mesh.py), so `quant.fuse_qkv_projections(
    tp_layout=True)` stacks q/k/v on their own axis: [NB, K, 3, H] sharded
    on H gives every shard a *complete* fused qkv stack for its head slice,
    which runs the single-kernel path locally — the refusal is lifted where
    the sharding became representable.  Outputs (q, k, v) each [M, H] stay
    head-sharded into the TP flash attention."""
    from loongx_tpu.ops.quant_matmul import quant_qkv_stacked
    from loongx_tpu.parallel.mesh import current_tp

    mesh, axis = current_tp()

    def local(x_l, w_l, s_l, b_l, nw_l, ab_l, blk_l):
        # [NB, K, 3, H/t] -> local fused [NB, K, 3*(H/t)]
        nbl, kl, _, hl = w_l.shape
        q, kk, v = quant_qkv_stacked(
            x_l, w_l.reshape(nbl, kl, 3 * hl),
            s_l.reshape(nbl, 1, 3 * hl),
            b_l.reshape(nbl, 1, 3 * hl), nw_l, blk_l, head_dim,
            ab=ab_l, seg_boundary=seg_boundary,
        )
        return q, kk, v

    hs = P(None, None, None, axis)
    # rows also shard under a 2D mesh — but not with the ab prologue, whose
    # seg_boundary addresses GLOBAL row indices (see tp_quant_matmul_stacked)
    da = None if ab is not None else _data_axis_for(mesh, x2.shape[0])
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(da, None), hs, hs, hs, P(None, axis), P(), P()),
        out_specs=(P(da, axis), P(da, axis), P(da, axis)),
        check_vma=False,
    )(x2, w_q4, scale4, bias4, norm_w, ab, blk)
