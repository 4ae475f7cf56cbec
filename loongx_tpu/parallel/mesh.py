"""Device mesh + sharding rules.

The reference's only parallelism is NCCL data-parallel (Lightning DDP for
training, a process-group image-sharding loop for inference —
/root/reference/src/train/train.py:181-182, inference.py:177-261).  The
TPU-native equivalent is a `jax.sharding.Mesh` with named axes and
NamedSharding annotations; XLA inserts the all-reduces over ICI
(SURVEY §2d / §5 "Distributed communication backend").

Axes:
  * ``data``   — batch-dimension sharding (DDP equivalent; grads all-reduce
    over ICI automatically from sharding propagation).
  * ``tensor`` — optional tensor parallelism over the DiT's head/MLP dims,
    the idiomatic headroom lever the reference lacks (SURVEY §2d last row).

Multi-host: call `jax.distributed.initialize()` before building the mesh;
`jax.devices()` then spans hosts and the same code runs DCN+ICI hybrid.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ---------------------------------------------------------------------------
# SPMD mesh context: lets ops (attention, quant matmuls) know a mesh is
# active so Pallas kernels route through shard_map instead of being
# replicated/all-gathered by SPMD partitioning (a Pallas custom call cannot
# be auto-partitioned by GSPMD).
#
#   * tensor axis — heads / matmul output-dim sharding (TP serving);
#   * data axis   — batch-dimension sharding: the kernels are embarrassingly
#     parallel over rows/batch, so DP training and batch-sharded inference
#     keep the SAME Pallas flash-attention fwd/bwd and int8 custom_vjp
#     kernels that make the single-chip path fast (round-3 gap: under any
#     mesh, training lost the kernels to the XLA fallback).
# ---------------------------------------------------------------------------

import contextlib

_TP_STATE = {"mesh": None, "axis": "tensor", "data_axis": None}


@contextlib.contextmanager
def tp_context(mesh: "Mesh", axis: str = "tensor"):
    """Activate tensor parallelism for ops that need manual partitioning
    (the Pallas attention kernel).  Use around jit-traced calls when
    mesh.shape[axis] > 1."""
    prev = dict(_TP_STATE)
    _TP_STATE.update(mesh=mesh, axis=axis, data_axis=None)
    try:
        yield
    finally:
        _TP_STATE.update(prev)


@contextlib.contextmanager
def mesh_context(
    mesh: "Mesh", data_axis: str = "data", tensor_axis: str = "tensor"
):
    """Activate BOTH mesh axes for the Pallas kernel wrappers: batch shards
    over ``data_axis`` (DP train / sharded batch inference) and heads /
    matmul dims over ``tensor_axis`` (TP serving).  Either axis may be
    trivial (extent 1) — the wrappers drop it from their specs."""
    prev = dict(_TP_STATE)
    _TP_STATE.update(mesh=mesh, axis=tensor_axis, data_axis=data_axis)
    try:
        yield
    finally:
        _TP_STATE.update(prev)


def current_tp():
    """(mesh, axis) if a non-trivial TP context is active, else None."""
    mesh, axis = _TP_STATE["mesh"], _TP_STATE["axis"]
    if mesh is not None and mesh.shape.get(axis, 1) > 1:
        return mesh, axis
    return None


def current_dp():
    """(mesh, data_axis) if a mesh_context with a non-trivial data axis is
    active, else None."""
    mesh, axis = _TP_STATE["mesh"], _TP_STATE["data_axis"]
    if mesh is not None and axis is not None and mesh.shape.get(axis, 1) > 1:
        return mesh, axis
    return None


def make_mesh(
    data: int = -1,
    tensor: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "tensor") mesh.  data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
        data = n // tensor
    assert data * tensor == n, f"mesh {data}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, ("data", "tensor"))


# ---------------------------------------------------------------------------
# Parameter sharding rules (tensor parallelism over the DiT)
# ---------------------------------------------------------------------------

# Path-regex -> PartitionSpec for the *last two* dims of each kernel.
# Column-parallel (shard output dim) for QKV / MLP-in / modulation;
# row-parallel (shard input dim) for output projections; everything else
# replicated.  Biases of column-parallel layers shard on their only dim.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # double blocks.  ``kernel(_q)?`` covers int8-quantized trees (kernel_q
    # [*, K, N] + kernel_scale [*, 1, N]): N-sharded families shard the
    # per-out-channel scales the same way; K-sharded families replicate them.
    (r"double_blocks/attn/to_(q|k|v)/kernel(_q)?$", P(None, None, "tensor")),
    (r"double_blocks/attn/to_(q|k|v)/kernel_scale", P(None, None, "tensor")),
    (r"double_blocks/attn/add_(q|k|v)_proj/kernel(_q)?$", P(None, None, "tensor")),
    (r"double_blocks/attn/add_(q|k|v)_proj/kernel_scale", P(None, None, "tensor")),
    (r"double_blocks/attn/to_(q|k|v)/bias", P(None, "tensor")),
    (r"double_blocks/attn/add_(q|k|v)_proj/bias", P(None, "tensor")),
    (r"double_blocks/attn/to_out/kernel(_q)?$", P(None, "tensor", None)),
    (r"double_blocks/attn/to_add_out/kernel(_q)?$", P(None, "tensor", None)),
    (r"double_blocks/ff(_context)?/in/kernel(_q)?$", P(None, None, "tensor")),
    (r"double_blocks/ff(_context)?/in/kernel_scale", P(None, None, "tensor")),
    (r"double_blocks/ff(_context)?/in/bias", P(None, "tensor")),
    (r"double_blocks/ff(_context)?/out/kernel(_q)?$", P(None, "tensor", None)),
    # single blocks
    (r"single_blocks/attn/to_(q|k|v)/kernel(_q)?$", P(None, None, "tensor")),
    (r"single_blocks/attn/to_(q|k|v)/kernel_scale", P(None, None, "tensor")),
    (r"single_blocks/attn/to_(q|k|v)/bias", P(None, "tensor")),
    (r"single_blocks/proj_mlp/kernel(_q)?$", P(None, None, "tensor")),
    (r"single_blocks/proj_mlp/kernel_scale", P(None, None, "tensor")),
    (r"single_blocks/proj_mlp/bias", P(None, "tensor")),
    (r"single_blocks/proj_out/kernel(_q)?$", P(None, "tensor", None)),
    # TP-layout fused qkv (quant.fuse_qkv_projections(tp_layout=True)):
    # q/k/v stacked on their own axis so the HEAD axis (last) shards
    # without cutting the q/k/v boundary — consumed per-shard by
    # parallel/tp_quant.tp_quant_qkv_stacked
    (r"(to_qkv|add_qkv_proj)/kernel(_q)?$", P(None, None, None, "tensor")),
    (r"(to_qkv|add_qkv_proj)/kernel_scale", P(None, None, None, "tensor")),
    (r"(to_qkv|add_qkv_proj)/bias", P(None, None, "tensor")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(
    params: Dict[str, Any], mesh: Mesh, tensor_parallel: bool = True
) -> Dict[str, Any]:
    """NamedSharding tree for a FLUX param tree.  Replicates everything when
    tensor_parallel=False or the tensor axis is trivial."""
    use_tp = tensor_parallel and mesh.shape.get("tensor", 1) > 1
    if use_tp:
        # FLAT serving-fused qkv ([*, K, 3H]) is incompatible with TP — a
        # column shard of the fused axis would split heads across q/k/v
        # boundaries.  The TP-LAYOUT form ([*, K, 3, H], q/k/v stacked on
        # their own axis; fuse_qkv_projections(tp_layout=True)) shards its
        # head axis cleanly and is allowed.
        flat_fused = [
            _path_str(p)
            for p, leaf in jax.tree_util.tree_leaves_with_path(params)
            if ("to_qkv" in _path_str(p) or "add_qkv_proj" in _path_str(p))
            and _path_str(p).split("/")[-1] in ("kernel", "kernel_q")
            and getattr(leaf, "ndim", 0) in (2, 3)
        ]
        if flat_fused:
            raise ValueError(
                "tensor parallelism requires unfused or TP-layout fused "
                f"qkv projections (found flat-fused {flat_fused[0]}...): "
                "quantize with fuse_qkv=False, or re-fuse with "
                "fuse_qkv_projections(tp_layout=True)"
            )

    def rule(path, leaf):
        if use_tp:
            ps = _path_str(path)
            for pattern, spec in _TP_RULES:
                if re.search(pattern, ps):
                    # trim spec to leaf rank (stacked-block leading axis
                    # already accounted for in the rules)
                    ndim = leaf.ndim
                    spec_tuple = tuple(spec)[-ndim:]
                    if len(spec_tuple) < ndim:
                        spec_tuple = (None,) * (ndim - len(spec_tuple)) + spec_tuple
                    return NamedSharding(mesh, P(*spec_tuple))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """Place a param tree on the mesh according to the rules."""
    shardings = param_sharding_rules(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis over the data axis.  Leaves whose
    leading dim is not divisible by the per-process data-axis extent
    (per-token ids, scalars) are replicated instead.

    Multi-host: each process passes its OWN local batch, which becomes that
    process's shard of a global [local_batch * num_hosts, ...] array
    (``jax.make_array_from_process_local_data``) — a plain device_put would
    misread every host's local rows as the same global batch, training a
    patchwork and discarding (H-1)/H of each host's samples.  Replicated
    leaves must be identical across hosts (position ids / scalars derived
    from shapes and config are)."""
    n_data = mesh.shape.get("data", 1)
    n_proc = jax.process_count()
    per_proc = max(1, n_data // n_proc)
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def put(x):
        sharded = getattr(x, "ndim", 0) >= 1 and x.shape[0] % per_proc == 0
        if n_proc > 1:
            import numpy as _np

            return jax.make_array_from_process_local_data(
                batch_sharding if sharded else repl, _np.asarray(x)
            )
        return jax.device_put(x, batch_sharding if sharded else repl)

    return jax.tree.map(put, batch)
