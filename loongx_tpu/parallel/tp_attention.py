"""Tensor-parallel flash attention via shard_map.

Under pjit SPMD, a Pallas custom call cannot be auto-partitioned — XLA would
all-gather its operands, destroying tensor parallelism exactly at the hot
op.  `tp_flash_attention` wraps the kernel in `shard_map` over the mesh's
"tensor" axis: heads stay sharded (attention is embarrassingly parallel over
heads), each device runs the kernel on its head shard, no collectives.

Use when running the DiT with `mesh.tensor > 1` on real multi-chip TPU;
single-chip (and the CPU test mesh) work identically.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def tp_flash_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    cond_start: int,
    mode: str = "union",
    c_factor: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    axis: Optional[str] = "tensor",
    batch_axis: Optional[str] = None,
    interpret: Optional[bool] = None,
    layout: str = "bhsd",
) -> jnp.ndarray:
    """q/k/v: [B, H, S, D] ("bhsd") or [B, S, H, D] ("bshd") with H sharded
    over ``axis`` and/or B sharded over ``batch_axis`` (either may be None).
    Output sharded the same way.  Attention is embarrassingly parallel over
    both batch and heads, so no collectives run inside — and the wrapped
    kernel keeps its custom_vjp: reverse-mode AD shards the SAME Pallas
    dQ/dKV backward kernels per shard (kernel-grade DP training)."""
    from loongx_tpu.ops.flash_attention import flash_attention

    head_sharding = (
        P(batch_axis, None, axis, None) if layout == "bshd"
        else P(batch_axis, axis, None, None)
    )

    def local_attn(q_l, k_l, v_l, cf, rope_cos, rope_sin):
        rp = None if rope_cos is None else (rope_cos, rope_sin)
        return flash_attention(
            q_l, k_l, v_l, cond_start=cond_start, mode=mode, c_factor=cf,
            rope=rp, interpret=interpret, layout=layout,
        )

    cf = c_factor
    cos, sin = rope if rope is not None else (None, None)
    return shard_map(
        local_attn,
        mesh=mesh,
        in_specs=(head_sharding, head_sharding, head_sharding, P(), P(), P()),
        out_specs=head_sharding,
        check_vma=False,
    )(q, k, v, cf, cos, sin)
