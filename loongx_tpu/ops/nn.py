"""Minimal functional NN building blocks (pure pytree params).

We deliberately avoid a module framework: every layer is an ``init_*`` function
producing a param dict plus an apply function.  This keeps the whole model a
transparent pytree — trivial to shard with NamedSharding, to LoRA-delta, and
to convert from HF safetensors.

Matmuls run in the array dtype (bf16 on TPU) with float32 accumulation via
``preferred_element_type``; norms compute statistics in float32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def init_linear(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
    scale: Optional[float] = None,
) -> Params:
    if scale is None:
        # torch nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
        scale = 1.0 / math.sqrt(in_dim)
    kkey, bkey = jax.random.split(key)
    p: Params = {
        "kernel": jax.random.uniform(
            kkey, (in_dim, out_dim), dtype=jnp.float32, minval=-scale, maxval=scale
        ).astype(dtype)
    }
    if bias:
        p["bias"] = jax.random.uniform(
            bkey, (out_dim,), dtype=jnp.float32, minval=-scale, maxval=scale
        ).astype(dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = qdot(p, x)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def qdot(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x @ kernel with transparent int8-weight support (fp32 result).

    Accepts {kernel} or {kernel_q, kernel_scale} linears (ops/quant.py), so
    the text encoders / VAE can serve from int8 weights — required for the
    full pipeline (T5-XXL + CLIP + VAE + 12B DiT) to coexist in a ~14 GiB
    chip.  These paths run once per prompt/image (not per denoise step), so
    the XLA dequant (transient per-layer bf16 copy) is the right tradeoff —
    the Pallas tile-dequant kernel stays on the DiT hot path."""
    if "kernel_q" in p:
        w = (
            p["kernel_q"].astype(jnp.float32) * p["kernel_scale"]
        ).astype(x.dtype)
    else:
        w = p["kernel"]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm with float32 statistics; affine optional (adaLN uses none)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(
    x: jnp.ndarray, weight: Optional[jnp.ndarray] = None, eps: float = 1e-6
) -> jnp.ndarray:
    """RMSNorm (used for FLUX per-head q/k norms and T5)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def init_layer_norm(dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    return {
        "weight": jnp.ones((dim,), dtype=dtype),
        "bias": jnp.zeros((dim,), dtype=dtype),
    }


def init_rms_norm(dim: int, dtype: jnp.dtype = jnp.float32) -> Params:
    return {"weight": jnp.ones((dim,), dtype=dtype)}


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximate GELU (FLUX MLPs use approximate='tanh')."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# MLP (Sequential of Linears) helpers
# ---------------------------------------------------------------------------


def init_mlp(
    key: jax.Array,
    dims: Sequence[int],
    bias: bool = True,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Init a stack of linears dims[0]->dims[1]->...; activations applied by
    the caller's apply function."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"linear_{i}": init_linear(keys[i], dims[i], dims[i + 1], bias, dtype)
        for i in range(len(dims) - 1)
    }


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def tree_cast(params: Params, dtype: jnp.dtype) -> Params:
    """Cast all floating-point leaves to ``dtype``."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)
