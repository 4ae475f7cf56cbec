"""Unified 3-stream attention for condition-token FLUX.

The reference concatenates [txt, img, cond] into one sequence and runs a
single SDPA with optional block-structured masks/biases
(/root/reference/src/flux/block.py:101-131):

  * ``union`` (default): full bidirectional attention across all streams.
  * ``no_union`` (union_cond_attn=False): cond tokens and non-cond tokens
    cannot attend to each other (block-diagonal).
  * ``independent`` (independent_condition=True): cond queries cannot see
    non-cond keys (one-way block).
  * ``c_factor`` (condition_scale != 1): additive log-bias on the
    cond<->non-cond blocks; when set it REPLACES any mask, matching the
    reference's precedence (block.py:121-128).

Because the mask structure depends only on one boundary index
(txt_len + img_len), we never materialise an [S, S] mask: the XLA path builds
it from iota (fused into the softmax), and the Pallas path computes it
per-tile inside the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MODES = ("union", "no_union", "independent")


def _block_bias(
    s_q: int, s_kv: int, cond_start: int, mode: str, c_factor: Optional[jnp.ndarray]
) -> Optional[jnp.ndarray]:
    """Build the [S_q, S_kv] additive bias (float32) or None for plain attn."""
    if c_factor is None and mode == "union":
        return None
    row_is_cond = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_kv), 0) >= cond_start
    col_is_cond = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_kv), 1) >= cond_start
    if c_factor is not None:
        # Additive log-bias on both cross blocks; replaces masks (reference
        # precedence: block.py:121-128).
        bias = jnp.where(
            row_is_cond != col_is_cond, jnp.log(c_factor.astype(jnp.float32)), 0.0
        )
        return bias
    if mode == "no_union":
        allowed = row_is_cond == col_is_cond
    elif mode == "independent":
        allowed = ~(row_is_cond & ~col_is_cond)
    else:
        raise ValueError(f"unknown attention mode {mode!r}")
    return jnp.where(allowed, 0.0, -jnp.inf)


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference attention in pure XLA.  q/k/v: [B, H, S, Dh]."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(head_dim))
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def unified_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    cond_len: int = 0,
    mode: str = "union",
    c_factor: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    backend: str = "auto",
    layout: str = "bhsd",
) -> jnp.ndarray:
    """Attention over the unified [txt|img|cond] sequence.

    Args:
      q, k, v: [B, H, S, Dh] (layout="bhsd") or [B, S, H, Dh]
        (layout="bshd" — the projection output layout; on the Pallas path the
        kernel head-slices directly, so no HBM transpose is ever paid); the
        last ``cond_len`` positions are condition tokens.
      cond_len: static number of condition tokens (0 = no condition stream).
      mode: one of MODES; see module docstring.
      c_factor: optional scalar condition-strength factor (traced); when given
        it overrides ``mode`` with the additive log-bias formulation.
      rope: optional (cos, sin) [S, Dh] tables — RoPE is applied to q/k
        inside the Pallas kernel (fused), or up front on the XLA path.
      backend: "auto" | "xla" | "pallas".

    Returns: same layout as the inputs, in q's dtype.
    """
    if mode not in MODES:
        raise ValueError(f"unknown attention mode {mode!r}")
    if layout not in ("bhsd", "bshd"):
        raise ValueError(f"unknown layout {layout!r}")
    bshd = layout == "bshd"
    s = q.shape[1] if bshd else q.shape[2]
    cond_start = s - cond_len
    if cond_len == 0:
        mode, c_factor = "union", None

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from loongx_tpu.parallel.mesh import current_dp, current_tp

        tp = current_tp()
        dp = current_dp()
        b = q.shape[0]
        h = q.shape[2] if bshd else q.shape[1]
        # drop an axis whose extent doesn't divide its dimension (e.g. a
        # batch-1 serving call under a data mesh) — the remaining axis (or
        # the bare kernel) still runs correctly
        if tp is not None and h % tp[0].shape[tp[1]]:
            tp = None
        if dp is not None and b % dp[0].shape[dp[1]]:
            dp = None
        if tp is not None or dp is not None:
            # heads sharded over the tensor axis and/or batch over the data
            # axis — run the kernel per-shard under shard_map (a bare Pallas
            # call would be replicated/all-gathered by SPMD partitioning)
            from loongx_tpu.parallel.tp_attention import tp_flash_attention

            mesh = (tp or dp)[0]
            return tp_flash_attention(
                mesh, q, k, v, cond_start=cond_start, mode=mode,
                c_factor=c_factor, rope=rope,
                axis=tp[1] if tp else None,
                batch_axis=dp[1] if dp else None,
                layout=layout,
            )
        from loongx_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, cond_start=cond_start, mode=mode, c_factor=c_factor,
            rope=rope, layout=layout,
        )
    if bshd:
        # XLA reference path works head-major; transposes fuse fine off-TPU
        q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    if rope is not None:
        from loongx_tpu.ops.rope import apply_rope

        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    bias = _block_bias(s, s, cond_start, mode, c_factor)
    out = attention_xla(q, k, v, bias)
    return jnp.swapaxes(out, 1, 2) if bshd else out
