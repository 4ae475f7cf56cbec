"""FLUX-style multi-axis rotary position embeddings.

Semantics match the reference's RoPE path (diffusers ``FluxPosEmbed`` +
``apply_rotary_emb``, used via /root/reference/src/flux/transformer.py:130-134
and /root/reference/src/flux/block.py:74-99): each token carries a 3-component
position id (type/time axis, row, col); each component rotates a contiguous
slice of the head dimension (16, 56, 56 of head_dim 128 for FLUX), with
interleaved (even, odd) real/imag pairing and theta=10000.

Everything here is pure and shape-static, so it fuses cleanly under jit.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_embed(
    ids: jnp.ndarray,
    axes_dim: Sequence[int] = (16, 56, 56),
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute RoPE cos/sin tables for multi-axis ids.

    Args:
      ids: [S, A] float array of per-token position ids (A axes).
      axes_dim: per-axis head-dim slice sizes (must each be even and sum to
        head_dim).
      theta: RoPE base.

    Returns:
      (cos, sin), each [S, head_dim] float32.  Values are repeated in
      interleaved pairs, i.e. cos[..., 2k] == cos[..., 2k+1], matching the
      (even, odd) pairing used by `apply_rope`.
    """
    ids = ids.astype(jnp.float32)
    cos_parts = []
    sin_parts = []
    for axis, dim in enumerate(axes_dim):
        half = dim // 2
        freqs = 1.0 / (
            theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        )  # [half]
        angles = ids[:, axis][:, None] * freqs[None, :]  # [S, half]
        cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)  # [S, dim]
        sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)
        cos_parts.append(cos)
        sin_parts.append(sin)
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate head vectors with interleaved-pair RoPE.

    Args:
      x: [..., S, D] query or key.
      cos, sin: [S, D] tables from `rope_embed`.

    Returns:
      Array like ``x`` (same dtype), rotated in float32 internally.
    """
    xf = x.astype(jnp.float32)
    # Interleaved pairing: (x0, x1), (x2, x3), ... -> rotated = (-x1, x0), ...
    x_pair = xf.reshape(*xf.shape[:-1], -1, 2)
    x_real = x_pair[..., 0]
    x_imag = x_pair[..., 1]
    x_rot = jnp.stack([-x_imag, x_real], axis=-1).reshape(xf.shape)
    out = xf * cos + x_rot * sin
    return out.astype(x.dtype)
