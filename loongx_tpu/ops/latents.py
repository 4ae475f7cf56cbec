"""Latent token packing and position ids.

The FLUX DiT consumes VAE latents as a token sequence made by 2x2 patchifying
the [B, H, W, C] latent grid; every token carries a (0, row, col) position id.
Semantics match the reference's use of diffusers ``FluxPipeline._pack_latents``
and ``_prepare_latent_image_ids`` (via /root/reference/src/flux/
pipeline_tools.py:14-29 and generate.py:262-271,375).

We use NHWC layout (TPU-native for convs) rather than the reference's NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] latent grid -> [B, (H//2)*(W//2), C*4] tokens.

    The channel order of each token matches diffusers' ``_pack_latents``
    (C-major, then the 2x2 spatial offsets: token = [c0(0,0)..cN(0,0),
    c0(0,1).., c0(1,0).., c0(1,1)..] is *not* the order — diffusers packs as
    [B, C, H//2, 2, W//2, 2] -> permute(0, 2, 4, 1, 3, 5), i.e. per token the
    layout is C x 2 x 2 with channel slowest).
    """
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> [B, H//2, W//2, C, 2, 2] so flattening gives (c, dy, dx) order,
    # matching torch's permute(0, 2, 4, 1, 3, 5) on [B, C, H//2, 2, W//2, 2].
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of `pack_latents`: [B, S, C*4] -> [B, h, w, C] (h, w = latent
    grid size, i.e. pixel size // vae_scale)."""
    b, s, d = tokens.shape
    c = d // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, h//2, 2, w//2, 2, C]
    return x.reshape(b, h, w, c)


def latent_image_ids(h: int, w: int) -> jnp.ndarray:
    """Position ids for the packed latent tokens: [S, 3] with rows
    (0, row, col) over the (h//2, w//2) token grid.  Matches diffusers
    ``_prepare_latent_image_ids`` used by the reference."""
    rows = jnp.arange(h // 2, dtype=jnp.float32)
    cols = jnp.arange(w // 2, dtype=jnp.float32)
    ids = jnp.zeros((h // 2, w // 2, 3), dtype=jnp.float32)
    ids = ids.at[:, :, 1].add(rows[:, None])
    ids = ids.at[:, :, 2].add(cols[None, :])
    return ids.reshape(-1, 3)


def shift_ids(
    ids: jnp.ndarray,
    position_delta: tuple = (0, 0),
    position_scale: float = 1.0,
) -> jnp.ndarray:
    """Apply the condition-token position delta/scale transform
    (reference: src/flux/condition.py:126-136)."""
    ids = ids.at[:, 1].add(float(position_delta[0]))
    ids = ids.at[:, 2].add(float(position_delta[1]))
    if position_scale != 1.0:
        scale_bias = (position_scale - 1.0) / 2.0
        ids = ids.at[:, 1].multiply(position_scale)
        ids = ids.at[:, 2].multiply(position_scale)
        ids = ids.at[:, 1].add(scale_bias)
        ids = ids.at[:, 2].add(scale_bias)
    return ids
