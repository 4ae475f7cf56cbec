"""CLIP vision tower (ViT) in JAX — the image half of CLIP-I / CLIP-T.

The reference's eval harness loads HF CLIPModel for image/text features
(/root/reference/test.py:85-146).  With this tower (+ the text tower in
clip.py and projection heads), the whole metric stack runs in-framework on
TPU — no torch in the eval loop; HF checkpoints convert via
utils/convert.convert_clip_vision_state.

ViT-B/32 geometry by default (the eval model in test.py:100): 224px, 32px
patches, 12 layers, hidden 768, projection 512.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_layer_norm, init_linear, layer_norm,
)
from loongx_tpu.models.text.clip import quick_gelu, _init_block


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=16, patch_size=8, hidden=32, num_layers=2, num_heads=4,
            d_ff=64, projection_dim=16,
        )


def init_clip_vision_params(key, cfg: CLIPVisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    blocks = [
        _init_block(k, cfg, dtype)
        for k in jax.random.split(ks[0], cfg.num_layers)
    ]
    return {
        "patch_embed": {
            # conv expressed as a linear over flattened patches (HWC-major)
            "kernel": (
                jax.random.normal(
                    ks[1], (cfg.patch_size * cfg.patch_size * 3, cfg.hidden)
                ) * 0.02
            ).astype(dtype)
        },
        "class_embed": (jax.random.normal(ks[2], (cfg.hidden,)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(ks[3], (cfg.num_patches + 1, cfg.hidden)) * 0.02
        ).astype(dtype),
        "pre_ln": init_layer_norm(cfg.hidden, dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "post_ln": init_layer_norm(cfg.hidden, dtype),
        "projection": init_linear(ks[4], cfg.hidden, cfg.projection_dim,
                                  bias=False, dtype=dtype),
    }


def _patches(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, N, patch*patch*3] (row-major patches, HWC order
    inside each patch — matches a torch Conv2d(stride=patch) after kernel
    transpose in utils/convert)."""
    b, h, w, c = images.shape
    x = images.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, p, p, C]
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def clip_vision_encode(
    params: Params, cfg: CLIPVisionConfig, images: jnp.ndarray
) -> jnp.ndarray:
    """images [B, H, W, 3] (CLIP-normalised) -> projected embeddings
    [B, projection_dim] (the get_image_features output)."""
    b = images.shape[0]
    x = jnp.dot(
        _patches(images, cfg.patch_size), params["patch_embed"]["kernel"],
        preferred_element_type=jnp.float32,
    ).astype(images.dtype)
    cls = jnp.broadcast_to(params["class_embed"], (b, 1, cfg.hidden))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["pos_embed"][: x.shape[1]]
    x = layer_norm(x, params["pre_ln"]["weight"], params["pre_ln"]["bias"],
                   cfg.layer_norm_eps)

    s = x.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.hidden // cfg.num_heads))

    def block_fn(x, blk):
        h = layer_norm(x, blk["ln1"]["weight"], blk["ln1"]["bias"],
                       cfg.layer_norm_eps)

        def proj(p, t):
            y = jnp.dot(t, p["kernel"], preferred_element_type=jnp.float32)
            y = (y + p["bias"].astype(jnp.float32)).astype(t.dtype)
            return y.reshape(b, s, cfg.num_heads, -1).transpose(0, 2, 1, 3)

        q, k, v = proj(blk["q"], h), proj(blk["k"], h), proj(blk["v"], h)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        attn = (
            jnp.dot(attn, blk["o"]["kernel"], preferred_element_type=jnp.float32)
            + blk["o"]["bias"].astype(jnp.float32)
        ).astype(x.dtype)
        x = x + attn
        h = layer_norm(x, blk["ln2"]["weight"], blk["ln2"]["bias"],
                       cfg.layer_norm_eps)
        h = quick_gelu(
            (jnp.dot(h, blk["fc1"]["kernel"], preferred_element_type=jnp.float32)
             + blk["fc1"]["bias"].astype(jnp.float32)).astype(x.dtype)
        )
        h = (jnp.dot(h, blk["fc2"]["kernel"], preferred_element_type=jnp.float32)
             + blk["fc2"]["bias"].astype(jnp.float32)).astype(x.dtype)
        return x + h, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    pooled = layer_norm(
        x[:, 0], params["post_ln"]["weight"], params["post_ln"]["bias"],
        cfg.layer_norm_eps,
    )
    return jnp.dot(
        pooled, params["projection"]["kernel"],
        preferred_element_type=jnp.float32,
    )


# CLIP image-preprocessing constants (OpenAI)
CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B, H, W, 3] float [0,1] -> CLIP-normalised [B, size, size, 3]."""
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), "bilinear")
    return (images - CLIP_MEAN) / CLIP_STD
