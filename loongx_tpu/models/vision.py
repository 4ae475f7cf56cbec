"""Generic pre-LN ViT encoder (DINO-style) in JAX.

Completes the in-framework eval stack: the reference's DINO-I metric loads
``torch.hub dino_vits16`` CLS features (/root/reference/test.py:46-82); this
tower + ``utils/convert.convert_vit_state`` runs the same ViT-S/16 on TPU
with no torch.  Standard ViT: patch conv, CLS token, learned positions,
pre-LN blocks with exact-GELU MLPs, final LayerNorm; the DINO feature is the
final CLS state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_layer_norm, init_linear, layer_norm,
)
from loongx_tpu.models.text.clip_vision import _patches


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden: int = 384
    num_layers: int = 12
    num_heads: int = 6
    d_ff: int = 1536
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def dino_s16() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(image_size=16, patch_size=8, hidden=32, num_layers=2,
                         num_heads=4, d_ff=64)


def _init_block(key, cfg: ViTConfig, dtype):
    h = cfg.hidden
    ks = jax.random.split(key, 6)
    return {
        "ln1": init_layer_norm(h, dtype),
        "q": init_linear(ks[0], h, h, dtype=dtype),
        "k": init_linear(ks[1], h, h, dtype=dtype),
        "v": init_linear(ks[2], h, h, dtype=dtype),
        "o": init_linear(ks[3], h, h, dtype=dtype),
        "ln2": init_layer_norm(h, dtype),
        "fc1": init_linear(ks[4], h, cfg.d_ff, dtype=dtype),
        "fc2": init_linear(ks[5], cfg.d_ff, h, dtype=dtype),
    }


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    blocks = [
        _init_block(k, cfg, dtype)
        for k in jax.random.split(ks[0], cfg.num_layers)
    ]
    return {
        "patch_embed": init_linear(
            ks[1], cfg.patch_size * cfg.patch_size * 3, cfg.hidden, dtype=dtype
        ),
        "cls_token": (jax.random.normal(ks[2], (cfg.hidden,)) * 0.02).astype(dtype),
        "pos_embed": (
            jax.random.normal(ks[3], (cfg.num_patches + 1, cfg.hidden)) * 0.02
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": init_layer_norm(cfg.hidden, dtype),
    }


def vit_encode(params: Params, cfg: ViTConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] (normalised) -> CLS features [B, hidden]."""
    b = images.shape[0]
    x = jnp.dot(
        _patches(images, cfg.patch_size), params["patch_embed"]["kernel"],
        preferred_element_type=jnp.float32,
    )
    if "bias" in params["patch_embed"]:
        x = x + params["patch_embed"]["bias"].astype(jnp.float32)
    x = x.astype(images.dtype)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][: x.shape[1]]

    s = x.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.hidden // cfg.num_heads))
    eps = cfg.layer_norm_eps

    def block_fn(x, blk):
        h = layer_norm(x, blk["ln1"]["weight"], blk["ln1"]["bias"], eps)

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
        h = layer_norm(x, blk["ln2"]["weight"], blk["ln2"]["bias"], eps)
        h = jax.nn.gelu(
            (jnp.dot(h, blk["fc1"]["kernel"], preferred_element_type=jnp.float32)
             + blk["fc1"]["bias"].astype(jnp.float32)).astype(x.dtype),
            approximate=False,
        )
        h = (jnp.dot(h, blk["fc2"]["kernel"], preferred_element_type=jnp.float32)
             + blk["fc2"]["bias"].astype(jnp.float32)).astype(x.dtype)
        return x + h, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    x = layer_norm(
        x, params["final_ln"]["weight"], params["final_ln"]["bias"], eps
    )
    return x[:, 0].astype(jnp.float32)


# ImageNet normalisation (what HF's DINO processor applies)
IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def vit_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), "bilinear")
    return (images - IMAGENET_MEAN) / IMAGENET_STD
