"""FLUX VAE (AutoencoderKL) in JAX, NHWC layout.

TPU-native equivalent of the diffusers AutoencoderKL the reference drives via
``pipeline.vae.encode/decode`` (/root/reference/src/flux/pipeline_tools.py:10-13
and generate.py:375-379).  FLUX.1 VAE shape: 16 latent channels, block
channels (128, 256, 512, 512), 2 resnets per encoder block / 3 per decoder
block, one single-head spatial-attention mid block, no quant convs;
scaling_factor=0.3611, shift_factor=0.1159.

All convs are lax.conv_general_dilated in NHWC/HWIO (the MXU-friendly layout);
GroupNorm statistics are computed in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import Params, silu

DN = ("NHWC", "HWIO", "NHWC")


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_channels) - 1)

    @staticmethod
    def flux() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            latent_channels=4, block_channels=(8, 16), layers_per_block=1,
            norm_groups=4,
        )


# ---------------------------------------------------------------------------
# Init helpers
# ---------------------------------------------------------------------------


def _init_conv(key, kh, kw, cin, cout, dtype) -> Params:
    fan_in = kh * kw * cin
    scale = 1.0 / jnp.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(
            k1, (kh, kw, cin, cout), jnp.float32, -scale, scale
        ).astype(dtype),
        "bias": jax.random.uniform(k2, (cout,), jnp.float32, -scale, scale).astype(
            dtype
        ),
    }


def _init_gn(c, dtype) -> Params:
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_gn(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_gn(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_gn(c, dtype),
        "to_q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "to_k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "to_v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "to_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


class _KeyGen:
    """Counter-based key stream via ``fold_in``.

    Iterating ``jax.random.split(key, n)`` pulls each key to the host one by
    one (one device RPC per key) — slow everywhere and a hard failure on
    remote-PJRT platforms.  ``fold_in`` stays a traced device op.
    """

    def __init__(self, key):
        self._key = key
        self._i = 0

    def __next__(self):
        self._i += 1
        return jax.random.fold_in(self._key, self._i)


def init_vae_params(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = _KeyGen(key)
    ch = cfg.block_channels

    # --- encoder ---
    enc: Params = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_channels, ch[0], dtype)}
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {}
        for j in range(cfg.layers_per_block):
            block[f"resnet_{j}"] = _init_resnet(
                next(keys), cin if j == 0 else cout, cout, dtype
            )
        if i < len(ch) - 1:
            block["downsample"] = _init_conv(next(keys), 3, 3, cout, cout, dtype)
        enc[f"down_{i}"] = block
        cin = cout
    enc["mid"] = {
        "resnet_0": _init_resnet(next(keys), cin, cin, dtype),
        "attn": _init_attn(next(keys), cin, dtype),
        "resnet_1": _init_resnet(next(keys), cin, cin, dtype),
    }
    enc["norm_out"] = _init_gn(cin, dtype)
    enc["conv_out"] = _init_conv(next(keys), 3, 3, cin, 2 * cfg.latent_channels, dtype)

    # --- decoder ---
    rch = tuple(reversed(ch))
    dec: Params = {
        "conv_in": _init_conv(next(keys), 3, 3, cfg.latent_channels, rch[0], dtype)
    }
    dec["mid"] = {
        "resnet_0": _init_resnet(next(keys), rch[0], rch[0], dtype),
        "attn": _init_attn(next(keys), rch[0], dtype),
        "resnet_1": _init_resnet(next(keys), rch[0], rch[0], dtype),
    }
    cin = rch[0]
    for i, cout in enumerate(rch):
        block = {}
        for j in range(cfg.layers_per_block + 1):
            block[f"resnet_{j}"] = _init_resnet(
                next(keys), cin if j == 0 else cout, cout, dtype
            )
        if i < len(rch) - 1:
            block["upsample"] = _init_conv(next(keys), 3, 3, cout, cout, dtype)
        dec[f"up_{i}"] = block
        cin = cout
    dec["norm_out"] = _init_gn(cin, dtype)
    dec["conv_out"] = _init_conv(next(keys), 3, 3, cin, cfg.in_channels, dtype)

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _conv(p: Params, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    )
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _group_norm(p: Params, x, groups: int, eps: float = 1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _resnet(p: Params, x, groups: int):
    h = _conv(p["conv1"], silu(_group_norm(p["norm1"], x, groups)))
    h = _conv(p["conv2"], silu(_group_norm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = _conv(p["shortcut"], x)
    return x + h


def _spatial_attn(p: Params, x, groups: int):
    """Single-head spatial self-attention over H*W (VAE mid block)."""
    b, h, w, c = x.shape
    y = _group_norm(p["norm"], x, groups)
    q = _conv(p["to_q"], y).reshape(b, h * w, c)
    k = _conv(p["to_k"], y).reshape(b, h * w, c)
    v = _conv(p["to_v"], y).reshape(b, h * w, c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(c)), axis=-1)
    out = jnp.einsum(
        "bqk,bkc->bqc", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    out = _conv(p["to_out"], out.reshape(b, h, w, c))
    return x + out


def vae_encode(
    params: Params, cfg: VAEConfig, images: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images [B,H,W,3] in [-1,1] -> (mean, logvar), each
    [B, H/ds, W/ds, latent_channels]."""
    p = params["encoder"]
    g = cfg.norm_groups
    x = _conv(p["conv_in"], images)
    for i in range(len(cfg.block_channels)):
        block = p[f"down_{i}"]
        for j in range(cfg.layers_per_block):
            x = _resnet(block[f"resnet_{j}"], x, g)
        if "downsample" in block:
            # diffusers pads (0,1,0,1) then convs stride 2 with VALID
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(block["downsample"], x, stride=2, padding="VALID")
    x = _resnet(p["mid"]["resnet_0"], x, g)
    x = _spatial_attn(p["mid"]["attn"], x, g)
    x = _resnet(p["mid"]["resnet_1"], x, g)
    x = silu(_group_norm(p["norm_out"], x, g))
    moments = _conv(p["conv_out"], x)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_sample(mean, logvar, key) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    noise = jax.random.normal(key, mean.shape, jnp.float32)
    return (mean.astype(jnp.float32) + std * noise).astype(mean.dtype)


def vae_decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B,h,w,C] (unscaled/unshifted) -> images [B,H,W,3] in [-1,1]."""
    p = params["decoder"]
    g = cfg.norm_groups
    x = _conv(p["conv_in"], latents)
    x = _resnet(p["mid"]["resnet_0"], x, g)
    x = _spatial_attn(p["mid"]["attn"], x, g)
    x = _resnet(p["mid"]["resnet_1"], x, g)
    n_up = len(cfg.block_channels)
    for i in range(n_up):
        block = p[f"up_{i}"]
        for j in range(cfg.layers_per_block + 1):
            x = _resnet(block[f"resnet_{j}"], x, g)
        if "upsample" in block:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = _conv(block["upsample"], x)
    x = silu(_group_norm(p["norm_out"], x, g))
    return _conv(p["conv_out"], x)


def scale_latents(cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """VAE sample -> model space (reference: pipeline_tools.py:11-13)."""
    return (latents - cfg.shift_factor) * cfg.scaling_factor


def unscale_latents(cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """model space -> VAE space (reference: generate.py:376-378)."""
    return latents / cfg.scaling_factor + cfg.shift_factor
