"""CLIP text encoder (ViT-L/14 text tower) in JAX.

TPU-native replacement for the CLIP-L encoder the reference uses for pooled
prompt embeddings (/root/reference/src/flux/pipeline_tools.py:36-49 via
diffusers encode_prompt).  CLIP-L text: hidden 768, 12 layers, 12 heads,
d_ff 3072, quick-GELU, causal mask, pooled output = final-LN hidden state at
the EOS token position.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_linear, init_layer_norm, layer_norm, qdot,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 3072
    max_positions: int = 77
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5

    @staticmethod
    def large() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=128, hidden=32, num_layers=2, num_heads=4, d_ff=64,
            max_positions=16, eos_token_id=127,
        )


def _init_block(key, cfg: CLIPTextConfig, dtype) -> Params:
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


def init_clip_params(key, cfg: CLIPTextConfig, dtype=jnp.bfloat16) -> Params:
    k_tok, k_pos, k_blocks = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, cfg.num_layers)
    blocks = [_init_block(k, cfg, dtype) for k in block_keys]
    return {
        "token_embed": (
            jax.random.normal(k_tok, (cfg.vocab_size, cfg.hidden)) * 0.02
        ).astype(dtype),
        "pos_embed": (
            jax.random.normal(k_pos, (cfg.max_positions, cfg.hidden)) * 0.01
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": init_layer_norm(cfg.hidden, dtype),
    }


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def clip_encode(
    params: Params, cfg: CLIPTextConfig, input_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """input_ids [B, S] -> (last_hidden [B, S, H], pooled [B, H]).

    Pooled output is the final-LN hidden state at the first EOS position,
    matching HF CLIPTextModel's pooler for the standard eos_token_id path.
    """
    b, s = input_ids.shape
    x = params["token_embed"][input_ids] + params["pos_embed"][:s]
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.hidden // cfg.num_heads))
    causal = jnp.where(
        jnp.tril(jnp.ones((s, s), jnp.bool_)), 0.0, -jnp.inf
    )[None, None]

    def block_fn(x, blk):
        h = layer_norm(x, blk["ln1"]["weight"], blk["ln1"]["bias"],
                       cfg.layer_norm_eps)

        def proj(p, t):
            y = qdot(p, t)  # int8-weight aware
            y = (y + p["bias"].astype(jnp.float32)).astype(t.dtype)
            return y.reshape(b, s, cfg.num_heads, -1).transpose(0, 2, 1, 3)

        q, k, v = proj(blk["q"], h), proj(blk["k"], h), proj(blk["v"], h)
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
            + causal
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        attn = (
            qdot(blk["o"], attn) + blk["o"]["bias"].astype(jnp.float32)
        ).astype(x.dtype)
        x = x + attn

        h = layer_norm(x, blk["ln2"]["weight"], blk["ln2"]["bias"],
                       cfg.layer_norm_eps)
        h = quick_gelu(
            (qdot(blk["fc1"], h) + blk["fc1"]["bias"].astype(jnp.float32))
            .astype(x.dtype)
        )
        h = (
            qdot(blk["fc2"], h) + blk["fc2"]["bias"].astype(jnp.float32)
        ).astype(x.dtype)
        return x + h, None

    x, _ = jax.lax.scan(block_fn, x, params["blocks"])
    x = layer_norm(
        x, params["final_ln"]["weight"], params["final_ln"]["bias"],
        cfg.layer_norm_eps,
    )
    # First EOS position per sequence (or last token if none found).
    is_eos = input_ids == cfg.eos_token_id
    has_eos = jnp.any(is_eos, axis=1)
    eos_pos = jnp.where(has_eos, jnp.argmax(is_eos, axis=1), s - 1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def clip_text_features(
    params: Params, cfg: CLIPTextConfig, input_ids: jnp.ndarray
) -> jnp.ndarray:
    """HF ``get_text_features`` equivalent: pooled output through the text
    projection head (required for CLIP-T scoring; the FLUX conditioning path
    uses the raw pooled output instead)."""
    _, pooled = clip_encode(params, cfg, input_ids)
    if "text_projection" not in params:
        raise KeyError("params lack a text_projection head")
    return qdot(params["text_projection"], pooled)
