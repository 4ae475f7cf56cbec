"""MarianMT translation in JAX (zh->en instruction translation).

The reference demo translates Whisper's Chinese transcription with HF
``MarianMTModel`` (/root/reference/inference-demo.py:113-133, Helsinki-NLP
opus-mt-zh-en).  This is a from-scratch JAX Marian: post-LN
encoder-decoder with static sinusoidal positions, tied embeddings and the
final-logits bias, plus fixed-buffer greedy decode (same KV-free design
as models/text/whisper.py — translations are tens of tokens).  Weights
convert from HF safetensors (utils/convert.convert_marian_state); numerics
golden-tested against ``transformers`` MarianMTModel
(tests/test_speech_models.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_layer_norm, init_linear, layer_norm, linear, qdot,
)


@dataclasses.dataclass(frozen=True)
class MarianConfig:
    vocab_size: int = 65001
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    d_ff: int = 2048
    max_positions: int = 512
    decoder_start_token_id: int = 65000  # = pad for opus-mt
    pad_token_id: int = 65000
    eos_token_id: int = 0
    activation: str = "swish"  # opus-mt checkpoints; HF default is gelu
    scale_embedding: bool = True
    layer_norm_eps: float = 1e-5

    @staticmethod
    def opus_mt() -> "MarianConfig":
        return MarianConfig()

    @staticmethod
    def tiny() -> "MarianConfig":
        return MarianConfig(
            vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
            num_heads=4, d_ff=64, max_positions=64, decoder_start_token_id=98,
            pad_token_id=98, eos_token_id=0,
        )

    @staticmethod
    def from_hf(cfg: dict) -> "MarianConfig":
        return MarianConfig(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            decoder_layers=cfg["decoder_layers"],
            num_heads=cfg["encoder_attention_heads"],
            d_ff=cfg["encoder_ffn_dim"],
            max_positions=cfg["max_position_embeddings"],
            decoder_start_token_id=cfg["decoder_start_token_id"],
            pad_token_id=cfg["pad_token_id"],
            eos_token_id=cfg["eos_token_id"],
            activation=cfg.get("activation_function", "swish"),
            scale_embedding=cfg.get("scale_embedding", True),
        )


def sinusoid_positions_marian(length: int, d: int) -> np.ndarray:
    """Marian/fairseq sinusoids: interleaved-by-half [sin(0..d/2) | cos]."""
    pos = np.arange(length)[:, None]
    inv = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    out = np.zeros((length, d), np.float32)
    out[:, 0 : d // 2] = np.sin(pos * inv)
    out[:, d // 2 :] = np.cos(pos * inv)
    return out


def _init_attn(key, d: int, dtype) -> Params:
    ks = jax.random.split(key, 4)
    return {n: init_linear(ks[i], d, d, dtype=dtype)
            for i, n in enumerate(("q", "k", "v", "o"))}


def _init_enc_block(key, cfg: MarianConfig, dtype) -> Params:
    d = cfg.d_model
    ks = jax.random.split(key, 3)
    return {
        "attn": _init_attn(ks[0], d, dtype),
        "ln_attn": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[1], d, cfg.d_ff, dtype=dtype),
        "fc2": init_linear(ks[2], cfg.d_ff, d, dtype=dtype),
        "ln_ff": init_layer_norm(d, dtype),
    }


def _init_dec_block(key, cfg: MarianConfig, dtype) -> Params:
    d = cfg.d_model
    ks = jax.random.split(key, 4)
    return {
        "self_attn": _init_attn(ks[0], d, dtype),
        "ln_self": init_layer_norm(d, dtype),
        "cross_attn": _init_attn(ks[1], d, dtype),
        "ln_cross": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[2], d, cfg.d_ff, dtype=dtype),
        "fc2": init_linear(ks[3], cfg.d_ff, d, dtype=dtype),
        "ln_ff": init_layer_norm(d, dtype),
    }


def init_marian_params(key, cfg: MarianConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    stack = lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model))
                  * 0.02).astype(dtype),
        "pos": jnp.asarray(
            sinusoid_positions_marian(cfg.max_positions, cfg.d_model), dtype
        ),
        "enc_blocks": stack([
            _init_enc_block(k, cfg, dtype)
            for k in jax.random.split(ks[1], cfg.encoder_layers)
        ]),
        "dec_blocks": stack([
            _init_dec_block(k, cfg, dtype)
            for k in jax.random.split(ks[2], cfg.decoder_layers)
        ]),
        "logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
    }


def _act(cfg: MarianConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.activation in ("swish", "silu"):
        return jax.nn.silu(x)
    return jax.nn.gelu(x, approximate=False)


def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return layer_norm(x, p["weight"], p["bias"], eps)


def _heads(y: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = y.shape
    return y.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _attention(attn, x_q, x_kv, num_heads, bias=None):
    b, s_q, d = x_q.shape
    scale = (d // num_heads) ** -0.5

    def proj(p, t):
        return _heads(linear(p, t), num_heads)

    q = proj(attn["q"], x_q) * scale
    k, v = proj(attn["k"], x_kv), proj(attn["v"], x_kv)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x_q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s_q, d)
    return linear(attn["o"], out)


def _embed(params: Params, cfg: MarianConfig, ids: jnp.ndarray) -> jnp.ndarray:
    x = params["embed"][ids]
    if cfg.scale_embedding:
        x = x * np.sqrt(cfg.d_model).astype(np.float32)
    return x + params["pos"][None, : ids.shape[1]]


def marian_encode(
    params: Params, cfg: MarianConfig, input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """input_ids [B, S] -> encoder states [B, S, d_model] (post-LN)."""
    x = _embed(params, cfg, input_ids)
    eps = cfg.layer_norm_eps
    bias = None
    if attention_mask is not None:
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)

    def block_fn(x, blk):
        x = _ln(blk["ln_attn"],
                x + _attention(blk["attn"], x, x, cfg.num_heads, bias), eps)
        h = _act(cfg, qdot(blk["fc1"], x)
                 + blk["fc1"]["bias"].astype(jnp.float32)).astype(x.dtype)
        h = (qdot(blk["fc2"], h)
             + blk["fc2"]["bias"].astype(jnp.float32)).astype(x.dtype)
        return _ln(blk["ln_ff"], x + h, eps), None

    x, _ = jax.lax.scan(block_fn, x, params["enc_blocks"])
    return x


def marian_decode_logits(
    params: Params,
    cfg: MarianConfig,
    enc_out: jnp.ndarray,
    token_ids: jnp.ndarray,
    enc_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Teacher-forced decoder: token_ids [B, T] -> logits [B, T, vocab]."""
    t = token_ids.shape[1]
    x = _embed(params, cfg, token_ids)
    eps = cfg.layer_norm_eps
    causal = jnp.where(
        jnp.tril(jnp.ones((t, t), jnp.bool_)), 0.0, -jnp.inf
    )[None, None]
    cross_bias = None
    if enc_mask is not None:
        cross_bias = jnp.where(enc_mask[:, None, None, :] > 0, 0.0, -jnp.inf)

    def block_fn(x, blk):
        x = _ln(blk["ln_self"], x + _attention(
            blk["self_attn"], x, x, cfg.num_heads, causal), eps)
        x = _ln(blk["ln_cross"], x + _attention(
            blk["cross_attn"], x, enc_out, cfg.num_heads, cross_bias), eps)
        h = _act(cfg, qdot(blk["fc1"], x)
                 + blk["fc1"]["bias"].astype(jnp.float32)).astype(x.dtype)
        h = (qdot(blk["fc2"], h)
             + blk["fc2"]["bias"].astype(jnp.float32)).astype(x.dtype)
        return _ln(blk["ln_ff"], x + h, eps), None

    x, _ = jax.lax.scan(block_fn, x, params["dec_blocks"])
    return jnp.einsum(
        "btd,vd->btv", x.astype(jnp.float32),
        params["embed"].astype(jnp.float32),
    ) + params["logits_bias"]


def marian_greedy_decode(
    params: Params,
    cfg: MarianConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    max_new_tokens: int = 64,
) -> jnp.ndarray:
    """Greedy translation: source ids [B, S] -> target ids
    [B, 1 + max_new_tokens] starting with decoder_start, eos-padded.

    Emitted pads after eos match HF generate's pad_token_id fill."""
    enc_out = marian_encode(params, cfg, input_ids, attention_mask)
    b = input_ids.shape[0]
    total = 1 + max_new_tokens
    buf = jnp.full((b, total), cfg.pad_token_id, jnp.int32)
    buf = buf.at[:, 0].set(cfg.decoder_start_token_id)

    def step(carry, pos):
        buf, done = carry
        logits = marian_decode_logits(
            params, cfg, enc_out, buf, attention_mask
        )
        # HF MarianMTModel.generate suppresses pad (opus-mt configs ship
        # bad_words_ids=[[pad_token_id]]); without this the argmax can emit
        # pad mid-sequence and diverge from the transformers path
        row = logits[:, pos - 1].at[:, cfg.pad_token_id].set(-jnp.inf)
        nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (buf.at[:, pos].set(nxt), done), None

    (buf, _), _ = jax.lax.scan(
        step, (buf, jnp.zeros((b,), jnp.bool_)), jnp.arange(1, total)
    )
    return buf


class MarianTranslator:
    """text -> text against a local HF-layout opus-mt checkout."""

    def __init__(self, params: Params, cfg: MarianConfig, tokenizer):
        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer

    @staticmethod
    def from_pretrained(path: str, dtype=jnp.bfloat16) -> "MarianTranslator":
        import json
        import os

        from transformers import MarianTokenizer

        from loongx_tpu.utils.convert import (
            convert_marian_state, load_torch_or_safetensors_dir,
        )

        with open(os.path.join(path, "config.json")) as f:
            cfg = MarianConfig.from_hf(json.load(f))
        params = convert_marian_state(
            load_torch_or_safetensors_dir(path), cfg, dtype=dtype
        )
        return MarianTranslator(
            params, cfg, MarianTokenizer.from_pretrained(path)
        )

    def translate(self, text: str, max_new_tokens: int = 64) -> str:
        # pad_to_multiple_of buckets the source length so repeated calls at
        # varying sentence lengths reuse a handful of compiled shapes
        # instead of retracing the encoder + decoder scan per length
        enc = self.tokenizer(
            [text], return_tensors="np", padding=True, pad_to_multiple_of=16
        )
        out = np.asarray(jax.jit(
            marian_greedy_decode, static_argnums=(1, 4)
        )(
            self.params, self.cfg, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]), max_new_tokens,
        ))
        return self.tokenizer.decode(out[0], skip_special_tokens=True).strip()
