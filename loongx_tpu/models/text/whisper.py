"""Whisper ASR in JAX (the speech-instruction path, TPU-native).

The reference demo drives editing from speech via the ``whisper`` package
(/root/reference/inference-demo.py:31-43,92-133: whisper-large zh
transcription, then MarianMT zh->en).  That package is CUDA/torch; this
module is a from-scratch JAX implementation of the Whisper
encoder-decoder — log-mel frontend, conv-downsampled audio encoder,
KV-free greedy decoder — so the speech path runs on the same TPU runtime
as everything else.  Weights convert from HF safetensors
(utils/convert.convert_whisper_state); numerics are golden-tested against
``transformers`` WhisperForConditionalGeneration (tests/test_speech_models.py).

Decoding: two greedy decoders, token-for-token identical
(tests/test_speech_models.py):

  * ``whisper_greedy_decode`` — KV-free: each step re-runs the full
    decoder over a fixed-length token buffer.  Simple, fine at tiny test
    geometry; at whisper-large it recomputes the 32 layers' cross-attention
    K/V projections over all 1500 encoder positions PER TOKEN (~315 GFLOP
    /token — ~8x the entire encoder pass over a 64-token transcription).
  * ``whisper_greedy_decode_cached`` (default serving path) — TPU-native
    incremental decoding with static shapes: cross-attention K/V are
    computed ONCE per utterance, the self-attention K/V cache is a fixed
    [L, B, H, T_max, Dh] buffer written by ``lax.dynamic_update_slice``
    inside one compiled ``lax.scan``, so each step touches one token
    (~0.6 GFLOP + a memory-bound cache read).  Measured at real geometry
    by benchmarks/speech_rehearsal.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_layer_norm, init_linear, layer_norm, linear, qdot,
)


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 1280
    encoder_layers: int = 32
    decoder_layers: int = 32
    num_heads: int = 20
    d_ff: int = 5120
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    eos_token_id: int = 50257
    layer_norm_eps: float = 1e-5
    # frontend (HF WhisperFeatureExtractor defaults)
    sampling_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160

    @staticmethod
    def large() -> "WhisperConfig":
        return WhisperConfig()

    @staticmethod
    def tiny() -> "WhisperConfig":
        return WhisperConfig(
            vocab_size=100, num_mel_bins=8, d_model=32, encoder_layers=2,
            decoder_layers=2, num_heads=4, d_ff=64, max_source_positions=24,
            max_target_positions=16, decoder_start_token_id=1, eos_token_id=2,
        )

    @staticmethod
    def from_hf(cfg: dict) -> "WhisperConfig":
        return WhisperConfig(
            vocab_size=cfg["vocab_size"],
            num_mel_bins=cfg["num_mel_bins"],
            d_model=cfg["d_model"],
            encoder_layers=cfg["encoder_layers"],
            decoder_layers=cfg["decoder_layers"],
            num_heads=cfg["encoder_attention_heads"],
            d_ff=cfg["encoder_ffn_dim"],
            max_source_positions=cfg["max_source_positions"],
            max_target_positions=cfg["max_target_positions"],
            decoder_start_token_id=cfg["decoder_start_token_id"],
            eos_token_id=cfg["eos_token_id"],
        )

    @property
    def n_frames(self) -> int:
        # the stride-2 conv halves frames onto the encoder positions
        # (2*1500 frames = 30 s at hop 160 for the published models)
        return 2 * self.max_source_positions

    @property
    def n_samples(self) -> int:
        return self.n_frames * self.hop_length


# ---------------------------------------------------------------------------
# Log-mel frontend (HF WhisperFeatureExtractor numerics)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    mels = 3.0 * freq / 200.0
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = 27.0 / np.log(6.4)
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) * logstep,
        mels,
    )


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    freq = 200.0 * mels / 3.0
    min_log_hz, min_log_mel = 1000.0, 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


def mel_filter_bank(
    n_freqs: int, n_mels: int, sampling_rate: int, max_frequency: float
) -> np.ndarray:
    """Slaney-scale, slaney-normalised triangular filters [n_freqs, n_mels]
    (what WhisperFeatureExtractor builds for its mel projection)."""
    fft_freqs = np.linspace(0.0, sampling_rate / 2, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.asarray(0.0)),
        _hz_to_mel_slaney(np.asarray(max_frequency)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [F, n_mels+2]
    diffs = hz_pts[1:] - hz_pts[:-1]
    down = -slopes[:, :-2] / diffs[:-1]
    up = slopes[:, 2:] / diffs[1:]
    weights = np.maximum(0.0, np.minimum(down, up))
    weights *= (2.0 / (hz_pts[2:] - hz_pts[:-2]))[None, :]  # slaney norm
    return weights.astype(np.float32)


def log_mel_spectrogram(
    audio: jnp.ndarray, cfg: WhisperConfig, mel_filters: jnp.ndarray
) -> jnp.ndarray:
    """Padded/truncated mono audio [B, n_samples] -> log-mel features
    [B, num_mel_bins, n_frames] matching WhisperFeatureExtractor: centered
    hann STFT (reflect pad), power spectrum, slaney mel, log10, max-8 floor,
    (x+4)/4 scaling."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    x = audio.astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = cfg.n_frames  # HF computes one extra frame then drops it
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    n = jnp.arange(n_fft, dtype=jnp.float32)
    window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / n_fft)  # periodic hann
    frames = x[:, idx] * window
    power = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # [B, F, n_fft//2+1]
    mel = jnp.einsum("bfk,km->bmf", power, mel_filters)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0


def prepare_audio(audio: np.ndarray, cfg: WhisperConfig) -> np.ndarray:
    """Raw mono waveform -> fixed 30 s [1, n_samples] float32."""
    audio = np.asarray(audio, np.float32).reshape(-1)[: cfg.n_samples]
    out = np.zeros((1, cfg.n_samples), np.float32)
    out[0, : audio.shape[0]] = audio
    return out


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def _init_attn(key, d: int, dtype, cross: bool = False) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], d, d, dtype=dtype),
        "k": init_linear(ks[1], d, d, bias=False, dtype=dtype),
        "v": init_linear(ks[2], d, d, dtype=dtype),
        "o": init_linear(ks[3], d, d, dtype=dtype),
    }


def _init_enc_block(key, cfg: WhisperConfig, dtype) -> Params:
    d = cfg.d_model
    ks = jax.random.split(key, 3)
    return {
        "ln_attn": init_layer_norm(d, dtype),
        "attn": _init_attn(ks[0], d, dtype),
        "ln_ff": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[1], d, cfg.d_ff, dtype=dtype),
        "fc2": init_linear(ks[2], cfg.d_ff, d, dtype=dtype),
    }


def _init_dec_block(key, cfg: WhisperConfig, dtype) -> Params:
    d = cfg.d_model
    ks = jax.random.split(key, 4)
    return {
        "ln_self": init_layer_norm(d, dtype),
        "self_attn": _init_attn(ks[0], d, dtype),
        "ln_cross": init_layer_norm(d, dtype),
        "cross_attn": _init_attn(ks[1], d, dtype),
        "ln_ff": init_layer_norm(d, dtype),
        "fc1": init_linear(ks[2], d, cfg.d_ff, dtype=dtype),
        "fc2": init_linear(ks[3], cfg.d_ff, d, dtype=dtype),
    }


def _sinusoid_positions(length: int, d: int) -> np.ndarray:
    """Whisper encoder sinusoids: [sin | cos] split halves."""
    log_timescale = np.log(10000.0) / (d // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(d // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def init_whisper_params(key, cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    enc = [_init_enc_block(k, cfg, dtype)
           for k in jax.random.split(ks[0], cfg.encoder_layers)]
    dec = [_init_dec_block(k, cfg, dtype)
           for k in jax.random.split(ks[1], cfg.decoder_layers)]
    d = cfg.d_model
    stack = lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
    return {
        "conv1": {
            "kernel": (jax.random.normal(ks[2], (3, cfg.num_mel_bins, d)) * 0.02
                       ).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "conv2": {
            "kernel": (jax.random.normal(ks[3], (3, d, d)) * 0.02).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "enc_pos": jnp.asarray(
            _sinusoid_positions(cfg.max_source_positions, d), dtype
        ),
        "enc_blocks": stack(enc),
        "enc_ln": init_layer_norm(d, dtype),
        "embed": (jax.random.normal(ks[4], (cfg.vocab_size, d)) * 0.02
                  ).astype(dtype),
        "dec_pos": (jax.random.normal(ks[5], (cfg.max_target_positions, d))
                    * 0.01).astype(dtype),
        "dec_blocks": stack(dec),
        "dec_ln": init_layer_norm(d, dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _heads(y: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = y.shape
    return y.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _attention(
    attn: Params,
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    num_heads: int,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-scaled-q attention (HF Whisper convention: q *= head_dim^-0.5)."""
    b, s_q, d = x_q.shape
    scale = (d // num_heads) ** -0.5
    q = _heads(linear(attn["q"], x_q), num_heads) * scale
    k = _heads(linear(attn["k"], x_kv), num_heads)
    v = _heads(linear(attn["v"], x_kv), num_heads)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(x_q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s_q, d)
    return linear(attn["o"], out)


def _mlp(blk: Params, h: jnp.ndarray) -> jnp.ndarray:
    y = jax.nn.gelu(
        (qdot(blk["fc1"], h) + blk["fc1"]["bias"].astype(jnp.float32)),
        approximate=False,
    ).astype(h.dtype)
    return linear(blk["fc2"], y)


def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    return layer_norm(x, p["weight"], p["bias"], eps)


def whisper_encode(
    params: Params, cfg: WhisperConfig, features: jnp.ndarray
) -> jnp.ndarray:
    """Log-mel features [B, num_mel_bins, n_frames] -> encoder states
    [B, max_source_positions, d_model]."""
    x = features.transpose(0, 2, 1)  # NHC: [B, T, mel]
    x = x.astype(params["conv1"]["kernel"].dtype)
    # explicit (1, 1) padding: torch Conv1d(padding=1) semantics — "SAME"
    # would split the stride-2 conv's single pad sample differently
    x = jax.lax.conv_general_dilated(
        x, params["conv1"]["kernel"], (1,), ((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["conv1"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2"]["kernel"], (2,), ((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["conv2"]["bias"]
    x = jax.nn.gelu(x, approximate=False).astype(params["enc_pos"].dtype)
    x = x + params["enc_pos"][None, : x.shape[1]]

    eps = cfg.layer_norm_eps

    def block_fn(x, blk):
        h = _ln(blk["ln_attn"], x, eps)
        x = x + _attention(blk["attn"], h, h, cfg.num_heads)
        x = x + _mlp(blk, _ln(blk["ln_ff"], x, eps))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, params["enc_blocks"])
    return _ln(params["enc_ln"], x, eps)


def whisper_decode_logits(
    params: Params,
    cfg: WhisperConfig,
    enc_out: jnp.ndarray,
    token_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Teacher-forced decoder: token_ids [B, T] -> logits [B, T, vocab]."""
    b, t = token_ids.shape
    x = params["embed"][token_ids] + params["dec_pos"][None, :t]
    eps = cfg.layer_norm_eps
    causal = jnp.where(
        jnp.tril(jnp.ones((t, t), jnp.bool_)), 0.0, -jnp.inf
    )[None, None]

    def block_fn(x, blk):
        h = _ln(blk["ln_self"], x, eps)
        x = x + _attention(
            blk["self_attn"], h, h, cfg.num_heads, bias=causal,
        )
        x = x + _attention(
            blk["cross_attn"], _ln(blk["ln_cross"], x, eps),
            enc_out, cfg.num_heads,
        )
        x = x + _mlp(blk, _ln(blk["ln_ff"], x, eps))
        return x, None

    x, _ = jax.lax.scan(block_fn, x, params["dec_blocks"])
    x = _ln(params["dec_ln"], x, eps)
    return jnp.einsum("btd,vd->btv", x.astype(jnp.float32),
                      params["embed"].astype(jnp.float32))


def whisper_greedy_decode(
    params: Params,
    cfg: WhisperConfig,
    features: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    max_new_tokens: int = 64,
    suppress_ids: Optional[jnp.ndarray] = None,
    begin_suppress_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Greedy transcription: features [B, mel, frames] + forced prompt
    [B, P] (<|startoftranscript|>, language, task, <|notimestamps|>) ->
    token buffer [B, P + max_new_tokens], eos-padded.

    ``suppress_ids``: token ids masked to -inf at EVERY generated position
    (HF generation_config.suppress_tokens — special/timestamp tokens);
    ``begin_suppress_ids``: additionally masked at the FIRST generated
    position only (HF begin_suppress_tokens, typically [" ", eos] — stops
    quiet audio from emitting eos immediately)."""
    enc_out = whisper_encode(params, cfg, features)
    b, p = prompt_ids.shape
    total = min(p + max_new_tokens, cfg.max_target_positions)
    buf = jnp.full((b, total), cfg.eos_token_id, jnp.int32)
    buf = buf.at[:, :p].set(prompt_ids.astype(jnp.int32))

    def step(carry, pos):
        buf, done = carry
        logits = whisper_decode_logits(params, cfg, enc_out, buf)
        row = logits[:, pos - 1]
        if suppress_ids is not None:
            row = row.at[:, suppress_ids].set(-jnp.inf)
        if begin_suppress_ids is not None:
            row = jnp.where(
                pos == p,
                row.at[:, begin_suppress_ids].set(-jnp.inf),
                row,
            )
        nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        return (buf.at[:, pos].set(nxt), done), None

    (buf, _), _ = jax.lax.scan(
        step, (buf, jnp.zeros((b,), jnp.bool_)), jnp.arange(p, total)
    )
    return buf


# ---------------------------------------------------------------------------
# KV-cached incremental greedy decoder (the serving path at real geometry)
# ---------------------------------------------------------------------------


def whisper_cross_kv(
    params: Params, cfg: WhisperConfig, enc_out: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention K/V for every decoder layer, computed ONCE per
    utterance: enc_out [B, S_enc, d] -> (k, v) each [L, B, H, S_enc, Dh]."""

    def per_block(blk):
        k = _heads(linear(blk["cross_attn"]["k"], enc_out), cfg.num_heads)
        v = _heads(linear(blk["cross_attn"]["v"], enc_out), cfg.num_heads)
        return k, v

    return jax.vmap(per_block)(params["dec_blocks"])


def _cached_decoder_pass(
    params: Params,
    cfg: WhisperConfig,
    tok_ids: jnp.ndarray,        # [B, T] at positions offset..offset+T-1
    offset: jnp.ndarray,         # scalar (traced)
    self_k: jnp.ndarray,         # [L, B, H, total, Dh]
    self_v: jnp.ndarray,
    cross_k: jnp.ndarray,        # [L, B, H, S_enc, Dh]
    cross_v: jnp.ndarray,
):
    """Run T tokens through the decoder against the caches, writing their
    self-attention K/V at ``offset``.  Returns (logits [B, T, vocab],
    self_k, self_v).  Exact KV-free math: queries at global position q may
    attend cache positions <= q (unwritten positions are > q by
    construction, so the causal mask also hides them)."""
    b, t = tok_ids.shape
    d, nh = cfg.d_model, cfg.num_heads
    eps = cfg.layer_norm_eps
    total = self_k.shape[3]
    pos = jax.lax.dynamic_slice_in_dim(params["dec_pos"], offset, t, 0)
    x = params["embed"][tok_ids] + pos[None]
    qpos = offset + jnp.arange(t)
    bias = jnp.where(
        jnp.arange(total)[None, :] <= qpos[:, None], 0.0, -jnp.inf
    )[None, None]  # [1, 1, T, total]
    scale = (d // nh) ** -0.5

    def block_fn(x, xs):
        blk, k_cache, v_cache, ck, cv = xs
        h = _ln(blk["ln_self"], x, eps)
        q = _heads(linear(blk["self_attn"]["q"], h), nh) * scale
        k_new = _heads(linear(blk["self_attn"]["k"], h), nh)
        v_new = _heads(linear(blk["self_attn"]["v"], h), nh)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, 0, offset, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, 0, offset, 0)
        )
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_cache, preferred_element_type=jnp.float32
        ) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v_cache,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + linear(blk["self_attn"]["o"], out)

        hq = _ln(blk["ln_cross"], x, eps)
        q2 = _heads(linear(blk["cross_attn"]["q"], hq), nh) * scale
        cl = jnp.einsum(
            "bhqd,bhkd->bhqk", q2, ck, preferred_element_type=jnp.float32
        )
        cp = jax.nn.softmax(cl, axis=-1).astype(cv.dtype)
        co = jnp.einsum(
            "bhqk,bhkd->bhqd", cp, cv, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        co = co.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + linear(blk["cross_attn"]["o"], co)

        x = x + _mlp(blk, _ln(blk["ln_ff"], x, eps))
        return x, (k_cache, v_cache)

    x, (self_k, self_v) = jax.lax.scan(
        block_fn, x, (params["dec_blocks"], self_k, self_v, cross_k, cross_v)
    )
    x = _ln(params["dec_ln"], x, eps)
    logits = jnp.einsum(
        "btd,vd->btv", x.astype(jnp.float32),
        params["embed"].astype(jnp.float32),
    )
    return logits, self_k, self_v


def whisper_greedy_decode_cached(
    params: Params,
    cfg: WhisperConfig,
    features: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    max_new_tokens: int = 64,
    suppress_ids: Optional[jnp.ndarray] = None,
    begin_suppress_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """`whisper_greedy_decode` semantics (token-for-token identical output)
    with O(1) work per generated token: cross K/V precomputed per
    utterance, self K/V carried in a static-shape cache through one
    compiled scan."""
    enc_out = whisper_encode(params, cfg, features)
    cross_k, cross_v = whisper_cross_kv(params, cfg, enc_out)
    b, p = prompt_ids.shape
    total = min(p + max_new_tokens, cfg.max_target_positions)
    nh, dh = cfg.num_heads, cfg.d_model // cfg.num_heads
    dt = params["embed"].dtype
    self_k = jnp.zeros((cfg.decoder_layers, b, nh, total, dh), dt)
    self_v = jnp.zeros_like(self_k)
    buf = jnp.full((b, total), cfg.eos_token_id, jnp.int32)
    buf = buf.at[:, :p].set(prompt_ids.astype(jnp.int32))

    # prefill the prompt; its last row predicts position p
    logits, self_k, self_v = _cached_decoder_pass(
        params, cfg, buf[:, :p], jnp.int32(0), self_k, self_v,
        cross_k, cross_v,
    )
    row0 = logits[:, -1]

    def step(carry, pos):
        buf, done, self_k, self_v, row = carry
        if suppress_ids is not None:
            row = row.at[:, suppress_ids].set(-jnp.inf)
        if begin_suppress_ids is not None:
            row = jnp.where(
                pos == p, row.at[:, begin_suppress_ids].set(-jnp.inf), row
            )
        nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        done = done | (nxt == cfg.eos_token_id)
        buf = buf.at[:, pos].set(nxt)
        logits, self_k, self_v = _cached_decoder_pass(
            params, cfg, nxt[:, None], pos, self_k, self_v, cross_k, cross_v,
        )
        return (buf, done, self_k, self_v, logits[:, 0]), None

    (buf, _, _, _, _), _ = jax.lax.scan(
        step,
        (buf, jnp.zeros((b,), jnp.bool_), self_k, self_v, row0),
        jnp.arange(p, total),
    )
    return buf


# ---------------------------------------------------------------------------
# Checkpoint-backed ASR wrapper (local dirs only; zero-egress safe)
# ---------------------------------------------------------------------------


class WhisperASR:
    """Audio file -> text against a local HF-layout Whisper checkout
    (config.json + *.safetensors + tokenizer files)."""

    def __init__(self, params: Params, cfg: WhisperConfig, tokenizer,
                 suppress_tokens=None, begin_suppress_tokens=None):
        self.params, self.cfg, self.tokenizer = params, cfg, tokenizer
        self.suppress_tokens = suppress_tokens
        self.begin_suppress_tokens = begin_suppress_tokens
        self.mel_filters = jnp.asarray(mel_filter_bank(
            cfg.n_fft // 2 + 1, cfg.num_mel_bins, cfg.sampling_rate,
            cfg.sampling_rate / 2.0,
        ))

    @staticmethod
    def from_pretrained(path: str, dtype=jnp.bfloat16) -> "WhisperASR":
        import json
        import os

        from transformers import WhisperTokenizer

        from loongx_tpu.utils.convert import (
            convert_whisper_state, load_torch_or_safetensors_dir,
        )

        with open(os.path.join(path, "config.json")) as f:
            raw_cfg = json.load(f)
        cfg = WhisperConfig.from_hf(raw_cfg)
        params = convert_whisper_state(
            load_torch_or_safetensors_dir(path), cfg, dtype=dtype
        )
        # HF generate suppresses special/timestamp tokens; read the lists
        # from generation_config.json (newer checkouts) or config.json
        gen_cfg = {}
        gen_path = os.path.join(path, "generation_config.json")
        if os.path.exists(gen_path):
            with open(gen_path) as f:
                gen_cfg = json.load(f)
        suppress = gen_cfg.get("suppress_tokens", raw_cfg.get("suppress_tokens"))
        begin = gen_cfg.get(
            "begin_suppress_tokens", raw_cfg.get("begin_suppress_tokens")
        )
        return WhisperASR(
            params, cfg, WhisperTokenizer.from_pretrained(path),
            suppress_tokens=suppress, begin_suppress_tokens=begin,
        )

    def _prompt_ids(self, language: str, task: str) -> np.ndarray:
        tok = self.tokenizer.convert_tokens_to_ids
        ids = [self.cfg.decoder_start_token_id,
               tok(f"<|{language}|>"), tok(f"<|{task}|>"),
               tok("<|notimestamps|>")]
        return np.asarray([ids], np.int32)

    def transcribe(
        self, audio: np.ndarray, language: str = "zh",
        task: str = "transcribe", max_new_tokens: int = 64,
        use_cache: bool = True,
    ) -> str:
        feats = log_mel_spectrogram(
            jnp.asarray(prepare_audio(audio, self.cfg)), self.cfg,
            self.mel_filters,
        )
        prompt = jnp.asarray(self._prompt_ids(language, task))
        sup = (jnp.asarray(self.suppress_tokens, jnp.int32)
               if self.suppress_tokens else None)
        begin = (jnp.asarray(self.begin_suppress_tokens, jnp.int32)
                 if self.begin_suppress_tokens else None)
        decode_fn = (
            whisper_greedy_decode_cached if use_cache
            else whisper_greedy_decode
        )
        out = np.asarray(jax.jit(
            decode_fn, static_argnums=(1, 4)
        )(self.params, self.cfg, feats, prompt, max_new_tokens, sup, begin))
        return self.tokenizer.decode(
            out[0, prompt.shape[1]:], skip_special_tokens=True
        ).strip()
