"""Real-geometry speech-path rehearsal (VERDICT r3 Missing #5 / Weak #7).

Until round 4 the JAX Whisper/Marian models had only ever executed at tiny
test geometry.  This script synthesizes REAL-geometry checkpoints in host
memory — whisper-large-v2 shapes (1.5B params: 32+32 layers, d=1280,
vocab 51865) and Helsinki-NLP opus-mt-zh-en Marian shapes (77M params) —
drives the full deployed speech path on chip:

    5 s waveform -> log-mel -> Whisper encode -> greedy transcribe
    -> Marian zh->en greedy translate

and reports per-stage latency + device memory, for BOTH whisper decoders:
the KV-free fixed-buffer decoder and the round-4 KV-cached incremental
decoder (whisper_greedy_decode_cached).  The comparison is the measurement
Weak #7 asked for: at this geometry the KV-free decoder recomputes the
32 layers' cross-attention K/V over 1500 encoder positions per token.

Run on the TPU host:  python -m benchmarks.speech_rehearsal
Knobs: SPEECH_TOKENS (default 32 new tokens), SPEECH_ITERS (default 3),
SPEECH_KVFREE=0 skips the slow KV-free leg.

Random weights produce garbage token ids — irrelevant for latency/memory;
numerics are golden-tested at tiny geometry (tests/test_speech_models.py,
cached == KV-free == torch).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def _rand_state_whisper(cfg, rng):
    """whisper-large-shaped flat state dict with the HF key layout
    utils/convert.convert_whisper_state consumes (bare, un-prefixed)."""
    d, ff, mel = cfg.d_model, cfg.d_ff, cfg.num_mel_bins
    st = {}

    def lin(p, o, i, bias=True):
        st[f"{p}.weight"] = rng.standard_normal((o, i), np.float32) * 0.02
        if bias:
            st[f"{p}.bias"] = np.zeros((o,), np.float32)

    def ln(p):
        st[f"{p}.weight"] = np.ones((d,), np.float32)
        st[f"{p}.bias"] = np.zeros((d,), np.float32)

    st["encoder.conv1.weight"] = rng.standard_normal((d, mel, 3), np.float32) * 0.02
    st["encoder.conv1.bias"] = np.zeros((d,), np.float32)
    st["encoder.conv2.weight"] = rng.standard_normal((d, d, 3), np.float32) * 0.02
    st["encoder.conv2.bias"] = np.zeros((d,), np.float32)
    st["encoder.embed_positions.weight"] = rng.standard_normal(
        (cfg.max_source_positions, d), np.float32
    ) * 0.02
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        ln(f"{p}.self_attn_layer_norm"); ln(f"{p}.final_layer_norm")
        lin(f"{p}.self_attn.q_proj", d, d)
        lin(f"{p}.self_attn.k_proj", d, d, bias=False)
        lin(f"{p}.self_attn.v_proj", d, d)
        lin(f"{p}.self_attn.out_proj", d, d)
        lin(f"{p}.fc1", ff, d); lin(f"{p}.fc2", d, ff)
    ln("encoder.layer_norm")
    st["decoder.embed_tokens.weight"] = rng.standard_normal(
        (cfg.vocab_size, d), np.float32
    ) * 0.02
    st["decoder.embed_positions.weight"] = rng.standard_normal(
        (cfg.max_target_positions, d), np.float32
    ) * 0.02
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        ln(f"{p}.self_attn_layer_norm"); ln(f"{p}.encoder_attn_layer_norm")
        ln(f"{p}.final_layer_norm")
        for a in ("self_attn", "encoder_attn"):
            lin(f"{p}.{a}.q_proj", d, d)
            lin(f"{p}.{a}.k_proj", d, d, bias=False)
            lin(f"{p}.{a}.v_proj", d, d)
            lin(f"{p}.{a}.out_proj", d, d)
        lin(f"{p}.fc1", ff, d); lin(f"{p}.fc2", d, ff)
    ln("decoder.layer_norm")
    return st


def _rand_state_marian(cfg, rng):
    d, ff = cfg.d_model, cfg.d_ff
    st = {}

    def lin(p, o, i):
        st[f"{p}.weight"] = rng.standard_normal((o, i), np.float32) * 0.02
        st[f"{p}.bias"] = np.zeros((o,), np.float32)

    def ln(p):
        st[f"{p}.weight"] = np.ones((d,), np.float32)
        st[f"{p}.bias"] = np.zeros((d,), np.float32)

    st["shared.weight"] = rng.standard_normal((cfg.vocab_size, d), np.float32) * 0.02
    from loongx_tpu.models.text.marian import sinusoid_positions_marian

    st["encoder.embed_positions.weight"] = sinusoid_positions_marian(
        cfg.max_positions, d
    )
    for kind, n in (("encoder", cfg.encoder_layers),
                    ("decoder", cfg.decoder_layers)):
        for i in range(n):
            p = f"{kind}.layers.{i}"
            ln(f"{p}.self_attn_layer_norm"); ln(f"{p}.final_layer_norm")
            for a in ("self_attn",) + (
                ("encoder_attn",) if kind == "decoder" else ()
            ):
                if kind == "decoder" and a == "encoder_attn":
                    ln(f"{p}.encoder_attn_layer_norm")
                lin(f"{p}.{a}.q_proj", d, d)
                lin(f"{p}.{a}.k_proj", d, d)
                lin(f"{p}.{a}.v_proj", d, d)
                lin(f"{p}.{a}.out_proj", d, d)
            lin(f"{p}.fc1", ff, d); lin(f"{p}.fc2", d, ff)
    st["final_logits_bias"] = np.zeros((cfg.vocab_size,), np.float32)
    return st


def _force(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def _measure(fn, *args, iters=3):
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times) // 2]


def _mem_gb():
    try:
        s = jax.devices()[0].memory_stats()
        return round(s.get("bytes_in_use", 0) / 2**30, 2)
    except Exception:
        return None


def main():
    from loongx_tpu.models.text.marian import (
        MarianConfig, marian_greedy_decode,
    )
    from loongx_tpu.models.text.whisper import (
        WhisperConfig, log_mel_spectrogram, mel_filter_bank, prepare_audio,
        whisper_encode, whisper_greedy_decode, whisper_greedy_decode_cached,
    )
    from loongx_tpu.utils.convert import (
        convert_marian_state, convert_whisper_state,
    )

    n_new = int(os.environ.get("SPEECH_TOKENS", "32"))
    iters = int(os.environ.get("SPEECH_ITERS", "3"))
    report = {"geometry": "whisper-large-v2 (32+32, d1280) + opus-mt-zh-en "
              "(6+6, d512)", "new_tokens": n_new}
    rng = np.random.default_rng(0)
    t0 = time.time()

    wcfg = WhisperConfig.large()
    wparams = convert_whisper_state(
        _rand_state_whisper(wcfg, rng), wcfg, dtype=jnp.bfloat16
    )
    n_w = sum(int(x.size) for x in jax.tree.leaves(wparams))
    mcfg = MarianConfig.opus_mt()
    mparams = convert_marian_state(
        _rand_state_marian(mcfg, rng), mcfg, dtype=jnp.bfloat16
    )
    n_m = sum(int(x.size) for x in jax.tree.leaves(mparams))
    report["whisper_params_b"] = round(n_w / 1e9, 3)
    report["marian_params_m"] = round(n_m / 1e6, 1)
    report["synth_convert_s"] = round(time.time() - t0, 1)
    report["mem_after_load_gb"] = _mem_gb()
    print(f"[speech] loaded {report['whisper_params_b']}B whisper + "
          f"{report['marian_params_m']}M marian in "
          f"{report['synth_convert_s']}s", flush=True)

    # 5 s utterance -> fixed 30 s mel window (the Whisper contract)
    wave = (0.1 * np.sin(2 * np.pi * 220.0 * np.arange(5 * 16000) / 16000)
            + 0.01 * rng.standard_normal(5 * 16000)).astype(np.float32)
    mel_filters = jnp.asarray(mel_filter_bank(
        wcfg.n_fft // 2 + 1, wcfg.num_mel_bins, wcfg.sampling_rate,
        wcfg.sampling_rate / 2.0,
    ))
    audio = jnp.asarray(prepare_audio(wave, wcfg))
    feats = log_mel_spectrogram(audio, wcfg, mel_filters)
    prompt = jnp.asarray([[wcfg.decoder_start_token_id, 50260, 50359,
                           50363]], jnp.int32)  # <|sot|><|zh|><|transcribe|><|notimestamps|>

    # params are ARGUMENTS, never closures: on the remote-compile platform
    # closed-over arrays are serialized into the compile payload
    # (PERF_NOTES methodology guardrails — 3 GB of whisper weights would
    # stall the tunnel for tens of minutes)
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(a, wcfg, mel_filters))
    best, p50 = _measure(mel_fn, audio, iters=iters)
    report["log_mel_ms"] = round(p50 * 1e3, 1)

    enc_fn = jax.jit(lambda w, f: whisper_encode(w, wcfg, f))
    best, p50 = _measure(enc_fn, wparams, feats, iters=iters)
    report["whisper_encode_ms"] = round(p50 * 1e3, 1)
    print(f"[speech] encode {report['whisper_encode_ms']} ms", flush=True)

    cached_fn = jax.jit(
        lambda w, f, p: whisper_greedy_decode_cached(
            w, wcfg, f, p, max_new_tokens=n_new
        )
    )
    best, p50 = _measure(cached_fn, wparams, feats, prompt, iters=iters)
    print(f"[speech] cached transcribe {p50:.3f} s", flush=True)
    report["transcribe_cached_s"] = round(p50, 3)
    report["cached_ms_per_token"] = round(
        (p50 - report["whisper_encode_ms"] / 1e3) / n_new * 1e3, 2
    )
    report["mem_peak_gb"] = _mem_gb()

    if os.environ.get("SPEECH_KVFREE", "1") == "1":
        kvfree_fn = jax.jit(
            lambda w, f, p: whisper_greedy_decode(
                w, wcfg, f, p, max_new_tokens=n_new
            )
        )
        best, p50 = _measure(kvfree_fn, wparams, feats, prompt, iters=iters)
        report["transcribe_kvfree_s"] = round(p50, 3)
        report["kvfree_over_cached_x"] = round(
            report["transcribe_kvfree_s"] / report["transcribe_cached_s"], 1
        )

    # Marian translate: ~24 source tokens -> greedy
    src = jnp.asarray(rng.integers(2, 60000, (1, 24)), jnp.int32)
    mar_fn = jax.jit(
        lambda w, s: marian_greedy_decode(w, mcfg, s, max_new_tokens=n_new)
    )
    best, p50 = _measure(mar_fn, mparams, src, iters=iters)
    report["marian_translate_s"] = round(p50, 3)

    report["utterance_e2e_s"] = round(
        report["log_mel_ms"] / 1e3 + report["transcribe_cached_s"]
        + report["marian_translate_s"], 3
    )
    report["device"] = str(jax.devices()[0])
    report["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
