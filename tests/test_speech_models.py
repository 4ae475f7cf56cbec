"""Golden tests for the JAX Whisper + Marian speech-instruction models.

Same methodology as tests/test_golden_torch.py: tiny random HF torch
models produce state dicts, utils/convert maps them onto our pytrees, and
the JAX forwards must match torch in fp32 to tight tolerance.  The greedy
decoders must reproduce torch's manual greedy loop token for token —
these are the models behind the reference's speech demo
(/root/reference/inference-demo.py:92-133).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

ATOL = 2e-4


def _sd(model):
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in model.state_dict().items()}


def _close(ours, theirs, atol=ATOL, label=""):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs.detach().cpu().numpy(), np.float32)
    assert ours.shape == theirs.shape, (label, ours.shape, theirs.shape)
    err = np.max(np.abs(ours - theirs))
    assert err < atol, f"{label}: max abs err {err:.2e} >= {atol}"


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


def _whisper_pair(seed=0):
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from loongx_tpu.models.text.whisper import WhisperConfig
    from loongx_tpu.utils.convert import convert_whisper_state

    cfg = WhisperConfig.tiny()
    hf_cfg = HFWhisperConfig(
        vocab_size=cfg.vocab_size, num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model, encoder_layers=cfg.encoder_layers,
        decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.d_ff, decoder_ffn_dim=cfg.d_ff,
        max_source_positions=cfg.max_source_positions,
        max_target_positions=cfg.max_target_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        pad_token_id=0, eos_token_id=cfg.eos_token_id,
    )
    torch.manual_seed(seed)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    params = convert_whisper_state(_sd(model), cfg, dtype=jnp.float32)
    return model, params, cfg


def test_log_mel_golden():
    from transformers import WhisperFeatureExtractor

    from loongx_tpu.models.text.whisper import (
        WhisperConfig, log_mel_spectrogram, mel_filter_bank, prepare_audio,
    )

    cfg = WhisperConfig.large()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(3 * cfg.sampling_rate) * 0.1).astype(
        np.float32
    )
    fe = WhisperFeatureExtractor(feature_size=cfg.num_mel_bins)
    want = fe(audio, sampling_rate=cfg.sampling_rate,
              return_tensors="np")["input_features"][0]

    filters = jnp.asarray(mel_filter_bank(
        cfg.n_fft // 2 + 1, cfg.num_mel_bins, cfg.sampling_rate, 8000.0
    ))
    got = np.asarray(log_mel_spectrogram(
        jnp.asarray(prepare_audio(audio, cfg)), cfg, filters
    ))[0]
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 1e-4


def test_whisper_encoder_golden():
    from loongx_tpu.models.text.whisper import whisper_encode

    model, params, cfg = _whisper_pair()
    rng = np.random.default_rng(1)
    feats = rng.standard_normal(
        (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    with torch.no_grad():
        want = model.model.encoder(torch.from_numpy(feats)).last_hidden_state
    got = whisper_encode(params, cfg, jnp.asarray(feats))
    _close(got, want, label="whisper encoder")


def test_whisper_decoder_logits_golden():
    from loongx_tpu.models.text.whisper import (
        whisper_decode_logits, whisper_encode,
    )

    model, params, cfg = _whisper_pair()
    rng = np.random.default_rng(2)
    feats = rng.standard_normal(
        (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 7))
    with torch.no_grad():
        want = model(
            input_features=torch.from_numpy(feats),
            decoder_input_ids=torch.from_numpy(ids),
        ).logits
    enc = whisper_encode(params, cfg, jnp.asarray(feats))
    got = whisper_decode_logits(params, cfg, enc, jnp.asarray(ids))
    _close(got, want, atol=1e-3, label="whisper logits")


def test_whisper_greedy_matches_torch():
    from loongx_tpu.models.text.whisper import whisper_greedy_decode

    model, params, cfg = _whisper_pair()
    rng = np.random.default_rng(3)
    feats = rng.standard_normal(
        (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32)
    prompt = np.asarray([[cfg.decoder_start_token_id]], np.int64)

    n_new = 6
    ids = torch.from_numpy(prompt)
    with torch.no_grad():
        for _ in range(n_new):
            logits = model(
                input_features=torch.from_numpy(feats), decoder_input_ids=ids
            ).logits
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
            if int(nxt[0, 0]) == cfg.eos_token_id:
                break
    want = ids.numpy()[0].tolist()

    got = np.asarray(whisper_greedy_decode(
        params, cfg, jnp.asarray(feats), jnp.asarray(prompt),
        max_new_tokens=n_new,
    ))[0].tolist()
    # ours eos-pads the fixed buffer past the stop point
    assert got[: len(want)] == want


def test_whisper_cached_greedy_matches_kv_free():
    """The KV-cached incremental decoder (the real-geometry serving path,
    round-4 Weak #7 fix) must reproduce the KV-free decoder — which is
    itself golden against torch above — token for token, including with
    suppress lists and a multi-token prompt."""
    from loongx_tpu.models.text.whisper import (
        whisper_greedy_decode, whisper_greedy_decode_cached,
    )

    model, params, cfg = _whisper_pair()
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal(
        (2, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32))
    prompt = jnp.asarray([[cfg.decoder_start_token_id, 5, 9]] * 2, jnp.int32)
    sup = jnp.asarray([3, 4], jnp.int32)
    begin = jnp.asarray([cfg.eos_token_id], jnp.int32)

    for kw in (
        dict(max_new_tokens=8),
        dict(max_new_tokens=8, suppress_ids=sup, begin_suppress_ids=begin),
    ):
        want = np.asarray(
            whisper_greedy_decode(params, cfg, feats, prompt, **kw)
        )
        got = np.asarray(
            whisper_greedy_decode_cached(params, cfg, feats, prompt, **kw)
        )
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Marian
# ---------------------------------------------------------------------------


def _marian_pair(seed=0):
    from transformers import MarianConfig as HFMarianConfig
    from transformers import MarianMTModel

    from loongx_tpu.models.text.marian import MarianConfig
    from loongx_tpu.utils.convert import convert_marian_state

    cfg = MarianConfig.tiny()
    hf_cfg = HFMarianConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.num_heads,
        decoder_attention_heads=cfg.num_heads,
        encoder_ffn_dim=cfg.d_ff, decoder_ffn_dim=cfg.d_ff,
        max_position_embeddings=cfg.max_positions,
        decoder_start_token_id=cfg.decoder_start_token_id,
        pad_token_id=cfg.pad_token_id, eos_token_id=cfg.eos_token_id,
        activation_function=(
            "silu" if cfg.activation == "swish" else cfg.activation
        ),
        scale_embedding=cfg.scale_embedding,
    )
    torch.manual_seed(seed)
    model = MarianMTModel(hf_cfg).eval()
    params = convert_marian_state(_sd(model), cfg, dtype=jnp.float32)
    return model, params, cfg


def test_marian_logits_golden():
    from loongx_tpu.models.text.marian import (
        marian_decode_logits, marian_encode,
    )

    model, params, cfg = _marian_pair()
    rng = np.random.default_rng(4)
    src = rng.integers(0, cfg.vocab_size - 1, size=(2, 9))
    tgt = rng.integers(0, cfg.vocab_size - 1, size=(2, 5))
    mask = np.ones_like(src)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(src),
            attention_mask=torch.from_numpy(mask),
            decoder_input_ids=torch.from_numpy(tgt),
        ).logits
    enc = marian_encode(params, cfg, jnp.asarray(src), jnp.asarray(mask))
    got = marian_decode_logits(
        params, cfg, enc, jnp.asarray(tgt), jnp.asarray(mask)
    )
    _close(got, want, atol=1e-3, label="marian logits")


def test_marian_greedy_matches_torch():
    from loongx_tpu.models.text.marian import marian_greedy_decode

    model, params, cfg = _marian_pair()
    rng = np.random.default_rng(5)
    src = rng.integers(0, cfg.vocab_size - 1, size=(1, 8))
    mask = np.ones_like(src)

    n_new = 6
    ids = torch.tensor([[cfg.decoder_start_token_id]])
    with torch.no_grad():
        for _ in range(n_new):
            logits = model(
                input_ids=torch.from_numpy(src),
                attention_mask=torch.from_numpy(mask),
                decoder_input_ids=ids,
            ).logits
            nxt = logits[:, -1].argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
            if int(nxt[0, 0]) == cfg.eos_token_id:
                break
    want = ids.numpy()[0].tolist()

    got = np.asarray(marian_greedy_decode(
        params, cfg, jnp.asarray(src), jnp.asarray(mask), n_new
    ))[0].tolist()
    assert got[: len(want)] == want


def test_whisper_transcribe_wrapper_headless():
    """WhisperASR.transcribe end to end with an injected tiny tokenizer —
    proves the ASR wrapper path (mel -> encode -> greedy -> decode) runs
    without Whisper weights or tokenizer files on disk."""
    from loongx_tpu.models.text.whisper import WhisperASR

    _, params, cfg = _whisper_pair()

    class FakeTok:
        def convert_tokens_to_ids(self, tok):
            return {"<|zh|>": 3, "<|transcribe|>": 4,
                    "<|notimestamps|>": 5}.get(tok, 6)

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids if i != cfg.eos_token_id)

    asr = WhisperASR(params, cfg, FakeTok())
    rng = np.random.default_rng(6)
    text = asr.transcribe(
        rng.standard_normal(8000).astype(np.float32), max_new_tokens=4
    )
    assert isinstance(text, str)


def _write_whisper_dir(tmp_path):
    """Tiny HF-layout Whisper checkout: save_pretrained + synthetic
    GPT2-style tokenizer files (no downloads)."""
    import json

    model, params, cfg = _whisper_pair()
    d = str(tmp_path / "whisper")
    model.save_pretrained(d, safe_serialization=True)
    vocab = {chr(97 + i): i for i in range(26)}
    specials = ["<|endoftext|>", "<|startoftranscript|>", "<|zh|>", "<|en|>",
                "<|transcribe|>", "<|translate|>", "<|notimestamps|>"]
    for i, s in enumerate(specials):
        vocab[s] = 26 + i
    with open(f"{d}/vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(f"{d}/merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    with open(f"{d}/tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "WhisperTokenizer"}, f)
    return d, model, cfg


def test_whisper_asr_from_pretrained_local_dir(tmp_path):
    """The REAL deployed ASR path: local HF-layout dir -> from_pretrained
    (config.json + safetensors + tokenizer) -> transcribe returns text."""
    from loongx_tpu.models.text.whisper import WhisperASR

    d, _, cfg = _write_whisper_dir(tmp_path)
    asr = WhisperASR.from_pretrained(d, dtype=jnp.float32)
    assert asr.cfg.d_model == cfg.d_model
    rng = np.random.default_rng(7)
    text = asr.transcribe(
        rng.standard_normal(cfg.n_samples // 2).astype(np.float32),
        max_new_tokens=4,
    )
    assert isinstance(text, str)


def test_speech_demo_native_transcribe(tmp_path):
    """cli/speech_demo.transcribe picks the in-framework JAX backend for a
    local checkout and runs it on a real wav file."""
    import wave

    from loongx_tpu.cli import speech_demo

    d, _, cfg = _write_whisper_dir(tmp_path)
    wav = str(tmp_path / "clip.wav")
    rng = np.random.default_rng(8)
    pcm = (rng.standard_normal(8000) * 3000).astype(np.int16)
    with wave.open(wav, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    text = speech_demo.transcribe(wav, whisper_path=d, translate_path=None)
    assert isinstance(text, str)


def test_marian_translator_wrapper():
    """MarianTranslator.translate end to end with an injected tokenizer
    (sentencepiece vocab files are the only missing dependency here)."""
    from loongx_tpu.models.text.marian import MarianTranslator

    _, params, cfg = _marian_pair()

    class FakeTok:
        def __call__(self, texts, return_tensors="np", padding=True,
                     pad_to_multiple_of=None):
            ids = [ord(c) % 90 for c in texts[0][:6]] + [cfg.eos_token_id]
            mask = [1] * len(ids)
            if pad_to_multiple_of:
                while len(ids) % pad_to_multiple_of:
                    ids.append(cfg.pad_token_id)
                    mask.append(0)
            return {
                "input_ids": np.asarray([ids]),
                "attention_mask": np.asarray([mask]),
            }

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(
                f"w{i}" for i in ids
                if i not in (cfg.pad_token_id, cfg.eos_token_id,
                             cfg.decoder_start_token_id)
            )

    tr = MarianTranslator(params, cfg, FakeTok())
    out = tr.translate("hello there", max_new_tokens=5)
    assert isinstance(out, str)


def test_whisper_suppress_tokens():
    """suppress_ids never appear in generated positions; begin_suppress_ids
    are blocked at the FIRST generated position only (HF generate
    semantics: begin_suppress_tokens stops instant-eos on quiet audio)."""
    from loongx_tpu.models.text.whisper import whisper_greedy_decode

    _, params, cfg = _whisper_pair()
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal(
        (1, cfg.num_mel_bins, 2 * cfg.max_source_positions)
    ).astype(np.float32))
    prompt = jnp.asarray([[cfg.decoder_start_token_id]], jnp.int32)

    base = np.asarray(whisper_greedy_decode(
        params, cfg, feats, prompt, max_new_tokens=6
    ))[0]
    t0 = int(base[1])
    assert t0 != cfg.eos_token_id  # random tiny model emits real tokens

    # global suppression: t0 must vanish from every generated position
    sup = np.asarray(whisper_greedy_decode(
        params, cfg, feats, prompt, max_new_tokens=6,
        suppress_ids=jnp.asarray([t0], jnp.int32),
    ))[0]
    assert t0 not in sup[1:].tolist()

    # begin suppression: first generated token changes, but t0 may
    # reappear later (mask applies to position p only)
    begin = np.asarray(whisper_greedy_decode(
        params, cfg, feats, prompt, max_new_tokens=6,
        begin_suppress_ids=jnp.asarray([t0], jnp.int32),
    ))[0]
    assert int(begin[1]) != t0


def test_marian_pad_never_emitted():
    """The pad token is masked at every step (HF opus-mt ships
    bad_words_ids=[[pad]]): re-labelling the baseline's first generated
    token as pad must remove it from the decode."""
    import dataclasses

    from loongx_tpu.models.text.marian import marian_greedy_decode

    _, params, cfg = _marian_pair()
    rng = np.random.default_rng(8)
    src = jnp.asarray(rng.integers(0, cfg.vocab_size - 1, size=(1, 8)))
    mask = jnp.ones_like(src)

    base = np.asarray(marian_greedy_decode(params, cfg, src, mask, 6))[0]
    t0 = int(base[1])
    assert t0 != cfg.eos_token_id
    cfg2 = dataclasses.replace(cfg, pad_token_id=t0)
    out = np.asarray(marian_greedy_decode(params, cfg2, src, mask, 6))[0]
    gen = out[1:].tolist()
    # t0 may only appear as post-eos padding fill, never as a real token
    if cfg2.eos_token_id in gen:
        gen = gen[: gen.index(cfg2.eos_token_id)]
    assert t0 not in gen
