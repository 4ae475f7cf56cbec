"""Speech -> edit END-TO-END rehearsal (VERDICT r4 next-round #8).

Round 4 measured the speech stack (whisper-large + opus-mt Marian) and the
editing stack (int8 12B FLUX serving) separately.  This harness chains
them the way the reference's demo does (inference-demo.py:92-133 audio ->
instruction, :191-244 instruction -> conditioned edit) as ONE command:

    wav on disk
      -> log-mel -> JAX Whisper-large greedy transcribe (KV-cached)
      -> JAX Marian zh->en greedy translate        [speech stage]
      -> free speech weights
      -> T5-XXL + CLIP-L encode of the instruction  [text stage, staged:
         encoders resident alone, then freed — the single-chip 12B recipe]
      -> int8 12B DiT + VAE: 28-step 512^2 conditioned edit -> PNG
         (text-driven leg, plus the deployed replace-mode neural leg
         driving the CS3 encoders + DGF with reference-geometry biosignals)

Stage models are synthesized at REAL geometry (whisper-large-v2 1.5B,
opus-mt-zh-en 77M, FLUX.1-dev 12B int8 via the shared train-rehearsal
checkpoint) — random weights produce garbage tokens/pixels, which is
irrelevant for latency/memory; numerics are golden-tested at tiny geometry
elsewhere (tests/test_speech_models.py, test_golden_torch.py).

Reports per-stage p50 latency and the complete utterance->image wall
clock, two ways: ``utterance_to_image_warm_s`` (every stage resident and
compiled — the pipelined-serving chain latency) and ``cold_total_s``
(one-shot single-chip run including the staged checkpoint loads).

Run on the TPU host:  python -m benchmarks.speech_edit_rehearsal
Tiny CPU check (CI-able, tests/test_speech_edit_rehearsal.py):
  REHEARSAL_TINY=1 python -m benchmarks.speech_edit_rehearsal
"""

import gc
import json
import os
import time
import wave as wave_mod

import numpy as np

TINY = os.environ.get("REHEARSAL_TINY") == "1"

_WORDS = ["make", "the", "sky", "bluer", "turn", "cat", "into", "a", "dog",
          "remove", "person", "add", "hat", "brighten", "image", "change",
          "car", "to", "red"]


def _stable_hash(word: str, mod: int) -> int:
    h = 0
    for ch in word:
        h = (h * 31 + ord(ch)) % mod
    return h


class _WhisperTokShim:
    """Minimal stand-in for WhisperTokenizer: maps the three prompt
    specials to ids and decodes ids onto a small word list.  Real-tokenizer
    decoding is exercised by cli/speech_demo's from_pretrained path; here
    only the id plumbing matters (random weights -> garbage ids anyway)."""

    def __init__(self, cfg):
        if cfg.vocab_size > 51000:  # whisper-large vocab: real special ids
            self._special = {"<|zh|>": 50260, "<|transcribe|>": 50359,
                             "<|notimestamps|>": 50363}
            self._skip_from = 50257
        else:  # tiny geometry: keep ids inside the vocab
            self._special = {"<|zh|>": 3, "<|transcribe|>": 4,
                             "<|notimestamps|>": 5}
            self._skip_from = min(cfg.vocab_size - 6, cfg.eos_token_id)

    def convert_tokens_to_ids(self, token):
        return self._special[token]

    def decode(self, ids, skip_special_tokens=True):
        keep = [int(i) for i in np.asarray(ids).reshape(-1)
                if int(i) < self._skip_from or not skip_special_tokens]
        return " ".join(_WORDS[i % len(_WORDS)] for i in keep)


class _MarianTokShim:
    """Minimal MarianTokenizer stand-in: deterministic word hashing for
    encode, word-list decode, opus-mt pad/eos conventions from the cfg."""

    def __init__(self, cfg):
        self.pad = cfg.pad_token_id
        self.eos = cfg.eos_token_id
        self.vocab = cfg.vocab_size

    def __call__(self, texts, return_tensors="np", padding=True,
                 pad_to_multiple_of=16):
        lo, hi = max(self.eos, 1) + 1, min(self.pad, self.vocab)
        rows = [
            [lo + _stable_hash(w, hi - lo) for w in t.split()] + [self.eos]
            for t in texts
        ]
        width = max(len(r) for r in rows)
        if pad_to_multiple_of:
            width = -(-width // pad_to_multiple_of) * pad_to_multiple_of
        ids = np.full((len(rows), width), self.pad, np.int32)
        mask = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids, skip_special_tokens=True):
        keep = [int(i) for i in np.asarray(ids).reshape(-1)
                if int(i) not in (self.pad, self.eos)]
        return " ".join(_WORDS[i % len(_WORDS)] for i in keep)


def _write_wav(path, seconds=5.0, rate=16000):
    rng = np.random.default_rng(1)
    t = np.arange(int(seconds * rate)) / rate
    wavef = 0.1 * np.sin(2 * np.pi * 220.0 * t) + 0.01 * rng.standard_normal(
        t.size
    )
    pcm = (np.clip(wavef, -1, 1) * 32767).astype(np.int16)
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def _p50(fn, iters):
    """fn must block on completion itself; returns (first_s, p50_of_rest)."""
    t0 = time.perf_counter()
    fn()
    first = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return first, sorted(times)[len(times) // 2]


def main():
    # speech/edit geometry knobs shared with benchmarks/speech_rehearsal.py
    n_new = int(os.environ.get("SPEECH_TOKENS", "8" if TINY else "32"))
    iters = int(os.environ.get("SPEECH_ITERS", "1" if TINY else "3"))

    os.environ.setdefault("LOONGX_W8A8", "1")
    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    if not TINY:
        enable_compilation_cache()

    # shared rehearsal checkpoint: int8 12B DiT + VAE + CS3/DGF + real
    # tokenizer files (benchmarks/train_rehearsal.py owns the synthesis)
    from benchmarks import train_rehearsal as tr

    report = {"geometry": ("tiny" if TINY else
                           "whisper-large-v2 + opus-mt-zh-en + FLUX.1-dev "
                           "int8 12B"),
              "new_tokens": n_new}
    tr.synth_corpus()
    tr.ensure_checkpoint(report)

    wav_path = os.path.join(tr.ROOT, "utterance.wav")
    if not os.path.exists(wav_path):
        _write_wav(wav_path, seconds=1.0 if TINY else 5.0)

    import jax
    import jax.numpy as jnp

    from loongx_tpu.cli.speech_demo import _read_audio
    from loongx_tpu.models.text.marian import MarianConfig, MarianTranslator
    from loongx_tpu.models.text.whisper import WhisperASR, WhisperConfig
    from loongx_tpu.utils.convert import (
        convert_marian_state, convert_whisper_state,
    )

    cold_t0 = time.time()

    # ---- speech stage: wav -> instruction ------------------------------
    from benchmarks.speech_rehearsal import (
        _rand_state_marian, _rand_state_whisper,
    )

    rng = np.random.default_rng(0)
    wcfg = WhisperConfig.tiny() if TINY else WhisperConfig.large()
    mcfg = MarianConfig.tiny() if TINY else MarianConfig.opus_mt()
    t0 = time.time()
    asr = WhisperASR(
        convert_whisper_state(_rand_state_whisper(wcfg, rng), wcfg,
                              dtype=jnp.bfloat16),
        wcfg, _WhisperTokShim(wcfg),
    )
    translator = MarianTranslator(
        convert_marian_state(_rand_state_marian(mcfg, rng), mcfg,
                             dtype=jnp.bfloat16),
        mcfg, _MarianTokShim(mcfg),
    )
    report["speech_load_s"] = round(time.time() - t0, 1)

    audio = _read_audio(wav_path)
    report["wav_seconds"] = round(len(audio) / 16000.0, 2)
    box = {}

    def run_transcribe():
        box["zh"] = asr.transcribe(audio, language="zh",
                                   max_new_tokens=n_new)

    first, p50 = _p50(run_transcribe, iters)
    report["transcribe_compile_s"] = round(first, 2)
    report["transcribe_s"] = round(p50, 3)

    def run_translate():
        box["instruction"] = translator.translate(box["zh"],
                                                  max_new_tokens=n_new)

    first, p50 = _p50(run_translate, iters)
    report["translate_s"] = round(p50, 3)
    instruction = box["instruction"] or "make the sky bluer"
    print(f"[speech-edit] instruction ({len(instruction.split())} words): "
          f"{instruction[:60]!r}", flush=True)

    del asr, translator
    gc.collect()

    # ---- text stage: instruction -> T5/CLIP embeds (staged) ------------
    from loongx_tpu.models.pipeline import LoongXPipeline

    t0 = time.time()
    tp = LoongXPipeline.from_pretrained(tr.OUT, components=("t5", "clip"))
    report["text_load_s"] = round(time.time() - t0, 1)

    def run_encode():
        pe, pl, _ = tp.encode_text([instruction])
        box["pe"] = np.asarray(pe.astype(jnp.float32))
        box["pl"] = np.asarray(pl.astype(jnp.float32))

    first, p50 = _p50(run_encode, iters)
    report["text_encode_compile_s"] = round(first, 2)
    report["text_encode_s"] = round(p50, 3)
    tp.free_text_encoders()
    del tp
    gc.collect()

    # ---- edit stage: embeds + condition image -> PNG -------------------
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate, neural_edit

    size = tr.SIZE
    steps = 2 if TINY else 28
    t0 = time.time()
    pipe = LoongXPipeline.from_pretrained(
        tr.OUT, components=("flux", "vae", "encoders", "dgf")
    )
    report["edit_load_s"] = round(time.time() - t0, 1)

    src = os.path.join(tr.CORPUS, "imgs", "s0_0.png")
    img = Image.open(src).convert("RGB").resize((size, size))
    cond = Condition(condition_type="subject", raw_img=img,
                     position_delta=(0, -size // 16))

    def run_edit():
        box["img"] = generate(
            pipe, conditions=[cond],
            prompt_embeds=jnp.asarray(box["pe"]),
            pooled_prompt_embeds=jnp.asarray(box["pl"]),
            height=size, width=size, num_inference_steps=steps,
            guidance_scale=3.5, seed=42, output_type="uint8",
        )

    first, p50 = _p50(run_edit, max(1, iters - 1))
    report["edit_compile_s"] = round(first, 1)
    report["edit_s"] = round(p50, 3)
    out_png = os.path.join(tr.ROOT, "speech_edit.png")
    Image.fromarray(box["img"][0]).save(out_png)
    report["png"] = out_png

    # deployed replace-mode leg: CS3 encoders + DGF drive the embeds
    # (reference inference.py:115 fuse_flag=False — the shipped demo mode)
    brain = {
        "EEG": rng.standard_normal((1, 4, 4096)).astype(np.float32),
        "FNIRS": rng.standard_normal((1, 6, 512)).astype(np.float32),
        "PPG": rng.standard_normal((1, 4, 256)).astype(np.float32),
        "Motion": rng.standard_normal((1, 6, 128)).astype(np.float32),
    }

    def run_neural():
        box["nimg"] = neural_edit(
            pipe, cond.condition, eeg=brain["EEG"], ppg=brain["PPG"],
            fnirs=brain["FNIRS"], motion=brain["Motion"],
            condition_type="subject", height=size, width=size,
            num_inference_steps=steps, guidance_scale=3.5, seed=42,
            position_delta=(0, -size // 16), output_type="uint8",
        )

    first, p50 = _p50(run_neural, max(1, iters - 1))
    report["edit_neural_compile_s"] = round(first, 1)
    report["edit_neural_s"] = round(p50, 3)

    report["cold_total_s"] = round(time.time() - cold_t0, 1)
    report["utterance_to_image_warm_s"] = round(
        report["transcribe_s"] + report["translate_s"]
        + report["text_encode_s"] + report["edit_s"], 3
    )
    stats = jax.local_devices()[0].memory_stats() or {}
    if "peak_bytes_in_use" in stats:
        report["peak_hbm_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    report["device"] = str(jax.devices()[0])
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
