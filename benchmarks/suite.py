"""Benchmark suite: the five operating points from BASELINE.json.

  1. CS3+DGF encoder forward on one L-Mind-shaped biosignal sample
  2. Single FLUX denoise step, 256x256 text-only (schnell-style 4-step)
  3. Full neural-driven edit, 512x512 28-step (per inference.sh)
  4. Multimodal fusion edit (neural + text instruction via DGF)
  5. Batch eval pipeline (pixel + cosine metric path, synthetic pairs)

Each prints one JSON line; run `python benchmarks/suite.py [1 2 ...]`.
Timing forces real execution (float() pulls) — host RPC included, which is
what an end user experiences.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _report(name, seconds, unit="s", extra=None):
    out = {"bench": name, "value": round(seconds, 4), "unit": unit}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)


def bench_encoders():
    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.sampling.generate import encode_brain_conditions

    pipe = LoongXPipeline.tiny(jax.random.key(0), with_biosignal=True)
    rng = np.random.RandomState(0)
    sig = dict(
        eeg=rng.randn(1, 4, 4096).astype(np.float32),
        ppg=rng.randn(1, 4, 256).astype(np.float32),
        fnirs=rng.randn(1, 6, 512).astype(np.float32),
        motion=rng.randn(1, 6, 128).astype(np.float32),
    )
    bp, bq = encode_brain_conditions(pipe, **sig)
    float(bp.astype(jnp.float32).mean())  # compile+sync
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        bp, bq = encode_brain_conditions(pipe, **sig)
        float(bp.astype(jnp.float32).mean())
    _report("cs3_dgf_encode", (time.perf_counter() - t0) / n,
            extra={"out_shapes": [list(bp.shape), list(bq.shape)]})


def _flux_lite():
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params

    cfg = FluxConfig(num_double_blocks=8, num_single_blocks=16,
                     guidance_embeds=False)
    return cfg, init_flux_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)


def bench_schnell_step():
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.schedule import flux_sigmas
    from loongx_tpu.sampling.generate import denoise_scan

    cfg, params = _flux_lite()
    s_img = (256 // 8 // 2) ** 2  # 256px -> 256 tokens
    ks = jax.random.split(jax.random.key(1), 3)
    latents = jax.random.normal(ks[0], (1, s_img, 64), jnp.bfloat16)
    txt = jax.random.normal(ks[1], (1, 512, 4096), jnp.bfloat16)
    pooled = jax.random.normal(ks[2], (1, 768), jnp.bfloat16)
    sig = jnp.asarray(flux_sigmas(4, s_img, use_dynamic_shifting=False))

    def run():
        return denoise_scan(
            params, cfg, (), latents, txt, pooled, latent_image_ids(32, 32),
            jnp.zeros((512, 3)), None, None, sig, None, None,
        )

    float(run().astype(jnp.float32).mean())
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        float(run().astype(jnp.float32).mean())
    dt = (time.perf_counter() - t0) / n
    _report("schnell_256_4step", dt, extra={"ms_per_step": round(dt / 4 * 1e3, 1)})


def bench_full_edit():
    import subprocess

    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    print(line[-1] if line else json.dumps({"bench": "full_edit", "error": out.stderr[-200:]}))


def bench_fusion_edit():
    """Neural + text multimodal fusion path (DGF fuse_flag=True)."""
    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.models.fusion import fuse_text_infer
    from loongx_tpu.sampling.generate import encode_brain_conditions

    pipe = LoongXPipeline.tiny(jax.random.key(0), with_biosignal=True)
    rng = np.random.RandomState(0)
    prompt = jnp.asarray(rng.randn(1, 512, 4096), jnp.float32)
    pooled = jnp.asarray(rng.randn(1, 768), jnp.float32)
    sig = dict(
        eeg=rng.randn(1, 4, 4096).astype(np.float32),
        ppg=rng.randn(1, 4, 256).astype(np.float32),
        fnirs=rng.randn(1, 6, 512).astype(np.float32),
        motion=rng.randn(1, 6, 128).astype(np.float32),
    )

    @jax.jit
    def fuse(dgf, prompt, pooled, bp, bq):
        return fuse_text_infer(dgf, prompt, pooled, bp, bq)

    bp, bq = encode_brain_conditions(pipe, **sig)
    p, q = fuse(pipe.params["dgf"], prompt, pooled,
                bp.astype(jnp.float32), bq.astype(jnp.float32))
    float(p.mean())
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        bp, bq = encode_brain_conditions(pipe, **sig)
        p, q = fuse(pipe.params["dgf"], prompt, pooled,
                    bp.astype(jnp.float32), bq.astype(jnp.float32))
        float(p.mean())
    _report("multimodal_fusion", (time.perf_counter() - t0) / n)


def bench_eval_pipeline(tmp_dir="/tmp/loongx_eval_bench"):
    import os

    from PIL import Image

    from loongx_tpu.evaluation import evaluate_directory

    os.makedirs(tmp_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    n = 32
    for i in range(n):
        base = rng.randint(0, 255, (512, 512, 3), np.uint8)
        Image.fromarray(base).save(f"{tmp_dir}/s{i}_0.png")
        Image.fromarray(base).save(f"{tmp_dir}/s{i}_1.png")

    def fake_embed(paths):
        return rng.randn(len(paths), 512)

    t0 = time.perf_counter()
    evaluate_directory(
        tmp_dir, clip_image_embed=fake_embed, dino_image_embed=fake_embed,
    )
    _report("eval_pipeline_32pairs", time.perf_counter() - t0,
            extra={"note": "pixel metrics real; embeddings faked (no local weights)"})


BENCHES = {
    "1": bench_encoders,
    "2": bench_schnell_step,
    "3": bench_full_edit,
    "4": bench_fusion_edit,
    "5": bench_eval_pipeline,
}

if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "4", "5"]  # 3 is the long one
    for w in which:
        BENCHES[w]()
