"""Batch-serving sweep (VERDICT r3 next-round #10).

Measures the 512² 28-step denoise+decode at batch {1, 2, 4, 8} on one chip
with the full-dev int8 serving configuration (stacked W8A8 kernels, fused
qkv, split proj_out, int8-attn) and reports aggregate edits/sec plus
per-edit efficiency vs batch 1 — the curve behind the batch-aware affine
work's "~97% per-edit efficiency at b4" claim.

Run on the TPU host:  python -m benchmarks.batch_sweep
Knobs: SWEEP_BATCHES (default "1,2,4,8"), BENCH_STEPS (default 28),
BENCH_SIZE (default 512).

Memory note: at batch 8 the activations of the unified [txt|img|cond]
sequence (2560 tokens) alongside the 11.9 GB int8 weight set approach the
~14 GiB usable HBM; failures are contained per batch size and reported.
"""

import json
import os
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp


def _force(x):
    return float(jnp.asarray(x).astype(jnp.float32).mean())


def main():
    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    os.environ.setdefault("LOONGX_W8A8", "1")
    os.environ.setdefault("LOONGX_INT8_ATTN", "1")

    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.models.flux.vae import (
        VAEConfig, init_vae_params, vae_decode, unscale_latents,
    )
    from loongx_tpu.ops.latents import latent_image_ids, unpack_latents
    from loongx_tpu.ops.quant import (
        fuse_qkv_projections, random_quantized_like, split_single_proj_out,
    )
    from loongx_tpu.ops.schedule import flux_sigmas
    from loongx_tpu.sampling.generate import denoise_scan

    steps = int(os.environ.get("BENCH_STEPS", "28"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    batches = [int(x) for x in
               os.environ.get("SWEEP_BATCHES", "1,2,4,8").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    cfg = FluxConfig.flux_dev()
    vae_cfg = VAEConfig.flux()
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    flux_params = random_quantized_like(
        ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
    )
    flux_params = fuse_qkv_projections(flux_params, consume=True)
    flux_params = split_single_proj_out(flux_params, cfg.hidden, consume=True)
    vae_params = init_vae_params(ks[1], vae_cfg, dtype=jnp.bfloat16)

    lat_h = lat_w = size // 8
    s_img = (lat_h // 2) * (lat_w // 2)
    s_txt = 512
    img_ids = latent_image_ids(lat_h, lat_w)
    txt_ids = jnp.zeros((s_txt, 3))
    cond_ids = latent_image_ids(lat_h, lat_w)
    sigmas = jnp.asarray(flux_sigmas(steps, s_img))

    rows = []
    base_per_edit = None
    for b in batches:
        # drop the previous size's executables and their device-resident
        # constants before compiling the next one — at batch 4+ the unified
        # [txt|img|cond] activations alongside the 11.9 GiB int8 weights
        # leave no HBM headroom for a stale executable's buffers
        import gc

        jax.clear_caches()
        gc.collect()
        try:
            latents = jax.random.normal(
                ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16
            )
            txt = jax.random.normal(ks[3], (b, s_txt, cfg.joint_dim), jnp.bfloat16)
            pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
            cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
            guidance = jnp.full((b,), 3.5)

            def edit(latents):
                out = denoise_scan(
                    flux_params, cfg, (), latents, txt, pooled, img_ids,
                    txt_ids, cond, cond_ids, sigmas, guidance, None,
                )
                lat = unpack_latents(out, lat_h, lat_w)
                lat = unscale_latents(vae_cfg, lat).astype(jnp.bfloat16)
                # decode per image (one compiled body, sequential over the
                # batch): batched 512² decoder activations OOM beside the
                # 11.9 GiB int8 weights at batch>=4, and decode is ~1% of
                # the edit — batching only matters for the denoise
                return jax.lax.map(
                    lambda l: vae_decode(vae_params, vae_cfg, l[None])[0], lat
                )

            _force(edit(latents))  # compile
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                _force(edit(latents))
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[len(times) // 2]
            agg = b / dt
            per_edit = dt / b
            if base_per_edit is None:
                base_per_edit = per_edit
            rows.append({
                "batch": b,
                "latency_s": round(dt, 3),
                "aggregate_edits_per_s": round(agg, 4),
                "per_edit_s": round(per_edit, 3),
                "efficiency_vs_b1": round(base_per_edit / per_edit, 3),
                "band_s": [round(min(times), 3), round(max(times), 3)],
            })
            print(json.dumps(rows[-1]))
            del latents, txt, pooled, cond, guidance, edit
        except Exception:
            err = traceback.format_exc()
            print(err)
            lines = [
                ln for ln in err.strip().splitlines()
                if ln.strip().rstrip("-")
                and "JAX has removed its internal frames" not in ln
            ]
            rows.append({"batch": b, "error": lines[-1][:300]})
            print(json.dumps(rows[-1]))
    print(json.dumps({
        "sweep": rows, "steps": steps, "size": size,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
