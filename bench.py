"""Headline benchmark: neural-conditioned 512x512 28-step edit, edits/sec/chip.

Mirrors the reference's deployed operating point (BASELINE.md: 512x512,
28 steps, guidance 3.5, 512 text tokens, one condition image): text-embed
conditioned FLUX denoise loop + condition tokens + VAE decode, end to end on
one chip.

The full FLUX.1-dev (12B params, ~24 GB bf16) does not fit one 16 GB v5e in
bf16, so the default benchmarks ``flux-lite``: identical block geometry
(3072 hidden, 24 heads x 128, same token counts — so per-block speed is the
real thing) at reduced depth (8 double + 16 single blocks, ~5B params).
Set BENCH_FULL=1 to run the full 19+38 stack with int8 weight-only
quantization (ops/quant.py; ~11.9 GB weights).  Note: the tunneled chip in
this environment exposes less usable HBM than the nominal 16 GB and the
full-dev program OOMs even at 256 px; run BENCH_FULL on a >=24 GB chip.
The reference publishes no latency numbers (SURVEY §6), so vs_baseline is
null.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.models.flux.vae import (
        VAEConfig, init_vae_params, vae_decode, unscale_latents,
    )
    from loongx_tpu.ops.latents import latent_image_ids, unpack_latents
    from loongx_tpu.ops.schedule import flux_sigmas
    from loongx_tpu.sampling.generate import denoise_scan

    full = os.environ.get("BENCH_FULL") == "1"
    steps = int(os.environ.get("BENCH_STEPS", "28"))
    height = width = int(os.environ.get("BENCH_SIZE", "512"))

    cfg = (
        FluxConfig.flux_dev()
        if full
        else FluxConfig(num_double_blocks=8, num_single_blocks=16)
    )
    vae_cfg = VAEConfig.flux()
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    if full:
        # random int8 weights created directly (a bf16 12B init would blow
        # the 16 GB chip before quantization could run)
        from loongx_tpu.ops.quant import random_quantized_like

        flux_params = random_quantized_like(
            ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
        )
    else:
        flux_params = init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
    vae_params = init_vae_params(ks[1], vae_cfg, dtype=jnp.bfloat16)

    b, s_txt = int(os.environ.get("BENCH_BATCH", "1")), 512
    lat_h, lat_w = height // 8, width // 8
    s_img = (lat_h // 2) * (lat_w // 2)
    latents = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jax.random.normal(ks[3], (b, s_txt, cfg.joint_dim), jnp.bfloat16)
    pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
    cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
    img_ids = latent_image_ids(lat_h, lat_w)
    txt_ids = jnp.zeros((s_txt, 3))
    cond_ids = latent_image_ids(lat_h, lat_w)
    sigmas = jnp.asarray(flux_sigmas(steps, s_img))
    guidance = jnp.full((b,), 3.5)

    @jax.jit
    def decode(vae_params, out):
        lat = unpack_latents(out, lat_h, lat_w)
        lat = unscale_latents(vae_cfg, lat).astype(jnp.bfloat16)
        return vae_decode(vae_params, vae_cfg, lat)

    def edit(latents):
        out = denoise_scan(
            flux_params, cfg, (), latents, txt, pooled, img_ids, txt_ids,
            cond, cond_ids, sigmas, guidance, None,
        )
        return decode(vae_params, out)

    # warmup / compile — force real execution (block_until_ready is async
    # under remote-compile platforms; a scalar pull is the reliable barrier)
    float(edit(latents).mean())
    n = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    outs = [edit(latents) for _ in range(n)]
    for o in outs:
        float(o.mean())
    dt = (time.perf_counter() - t0) / n

    result = {
        "metric": f"edits/sec/chip ({height}x{width}, {steps}-step, cond-image, "
        f"{'flux-dev-int8' if full else 'flux-lite 8+16'}"
        f"{', batch ' + str(b) if b > 1 else ''})",
        "value": round(b / dt, 4),
        "unit": "edits/sec",
        "vs_baseline": None,
        "p50_latency_s": round(dt, 3),
        "ms_per_step": round(dt / steps * 1e3, 2),
        "device": str(jax.devices()[0]),
        "params_b": round(
            sum(x.size for x in jax.tree.leaves(flux_params)) / 1e9, 2
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
