"""Headline benchmark: neural-conditioned 512x512 28-step edit, measured
END-TO-END on one chip — every stage of the reference's deployed edit
pipeline (/root/reference/inference.py:77-117 -> src/flux/generate.py:152-380):

  1. T5-XXL + CLIP-L prompt encode (int8, staged then freed — the
     single-chip serving recipe, models/pipeline.py free_text_encoders)
  2. CS3 biosignal encode + DGF fusion (EEG/PPG/fNIRS/motion -> brain
     embeds; deployed fuse_flag=False mode, reference inference.py:115)
  3. condition-image VAE encode -> packed cond tokens
  4. 28-step flow-match Euler denoise (one jitted lax.scan)
  5. VAE decode

The headline value is edits/sec over the SUM of all stage latencies; the
per-stage breakdown is itemized in the JSON extras, along with the
denoise+decode-only number for continuity with earlier rounds.

Composition nuance (stated so the summed pipeline is read correctly): the
text encoders are measured RESIDENT and then freed before the DiT
allocation — the staged single-chip recipe.  At steady state on one chip
the 12B int8 DiT and the int8 T5-XXL cannot be co-resident, so a per-edit
text encode beside the DiT is not physically possible; deployed replace
mode doesn't need it (generate() skips the dead text encode when brain
embeds cover both slots), so including its cost in the headline sum is
conservative.  Run-to-run variance on the shared chip is reported as
``repeat_band_s`` = [min, max] seconds over the BENCH_ITERS timed repeats
of the headline stage, so a single sample isn't over-read (historical
band: ~0.208-0.216 e2e edits/sec).

By default benchmarks the FULL FLUX.1-dev geometry (19 double + 38 single
blocks, 3072 hidden, 24 heads x 128, ~12B params) with int8-quantized
matmuls (W8A8 by default) so the whole 11.9 GB weight set resides in a
16 GB v5e's HBM.  Set BENCH_LITE=1 to run the bf16 8+16 "flux-lite" proxy
instead.  The reference publishes no latency numbers (SURVEY §6), so
vs_baseline is null.

Failure containment: every stage is wrapped; if an upstream stage fails
the benchmark still emits ONE JSON line with whatever numbers were
measured plus an "errors" field, and the metric label only claims the
stages that actually ran.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import gc
import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp


def _force(x):
    """Force real device execution (block_until_ready is dispatch-only on
    remote-compile platforms; a scalar pull is the reliable barrier)."""
    return float(jnp.asarray(x).mean())


def _force_tree(t):
    for leaf in jax.tree.leaves(t):
        _force(leaf)
        break
    return t


def _measure(fn, *args, iters=None):
    """Warmup/compile once, then mean seconds per call over BENCH_ITERS —
    the single timing methodology for every stage.  ``iters`` overrides for
    cheap stages (sub-100ms encodes), where RPC jitter on the
    remote-compile platform would otherwise dominate a 3-sample mean."""
    out = fn(*args)
    for leaf in jax.tree.leaves(out):
        _force(leaf)
    n = iters or int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:
        for leaf in jax.tree.leaves(o):
            _force(leaf)
    dt = (time.perf_counter() - t0) / n
    # per-repeat band for the variance report (dispatch is async, so
    # per-call splits need their own forced runs; only worth it for the
    # expensive headline stages — sample when the mean is > 1 s)
    if dt > 1.0 and n > 1:
        times = []
        for _ in range(n):
            t1 = time.perf_counter()
            o = fn(*args)
            for leaf in jax.tree.leaves(o):
                _force(leaf)
            times.append(time.perf_counter() - t1)
        _measure.last_band = [round(min(times), 3), round(max(times), 3)]
    else:
        _measure.last_band = None
    return dt


def main():
    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.models.flux.vae import (
        VAEConfig, init_vae_params, vae_decode, vae_encode, scale_latents,
        unscale_latents,
    )
    from loongx_tpu.ops.latents import latent_image_ids, pack_latents, unpack_latents
    from loongx_tpu.ops.schedule import flux_sigmas
    from loongx_tpu.sampling.generate import denoise_scan

    errors = []
    extras = {}
    stages = {}
    enc = dgf = brain_sigs = cond_img = None

    lite = os.environ.get("BENCH_LITE") == "1"
    full = not lite
    steps = int(os.environ.get("BENCH_STEPS", "28"))
    height = width = int(os.environ.get("BENCH_SIZE", "512"))
    b = int(os.environ.get("BENCH_BATCH", "1"))
    s_txt = 512

    # Serving mode for the int8 full-dev path: W8A8 (native int8 MXU,
    # 344-354 TF/s on these shapes) by default — 28-step full-trajectory
    # latent agreement with bf16 measured in benchmarks/trajectory_agreement
    # (PARITY.md).  LOONGX_W8A8=0 opts out.
    if full and "LOONGX_W8A8" not in os.environ:
        os.environ["LOONGX_W8A8"] = "1"
    w8a8 = os.environ.get("LOONGX_W8A8") == "1" and full
    # int8-MXU QK^T logits.  LOONGX_INT8_ATTN=0 opts out.
    if full and w8a8 and "LOONGX_INT8_ATTN" not in os.environ:
        os.environ["LOONGX_INT8_ATTN"] = "1"
    # label truthfully: the env var reaches flash_attention regardless of
    # full/lite (only the explicit lite *fallback* forces it off); the
    # kernel gates int8 scores by its tile policy (see flash_attention.py)
    int8_attn = os.environ.get("LOONGX_INT8_ATTN") == "1"

    key = jax.random.key(0)
    ks = jax.random.split(key, 12)

    # ------------------------------------------------------------------
    # Stage 1: prompt encode — int8 T5-XXL + CLIP-L, then FREE them (the
    # staged single-chip recipe; they cannot be co-resident with the 12B
    # int8 DiT).  Runs FIRST so its ~5 GiB peak precedes the DiT alloc.
    # Mirrors reference generate.py:152-165 (encode_prompt).
    # ------------------------------------------------------------------
    if full and os.environ.get("BENCH_E2E", "1") == "1":
        try:
            from loongx_tpu.models.text.t5 import (
                T5Config, init_t5_params, t5_encode,
            )
            from loongx_tpu.models.text.clip import (
                CLIPTextConfig, init_clip_params, clip_encode,
            )
            from loongx_tpu.ops.quant import random_quantized_like

            t5_cfg = T5Config.xxl()
            clip_cfg = CLIPTextConfig.large()
            t5_params = random_quantized_like(
                ks[6], lambda: init_t5_params(ks[6], t5_cfg, dtype=jnp.bfloat16)
            )
            clip_params = random_quantized_like(
                ks[7], lambda: init_clip_params(ks[7], clip_cfg, dtype=jnp.bfloat16)
            )
            t5_ids = jnp.ones((b, s_txt), jnp.int32)
            clip_ids = jnp.ones((b, 77), jnp.int32)

            @jax.jit
            def encode_prompt(t5_params, clip_params, t5_ids, clip_ids):
                emb = t5_encode(t5_params, t5_cfg, t5_ids)
                _, pooled = clip_encode(clip_params, clip_cfg, clip_ids)
                return emb, pooled

            stages["text_encode_s"] = round(
                _measure(encode_prompt, t5_params, clip_params, t5_ids,
                         clip_ids, iters=10),
                4,
            )
            del t5_params, clip_params, encode_prompt
            gc.collect()
        except Exception:  # noqa: BLE001 - containment by design
            errors.append(
                "text: " + traceback.format_exc(limit=3).strip().splitlines()[-1]
            )

        # --------------------------------------------------------------
        # Stage 2: CS3 + DGF brain encode (reference generate.py:167-258;
        # deployed replace mode) — bf16 encoders, real signal lengths.
        # --------------------------------------------------------------
        try:
            from loongx_tpu.models.encoders import (
                init_eeg_encoder, init_ppg_encoder, init_fnirs_encoder,
                init_motion_encoder,
            )
            from loongx_tpu.models.fusion import init_dgf
            from loongx_tpu.sampling.generate import _brain_encode_jit

            enc = {
                "eeg": init_eeg_encoder(ks[8], jnp.bfloat16),
                "ppg": init_ppg_encoder(ks[9], jnp.bfloat16),
                "fnirs": init_fnirs_encoder(ks[10], jnp.bfloat16),
                "motion": init_motion_encoder(ks[11], jnp.bfloat16),
            }
            dgf = init_dgf(jax.random.fold_in(key, 99), jnp.bfloat16)
            sig = lambda k, c, l: jax.random.normal(
                jax.random.fold_in(key, k), (b, c, l), jnp.bfloat16
            )
            eeg, ppg = sig(1, 4, 4096), sig(2, 4, 256)
            fnirs, motion = sig(3, 6, 512), sig(4, 6, 128)

            def brain(enc, dgf, eeg, ppg, fnirs, motion):
                return _brain_encode_jit(enc, dgf, eeg, ppg, fnirs, motion, "conv")

            stages["brain_encode_s"] = round(
                _measure(brain, enc, dgf, eeg, ppg, fnirs, motion, iters=10), 4
            )
            # enc/dgf stay resident (~0.25 GB): deployed serving runs them
            # per edit alongside the DiT, and the fused single-dispatch edit
            # below needs them live
            brain_sigs = (eeg, ppg, fnirs, motion)
        except Exception:  # noqa: BLE001
            enc = dgf = brain_sigs = None
            errors.append(
                "brain: " + traceback.format_exc(limit=3).strip().splitlines()[-1]
            )

    # ------------------------------------------------------------------
    # DiT weights (the big allocation — after the text encoders are gone)
    # ------------------------------------------------------------------
    cfg = (
        FluxConfig.flux_dev()
        if full
        else FluxConfig(num_double_blocks=8, num_single_blocks=16)
    )
    vae_cfg = VAEConfig.flux()
    if full:
        # random int8 weights created directly (a bf16 12B init would blow
        # the 16 GB chip before quantization could run)
        from loongx_tpu.ops.quant import (
            fuse_qkv_projections, random_quantized_like,
        )

        flux_params = random_quantized_like(
            ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
        )
        if os.environ.get("LOONGX_FUSE_QKV", "1") == "1":
            # one qkv matmul per stream (exact concat of int8 stacks);
            # consume=True keeps peak HBM to one fused stack at a time
            flux_params = fuse_qkv_projections(flux_params, consume=True)
        if os.environ.get("LOONGX_SPLIT_PROJ", "1") == "1":
            from loongx_tpu.ops.quant import split_single_proj_out

            # exact K-split of single-block proj_out: kills the per-block
            # [S, hidden+mlp] concat (75 MB HBM write each)
            flux_params = split_single_proj_out(
                flux_params, cfg.hidden, consume=True
            )
    else:
        flux_params = init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)

    lat_h, lat_w = height // 8, width // 8
    s_img = (lat_h // 2) * (lat_w // 2)
    s_total = 2 * s_img + s_txt  # [txt | img | cond] unified sequence
    # (round 3: int8 scores run at every S — multi-tile grids cache the
    # quantized q/k tiles in kernel scratch, flash_attention.py)
    latents = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jax.random.normal(ks[3], (b, s_txt, cfg.joint_dim), jnp.bfloat16)
    pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
    cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
    img_ids = latent_image_ids(lat_h, lat_w)
    txt_ids = jnp.zeros((s_txt, 3))
    cond_ids = latent_image_ids(lat_h, lat_w)
    sigmas = jnp.asarray(flux_sigmas(steps, s_img))
    guidance = jnp.full((b,), 3.5)

    # --- stage: VAE (encode for the condition image, decode for the output;
    # contained so a VAE failure cannot zero out the denoise measurement) ---
    decode = None
    vae_params = None
    try:
        vae_params = init_vae_params(ks[1], vae_cfg, dtype=jnp.bfloat16)

        @jax.jit
        def decode(vae_params, out):
            lat = unpack_latents(out, lat_h, lat_w)
            lat = unscale_latents(vae_cfg, lat).astype(jnp.bfloat16)
            return vae_decode(vae_params, vae_cfg, lat)

        _force(decode(vae_params, latents))
    except Exception:  # noqa: BLE001 - containment by design
        errors.append("vae: " + traceback.format_exc(limit=3).strip().splitlines()[-1])
        decode = None

    # Stage 3: condition-image VAE encode -> packed cond tokens (reference
    # condition.py:106-138 encode -> pipeline_tools.encode_images)
    if full and decode is not None and os.environ.get("BENCH_E2E", "1") == "1":
        try:
            cond_img = jax.random.uniform(
                jax.random.fold_in(key, 5), (b, height, width, 3), jnp.bfloat16,
                minval=-1.0, maxval=1.0,
            )

            @jax.jit
            def encode_cond(vae_params, img):
                mean, _ = vae_encode(vae_params, vae_cfg, img)
                return pack_latents(scale_latents(vae_cfg, mean))

            stages["cond_vae_encode_s"] = round(
                _measure(encode_cond, vae_params, cond_img, iters=10), 4
            )
        except Exception:  # noqa: BLE001
            errors.append(
                "cond-vae: "
                + traceback.format_exc(limit=3).strip().splitlines()[-1]
            )

    def edit(latents):
        out = denoise_scan(
            flux_params, cfg, (), latents, txt, pooled, img_ids, txt_ids,
            cond, cond_ids, sigmas, guidance, None,
        )
        return decode(vae_params, out) if decode is not None else out

    # --- stage: compile + measure the denoise+decode loop ------------------
    dt = None
    band = None
    try:
        dt = _measure(edit, latents)
        band = _measure.last_band
    except Exception:  # noqa: BLE001
        errors.append(
            "edit: " + traceback.format_exc(limit=3).strip().splitlines()[-1]
        )

    # --- fused single-dispatch edit: brain encode + cond VAE encode +
    # denoise + decode as ONE program (sampling.generate.fused_edit_program,
    # the neural_edit serving path).  On this remote-dispatch host each
    # fused-away launch is ~20 ms of per-edit latency, so when it runs the
    # headline e2e = text_encode + fused_edit; the separately-measured
    # stages stay in extras as the breakdown. -------------------------------
    fused_dt = None
    if (
        dt is not None and full and decode is not None
        and enc is not None and cond_img is not None
    ):
        try:
            from loongx_tpu.sampling.generate import fused_edit_program

            def fused_edit(latents):
                return fused_edit_program(
                    flux_params, vae_params, enc, dgf, cond_img,
                    *brain_sigs, latents, img_ids, cond_ids, sigmas,
                    guidance, None, None,
                    flux_cfg=cfg, vae_cfg=vae_cfg, flags=(),
                    s4_mode="conv", attn_backend="auto",
                    lat_h=lat_h, lat_w=lat_w,
                )

            fused_dt = _measure(fused_edit, latents)
            # the fused stage is now the headline — its band (possibly None
            # for single-repeat runs) replaces the denoise+decode band rather
            # than silently keeping a different stage's variance
            band = _measure.last_band
        except Exception:  # noqa: BLE001
            errors.append(
                "fused: "
                + traceback.format_exc(limit=3).strip().splitlines()[-1]
            )

    if dt is None and full:
        # last-resort fallback: the lite proxy, so the run still produces a
        # measured number rather than nothing
        try:
            os.environ["LOONGX_INT8_ATTN"] = "0"  # lite fallback: bf16 attn
            int8_attn = False
            lcfg = FluxConfig(num_double_blocks=8, num_single_blocks=16)
            lparams = init_flux_params(ks[0], lcfg, dtype=jnp.bfloat16)

            def lite_edit(latents):
                out = denoise_scan(
                    lparams, lcfg, (), latents, txt, pooled, img_ids, txt_ids,
                    cond, cond_ids, sigmas, guidance, None,
                )
                return decode(vae_params, out) if decode is not None else out

            dt = _measure(lite_edit, latents)
            full = False
            w8a8 = False  # the lite fallback runs plain bf16 weights
            flux_params = lparams
            extras["fallback"] = "flux-lite (full-dev stage failed)"
        except Exception:  # noqa: BLE001
            errors.append(
                "lite-fallback: "
                + traceback.format_exc(limit=3).strip().splitlines()[-1]
            )

    def _params_b(p):
        return round(sum(x.size for x in jax.tree.leaves(p)) / 1e9, 2)

    # ------------------------------------------------------------------
    # Assemble: headline = end-to-end.  With the fused single-dispatch edit
    # measured, e2e = text_encode + fused (brain+cond-vae+denoise+decode in
    # one program — the neural_edit serving path); otherwise all measured
    # stages summed.  The itemized stages and the denoise+decode-only number
    # stay in extras for the breakdown and cross-round continuity.
    # ------------------------------------------------------------------
    upstream = sum(stages.values())
    all_stages_ran = dt is not None and len(stages) == 3
    if fused_dt is not None and all_stages_ran:
        e2e = stages["text_encode_s"] + fused_dt
    else:
        e2e = (dt + upstream) if dt else None
    scope = "end-to-end" if all_stages_ran else (
        "denoise+decode" if not stages else
        "partial e2e (" + "+".join(sorted(stages)) + "+denoise)"
    )
    if dt:
        stages["denoise_decode_s"] = round(dt, 4)
        if fused_dt is not None:
            stages["fused_edit_s"] = round(fused_dt, 4)
        extras["stages"] = stages
        extras["denoise_decode_edits_per_s"] = round(b / dt, 4)
        if band:
            # [min, max] seconds over the timed repeats of the headline
            # stage (fused edit when measured, else denoise+decode) — the
            # shared-chip run-to-run variance context for a single sample
            extras["repeat_band_s"] = band

    result = {
        "metric": f"{scope} edits/sec/chip ({height}x{width}, {steps}-step, "
        f"cond-image+biosignal, "
        f"{'flux-dev-int8 19+38' if full else 'flux-lite 8+16'}"
        f"{' w8a8' if w8a8 else ''}"
        f"{' int8-attn' if int8_attn else ''}"
        f"{', batch ' + str(b) if b > 1 else ''}"
        f"{'' if decode is not None else ', no-vae'})",
        "value": round(b / e2e, 4) if e2e else 0.0,
        "unit": "edits/sec",
        "vs_baseline": None,
        "p50_latency_s": round(e2e, 3) if e2e else None,
        "ms_per_step": round(dt / steps * 1e3, 2) if dt else None,
        "device": str(jax.devices()[0]),
        "params_b": _params_b(flux_params),
        **extras,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    return 0 if dt else 1


if __name__ == "__main__":
    sys.exit(main())
