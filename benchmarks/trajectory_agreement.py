"""FULL-TRAJECTORY (28-step) serving-mode quality proof.

Round-2 verdict asked for the actual 28-step final-latent drift of every
int8 serving mode — not a 4-step proxy — at 512 AND 1024 px, with realistic
adaLN gate magnitudes instead of the harness-side O(1) gate-boost hack.

Two ladders, both running the REAL 28-step denoise scan end to end:

  A. full-depth (19+38, 11.9B): weight-only int8 is the least-quantized
     mode that fits the chip — W8A8 and W8A8+int8-attn are compared
     against it over the full trajectory.  (A bf16 12B tree is 23.8 GB —
     cannot exist on a ~14 GiB chip, so the bf16 anchor comes from B.)
  B. full-width reduced-depth (6 double + 12 single, ~4.3B): the SAME
     weight tree runs in bf16 AND in every int8 mode — a true bf16 anchor
     for the per-mode trajectory drift at identical width/sequence shapes.

Realistic gates: `realistic_adaln_bias` draws the adaLN-linear bias leaves
from N(0, 0.7) — in trained FLUX checkpoints the bias term dominates the
modulation output and the gate channels are O(1); a random init leaves
gates at ~1e-3 which buries attention/quant noise below bf16 resolution in
the residual adds (docs/PERF_NOTES.md "methodology guardrails").  The
realism lives in the WEIGHTS (both the bf16 and int8 trees inherit it),
not in a harness-side output override.

Run on the TPU host:
  python -m benchmarks.trajectory_agreement             # 512 px
  BENCH_SIZE=1024 python -m benchmarks.trajectory_agreement
  TRAJ_PART=B python -m benchmarks.trajectory_agreement # reduced-depth only
  TRAJ_GATE_STD=1.4 TRAJ_PART=B python -m benchmarks.trajectory_agreement
    # gate-magnitude sensitivity bracket (0.35 / 0.7 / 1.4)
"""

import gc
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.quant import quantize_tree, random_quantized_like
from loongx_tpu.ops.schedule import flux_sigmas
from loongx_tpu.sampling.generate import denoise_scan

STEPS = int(os.environ.get("BENCH_STEPS", "28"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PART = os.environ.get("TRAJ_PART", "AB").upper()
# TRAJ_GATE_STD brackets the "trained gates are O(1)" assumption: the 0.7
# default has never been checked against a real checkpoint (none is
# available here), so the sensitivity sweep runs the same ladder at
# 0.5x/1x/2x the assumed magnitude — if the int8 drift conclusion holds
# across the bracket, it does not ride on the exact value
GATE_STD = float(os.environ.get("TRAJ_GATE_STD", "0.7"))

key = jax.random.key(0)
ks = jax.random.split(key, 8)
B, S_TXT = 1, 512
s_img = (SIZE // 16) ** 2


def realistic_adaln_bias(params, k, std=0.7):
    """Draw every adaLN-linear bias from N(0, std) so modulation outputs
    (shift/scale/gate) are O(1) as in trained FLUX checkpoints."""
    def walk(tree, path=""):
        if isinstance(tree, dict):
            out = {}
            for name, v in tree.items():
                p = f"{path}/{name}"
                if (
                    name == "bias"
                    and ("norm1/" in p + "/" or "norm1_context/" in p + "/"
                         or "/norm/" in p or "norm_out/" in p)
                ):
                    kk = jax.random.fold_in(k, hash(p) % (2 ** 31))
                    out[name] = (
                        jax.random.normal(kk, v.shape, jnp.float32) * std
                    ).astype(v.dtype)
                else:
                    out[name] = walk(v, p)
            return out
        return tree
    return walk(params)


def make_inputs():
    latents = jax.random.normal(ks[2], (B, s_img, 64), jnp.bfloat16)
    txt = jax.random.normal(ks[3], (B, S_TXT, 4096), jnp.bfloat16)
    pooled = jax.random.normal(ks[4], (B, 768), jnp.bfloat16)
    cond = jax.random.normal(ks[5], (B, s_img, 64), jnp.bfloat16)
    ids = latent_image_ids(SIZE // 8, SIZE // 8)
    txt_ids = jnp.zeros((S_TXT, 3))
    sigmas = jnp.asarray(flux_sigmas(STEPS, s_img))
    guidance = jnp.full((B,), 3.5)
    return latents, txt, pooled, cond, ids, txt_ids, sigmas, guidance


def run_traj(params, cfg, inputs, w8a8, int8_attn):
    latents, txt, pooled, cond, ids, txt_ids, sigmas, guidance = inputs
    os.environ["LOONGX_W8A8"] = "1" if w8a8 else "0"
    os.environ["LOONGX_INT8_ATTN"] = "1" if int8_attn else "0"
    jax.clear_caches()  # env knobs are trace-time: never reuse a cached mode
    out = denoise_scan(
        params, cfg, (), latents, txt, pooled, ids, txt_ids,
        cond, ids, sigmas, guidance, None,
    )
    return np.asarray(out.astype(jnp.float32))


def compare(ref, x):
    cos = float(
        (ref.ravel() @ x.ravel())
        / (np.linalg.norm(ref) * np.linalg.norm(x) + 1e-12)
    )
    rel = float(np.linalg.norm(x - ref) / (np.linalg.norm(ref) + 1e-12))
    return {"cos": round(cos, 6), "relL2": round(rel, 5)}


report = {"size": SIZE, "steps": STEPS, "gate_std": GATE_STD}

if "A" in PART:
    cfg = FluxConfig.flux_dev()
    params = random_quantized_like(
        ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
    )
    params = realistic_adaln_bias(params, ks[6], std=GATE_STD)
    inputs = make_inputs()
    ref = run_traj(params, cfg, inputs, w8a8=False, int8_attn=False)
    a = {}
    a["w8a8_vs_weightonly"] = compare(
        ref, run_traj(params, cfg, inputs, w8a8=True, int8_attn=False)
    )
    print("A w8a8_vs_weightonly:", a["w8a8_vs_weightonly"], flush=True)
    a["w8a8+int8attn_vs_weightonly"] = compare(
        ref, run_traj(params, cfg, inputs, w8a8=True, int8_attn=True)
    )
    print("A w8a8+int8attn_vs_weightonly:",
          a["w8a8+int8attn_vs_weightonly"], flush=True)
    report["A_full_depth_19+38"] = a
    del params, ref
    gc.collect()

if "B" in PART:
    cfg = FluxConfig(num_double_blocks=6, num_single_blocks=12)
    bf16 = init_flux_params(ks[1], cfg, dtype=jnp.bfloat16)
    bf16 = realistic_adaln_bias(bf16, ks[6], std=GATE_STD)
    inputs = make_inputs()
    ref = run_traj(bf16, cfg, inputs, w8a8=False, int8_attn=False)
    # quantize ON HOST: quantize_linear's fp32 kernel transients on top of
    # the live bf16 + int8 trees overflow the chip at this size
    host = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    bf16_host = jax.device_put(bf16, host)
    del bf16
    gc.collect()
    with jax.default_device(host):
        qt_host = quantize_tree(bf16_host)
    del bf16_host
    qt = jax.device_put(qt_host, tpu)
    del qt_host
    gc.collect()
    b = {}
    b["weightonly_vs_bf16"] = compare(
        ref, run_traj(qt, cfg, inputs, w8a8=False, int8_attn=False)
    )
    print("B weightonly_vs_bf16:", b["weightonly_vs_bf16"], flush=True)
    b["w8a8_vs_bf16"] = compare(
        ref, run_traj(qt, cfg, inputs, w8a8=True, int8_attn=False)
    )
    print("B w8a8_vs_bf16:", b["w8a8_vs_bf16"], flush=True)
    b["w8a8+int8attn_vs_bf16"] = compare(
        ref, run_traj(qt, cfg, inputs, w8a8=True, int8_attn=True)
    )
    print("B w8a8+int8attn_vs_bf16:", b["w8a8+int8attn_vs_bf16"], flush=True)
    report["B_reduced_depth_6+12_bf16_anchor"] = b

print(json.dumps(report, indent=2))
