"""A/B the two fused-elementwise features (LN+adaLN prologue, gate+resid
epilogue) on the full-dev forward — device wall time per forward for each
knob combination, same weights, caches cleared between configs.

Run on the TPU host:  python -m benchmarks.fused_ew_ab
"""
import json
import os
import time

os.environ.setdefault("LOONGX_W8A8", "1")
os.environ.setdefault("LOONGX_INT8_ATTN", "1")

import jax
import jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.quant import fuse_qkv_projections, random_quantized_like

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = random_quantized_like(
    ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
)
params = fuse_qkv_projections(params, consume=True)

S_TXT = 512
size = int(os.environ.get("BENCH_SIZE", "512"))
s_img = (size // 16) * (size // 16)
ids = latent_image_ids(size // 8, size // 8)
txt_ids = jnp.zeros((S_TXT, 3))
b = 1
lat = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
txt = jax.random.normal(ks[3], (b, S_TXT, cfg.joint_dim), jnp.bfloat16)
pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
t05, g35 = jnp.full((b,), 0.5), jnp.full((b,), 3.5)


def force(x):
    return float(jnp.asarray(x).mean())


def run_config(ln, gate):
    os.environ["LOONGX_FUSE_LN"] = ln
    os.environ["LOONGX_FUSE_GATE"] = gate
    jax.clear_caches()
    fwd = jax.jit(
        lambda p, l: flux_forward(
            p, cfg, img=l, txt=txt, pooled=pooled, timestep=t05, guidance=g35,
            img_ids=ids, txt_ids=txt_ids, cond=cond, cond_ids=ids,
        )
    )
    force(fwd(params, lat))
    n = 8
    t0 = time.perf_counter()
    outs = [fwd(params, lat) for _ in range(n)]
    for o in outs:
        force(o)
    return (time.perf_counter() - t0) / n * 1e3


results = {}
for ln in ("0", "1"):
    for gate in ("0", "1"):
        ms = run_config(ln, gate)
        results[f"ln={ln} gate={gate}"] = round(ms, 2)
        print(f"ln={ln} gate={gate}: {ms:.2f} ms/fwd", flush=True)
print(json.dumps(results))
