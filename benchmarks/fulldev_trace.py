"""Per-op device-trace breakdown of ONE full-dev (19+38, int8 W8A8)
flux_forward at the 512 px operating point, under the same serving
defaults as bench.py (W8A8 + int8-attn + fused qkv + stacked tiles) —
shows where each ~165 ms step of the headline bench goes, by kernel
category and top ops.

Run on the TPU host:  python -m benchmarks.fulldev_trace
"""
import functools
import os

os.environ.setdefault("LOONGX_W8A8", "1")
os.environ.setdefault("LOONGX_INT8_ATTN", "1")

import jax
import jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.quant import (
    fuse_qkv_projections, random_quantized_like, split_single_proj_out,
)
from loongx_tpu.utils.device_bench import device_op_times

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = random_quantized_like(
    ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
)
params = fuse_qkv_projections(params, consume=True)
params = split_single_proj_out(params, cfg.hidden, consume=True)

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


@functools.partial(jax.jit, static_argnames=("cfg",))
def fwd(params, cfg, lat, txt, pooled, t, g, ids, txt_ids, cond):
    return flux_forward(
        params, cfg, img=lat, txt=txt, pooled=pooled, timestep=t,
        guidance=g, img_ids=ids, txt_ids=txt_ids, cond=cond, cond_ids=ids,
    )


n = 4
ops = device_op_times(
    lambda: fwd(params, cfg, lat, txt, pooled, t05, g35, ids, txt_ids, cond),
    n=n, warmup=1,
)


def cat(name: str) -> str:
    l = name.lower()
    if "flash" in l or "attention" in l:
        return "flash-attn(pallas)"
    if "qmm" in l or "quant" in l or "w8a8" in l:
        return "quant-matmul(pallas)"
    if "custom-call" in l or "pallas" in l:
        return "pallas(other)"
    if "dot" in l or "conv" in l:
        return "dot(bf16)"
    if "fusion" in l:
        return "fusion(elementwise/etc)"
    if "copy" in l or "transpose" in l or "bitcast" in l:
        return "copy/layout"
    return "other"


cats = {}
for name, ms in ops.items():
    cats[cat(name)] = cats.get(cat(name), 0.0) + ms
total = sum(cats.values())
print(f"total device: {total / n:.1f} ms/fwd")
for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
    print(f"  {k:26s} {v / n:8.2f} ms  ({100 * v / total:4.1f}%)")
print("top ops:")
for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
    print(f"  {ms / n:8.3f} ms  {name[:110]}")
