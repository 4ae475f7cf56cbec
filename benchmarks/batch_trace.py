"""Batch-1 vs batch-4 device-trace breakdown of one flux-lite forward at
512 px (VERDICT r1 Weak #3). Prints per-category device ms and achieved
TFLOP/s so the batch-scaling behavior is roofline-explained."""
import functools, json
import jax, jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.utils.device_bench import device_op_times

cfg = FluxConfig(num_double_blocks=8, num_single_blocks=16)
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)

S_TXT = 512
size = 512
s_img = (size // 16) * (size // 16)
ids = latent_image_ids(size // 8, size // 8)
txt_ids = jnp.zeros((S_TXT, 3))


@functools.partial(jax.jit, static_argnames=("cfg",))
def fwd(params, cfg, lat, txt, pooled, t, g, ids, txt_ids, cond):
    return flux_forward(
        params, cfg, img=lat, txt=txt, pooled=pooled, timestep=t,
        guidance=g, img_ids=ids, txt_ids=txt_ids, cond=cond, cond_ids=ids,
    )


def flops_per_fwd(b):
    h, mlp, dh, nh = cfg.hidden, 4 * cfg.hidden, cfg.head_dim, cfg.num_heads
    s_lat, s_t = 2 * s_img, S_TXT
    s = s_t + s_lat
    mm = lambda m, k, n: 2 * m * k * n
    dbl = (
        4 * mm(s_lat, h, h) + 4 * mm(s_t, h, h)          # qkv+out both streams
        + 2 * mm(s_lat, h, mlp) + 2 * mm(s_t, h, mlp)    # ff in+out
        + 2 * 2 * s * s * dh * nh                        # attention
    )
    sgl = (
        3 * mm(s, h, h) + mm(s, h, mlp) + mm(s, h + mlp, h)
        + 2 * 2 * s * s * dh * nh
    )
    return b * (cfg.num_double_blocks * dbl + cfg.num_single_blocks * sgl)


for b in (1, 4):
    lat = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
    txt = jax.random.normal(ks[3], (b, S_TXT, cfg.joint_dim), jnp.bfloat16)
    pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
    cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
    t05, g35 = jnp.full((b,), 0.5), jnp.full((b,), 3.5)

    n = 4
    ops = device_op_times(
        lambda: fwd(params, cfg, lat, txt, pooled, t05, g35, ids, txt_ids, cond),
        n=n, warmup=1,
    )
    cats = {"matmul(fusion/dot/conv)": 0.0, "flash-attn(pallas)": 0.0, "other": 0.0}
    for name, ms in ops.items():
        lname = name.lower()
        if "flash" in lname or "custom-call" in lname or "pallas" in lname:
            cats["flash-attn(pallas)"] += ms
        elif "dot" in lname or "fusion" in lname or "conv" in lname:
            cats["matmul(fusion/dot/conv)"] += ms
        else:
            cats["other"] += ms
    total_ms = sum(cats.values()) / n
    tflops = flops_per_fwd(b) / 1e12
    print(f"batch {b}: device {total_ms:.1f} ms/fwd, model {tflops:.2f} TF "
          f"-> {tflops / (total_ms / 1e3):.1f} TF/s achieved")
    for k, v in cats.items():
        print(f"    {k}: {v / n:.1f} ms ({100 * v / (total_ms * n):.0f}%)")
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:8]
    for name, ms in top:
        print(f"      top-op {ms / n:7.2f} ms  {name[:90]}")
