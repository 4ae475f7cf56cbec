"""Full-depth (19+38) agreement: weight-only int8 vs W8A8 on an identical
4-step denoise at 512 px — final-latent cosine + relative L2."""
import os
import numpy as np
import jax, jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
from loongx_tpu.ops.quant import random_quantized_like
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.schedule import flux_sigmas

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = random_quantized_like(
    ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
)

b, s_txt, size, steps = 1, 512, 512, 4
s_img = (size // 16) ** 2
latents = jax.random.normal(ks[2], (b, s_img, cfg.in_channels), jnp.bfloat16)
txt = jax.random.normal(ks[3], (b, s_txt, cfg.joint_dim), jnp.bfloat16)
pooled = jax.random.normal(ks[4], (b, cfg.pooled_dim), jnp.bfloat16)
cond = jax.random.normal(ks[5], (b, s_img, cfg.in_channels), jnp.bfloat16)
img_ids = latent_image_ids(size // 8, size // 8)
txt_ids = jnp.zeros((s_txt, 3))
sigmas = jnp.asarray(flux_sigmas(steps, s_img))
guidance = jnp.full((b,), 3.5)


from loongx_tpu.sampling.generate import denoise_scan


def run():
    out = denoise_scan(
        params, cfg, (), latents, txt, pooled, img_ids, txt_ids,
        cond, img_ids, sigmas, guidance, None,
    )
    return np.asarray(out.astype(jnp.float32))


os.environ["LOONGX_W8A8"] = "0"
jax.clear_caches()
out_w = run()
os.environ["LOONGX_W8A8"] = "1"
jax.clear_caches()
out_a = run()

cos = float(
    (out_w.ravel() @ out_a.ravel())
    / (np.linalg.norm(out_w) * np.linalg.norm(out_a) + 1e-9)
)
rel = float(np.linalg.norm(out_a - out_w) / (np.linalg.norm(out_w) + 1e-9))
print(f"full-dev {steps}-step 512px: cos(w8a8, w-only) = {cos:.6f}, "
      f"rel-L2 = {rel:.4f}")
