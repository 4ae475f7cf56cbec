"""Full-depth (19+38) agreement: bf16 QK^T vs int8-MXU QK^T logits
(LOONGX_INT8_ATTN) on an identical 4-step denoise at 512 px, W8A8 linears
in both runs — final-latent cosine + relative L2."""
import os
import numpy as np
import jax, jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
from loongx_tpu.ops.quant import random_quantized_like
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.schedule import flux_sigmas
from loongx_tpu.sampling.generate import denoise_scan

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
ks = jax.random.split(key, 8)
params = random_quantized_like(
    ks[0], lambda: init_flux_params(ks[0], cfg, dtype=jnp.bfloat16)
)

# random tiny-scale weights leave the adaLN gates ~1e-3, which buries any
# attention perturbation below bf16 resolution in the residual add — set
# the modulation-linear biases to 1 (shift=1, scale=2x, gate=1) so the
# attention path carries O(1) weight like a trained model
for blk, name in (("double_blocks", "norm1"), ("double_blocks", "norm1_context"),
                  ("single_blocks", "norm")):
    lin = params[blk][name]["linear"]
    lin["bias"] = jnp.ones_like(lin["bias"])

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

os.environ["LOONGX_W8A8"] = "1"


def run():
    out = denoise_scan(
        params, cfg, (), latents, txt, pooled, img_ids, txt_ids,
        cond, img_ids, sigmas, guidance, None,
    )
    return np.asarray(out.astype(jnp.float32))


os.environ["LOONGX_INT8_ATTN"] = "0"
jax.clear_caches()
out_bf = run()
os.environ["LOONGX_INT8_ATTN"] = "1"
jax.clear_caches()
out_i8 = run()

cos = float(
    (out_bf.ravel() @ out_i8.ravel())
    / (np.linalg.norm(out_bf) * np.linalg.norm(out_i8) + 1e-9)
)
rel = float(np.linalg.norm(out_i8 - out_bf) / (np.linalg.norm(out_bf) + 1e-9))
same = bool(np.array_equal(out_bf, out_i8))
print(f"full-dev {steps}-step 512px: cos(int8-attn, bf16-attn) = {cos:.8f}, "
      f"rel-L2 = {rel:.3e}, bitwise-identical = {same}")
