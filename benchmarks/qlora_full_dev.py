"""QLoRA on the REAL FLUX.1-dev scale: LoRA train step over the 19+38 int8
backbone at 512 px on one ~14 GiB chip (the reference needs 80 GB GPUs).

AdamW (default) reaches 0.99 steps/s; pass --prodigy for the reference's
default optimizer (0.14 steps/s at this scale — its extra fp32 state tips
the 12B working set over a memory cliff; see PARITY.md)."""
import sys
import time
import numpy as np
import jax, jax.numpy as jnp
import optax

from loongx_tpu.models.flux.model import FluxConfig
from loongx_tpu.ops.quant import random_quantized_like
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.train.lora import add_lora
from loongx_tpu.train.optim import prodigy
from loongx_tpu.train.step import make_train_step, trainable_mask, partition
from loongx_tpu.models.flux.model import init_flux_params

cfg = FluxConfig.flux_dev()
key = jax.random.key(0)
t0 = time.time()
flux_q = random_quantized_like(key, lambda: init_flux_params(key, cfg, dtype=jnp.bfloat16))
flux_q = add_lora(jax.random.key(1), flux_q, r=4, dtype=jnp.bfloat16)
print(f"tree+lora built in {time.time()-t0:.0f}s", flush=True)

params = {"flux": flux_q}
mask = trainable_mask(params)
trainable, frozen = partition(params, mask)
n_lora = sum(x.size for x in jax.tree.leaves(trainable))
print(f"lora params: {n_lora/1e6:.1f}M", flush=True)

opt = (
    prodigy(learning_rate=0.1, weight_decay=0.01, use_bias_correction=True,
            safeguard_warmup=True)
    if "--prodigy" in sys.argv
    else __import__("optax").adamw(1e-4)
)
init_fn, step_fn = make_train_step(
    cfg,
    opt,
    flags={"latent_lora": False},
    attn_backend="pallas",
    remat=True,
    dtype=jnp.bfloat16,
)
state = init_fn(trainable)

b, s_txt, size = 1, 512, 512
s_img = (size // 16) ** 2
ks = jax.random.split(jax.random.key(2), 6)
batch = {
    "x0": jax.random.normal(ks[0], (b, s_img, cfg.in_channels)),
    "prompt_embeds": jax.random.normal(ks[1], (b, s_txt, cfg.joint_dim)),
    "pooled": jax.random.normal(ks[2], (b, cfg.pooled_dim)),
    "img_ids": latent_image_ids(size // 8, size // 8),
    "txt_ids": jnp.zeros((s_txt, 3)),
    "cond_tokens": jax.random.normal(ks[3], (b, s_img, cfg.in_channels)),
    "cond_ids": latent_image_ids(size // 8, size // 8),
}

step_jit = jax.jit(step_fn, donate_argnums=(0,))
t0 = time.time()
state, metrics = step_jit(state, frozen, batch, jax.random.key(3))
loss0 = float(metrics["loss"])
print(f"step 1 (compile): {time.time()-t0:.0f}s loss={loss0:.4f} "
      f"grad={float(metrics['grad_norm']):.3e}", flush=True)
t0 = time.time()
n = 5
for i in range(n):
    state, metrics = step_jit(state, frozen, batch, jax.random.fold_in(key, i))
loss = float(metrics["loss"])  # forces execution
dt = (time.time() - t0) / n
print(f"steady: {dt:.2f} s/step = {1/dt:.3f} steps/s, loss={loss:.4f}")
