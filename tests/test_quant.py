"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.models.flux import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.ops.quant import (
    quantize_linear, quantize_tree, dequant_kernel, quantized_bytes,
)


def test_quantize_roundtrip_error_small():
    key = jax.random.key(0)
    kernel = jax.random.normal(key, (64, 128)) * 0.02
    p = {"kernel": kernel, "bias": jnp.zeros(128)}
    q = quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    deq = dequant_kernel(q, jnp.float32)
    rel = float(
        jnp.linalg.norm(deq - kernel) / jnp.linalg.norm(kernel)
    )
    assert rel < 0.006  # per-channel int8: <0.6% relative error


def test_quantize_tree_halves_memory():
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    before = quantized_bytes(params)
    qparams = quantize_tree(params)
    after = quantized_bytes(qparams)
    assert after < 0.65 * before  # int8 + fp32 scales vs bf16


def test_quantized_forward_close():
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    qparams = quantize_tree(params)
    batch = dict(
        img=jax.random.normal(jax.random.key(1), (1, 16, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (1, 4, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        guidance=jnp.array([3.5]),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((4, 3)),
    )
    out = np.asarray(flux_forward(params, cfg, **batch, attn_backend="xla"))
    out_q = np.asarray(flux_forward(qparams, cfg, **batch, attn_backend="xla"))
    # relative error small vs output scale
    rel = np.linalg.norm(out_q - out) / np.linalg.norm(out)
    assert rel < 0.05, rel


def test_zero_kernel_safe():
    p = {"kernel": jnp.zeros((8, 16))}
    q = quantize_linear(p)
    np.testing.assert_array_equal(np.asarray(dequant_kernel(q)), 0.0)
