"""Quantized-matmul Pallas kernel vs XLA dequant reference."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.quant import quantize_linear
from loongx_tpu.ops.quant_matmul import quant_matmul, quant_linear_apply


def test_matches_dequant_reference():
    key = jax.random.key(0)
    x = jax.random.normal(key, (64, 128), jnp.float32)
    kernel = jax.random.normal(jax.random.key(1), (128, 256)) * 0.05
    q = quantize_linear({"kernel": kernel})
    ref = x @ (q["kernel_q"].astype(jnp.float32) * q["kernel_scale"])
    got = quant_matmul(
        x, q["kernel_q"], q["kernel_scale"].reshape(1, -1),
        block_m=64, block_n=128, block_k=128,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


def test_padding_shapes():
    x = jax.random.normal(jax.random.key(0), (33, 100), jnp.float32)
    kernel = jax.random.normal(jax.random.key(1), (100, 70)) * 0.05
    q = quantize_linear({"kernel": kernel})
    got = quant_matmul(
        x, q["kernel_q"], q["kernel_scale"].reshape(1, -1),
        block_m=128, block_n=128, block_k=128,
    )
    assert got.shape == (33, 70)
    ref = x @ (q["kernel_q"].astype(jnp.float32) * q["kernel_scale"])
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=5e-2, rtol=5e-2
    )


def test_linear_apply_with_bias():
    x = jax.random.normal(jax.random.key(0), (2, 16, 64), jnp.bfloat16)
    kernel = jax.random.normal(jax.random.key(1), (64, 32)) * 0.05
    q = quantize_linear({"kernel": kernel, "bias": jnp.ones(32)})
    y = quant_linear_apply(q, x)
    assert y.shape == (2, 16, 32)
    ref = (
        x.astype(jnp.float32)
        @ (q["kernel_q"].astype(jnp.float32) * q["kernel_scale"])
        + 1.0
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), atol=0.1, rtol=0.1
    )
