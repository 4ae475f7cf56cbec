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


def test_w8a8_matches_fp32_reference():
    """Dynamic-activation int8 matmul: group-wise act scales keep the error
    within combined int8 quantization noise of the fp32 product."""
    import numpy as np

    from loongx_tpu.ops.quant_matmul import quant_matmul_w8a8

    rng = np.random.default_rng(0)
    m, k, n = 96, 256, 160
    x = rng.standard_normal((m, k)).astype(np.float32)
    wq = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = (0.02 / np.sqrt(k) / 127.0) * np.ones((1, n), np.float32)

    ref = x @ (wq.astype(np.float32) * scale)
    out = np.asarray(
        quant_matmul_w8a8(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(scale),
            block_m=64, block_n=128, block_k=128,
        ),
        np.float32,
    )
    denom = np.maximum(np.abs(ref), np.abs(ref).mean())
    rel = np.abs(out - ref) / denom
    # element-wise worst case bounded by combined int8(act)+int8(w)+bf16(out)
    # rounding; RMS is the meaningful quality signal
    assert rel.max() < 5e-2, rel.max()
    rms = np.sqrt(np.mean(rel ** 2))
    assert rms < 1e-2, rms  # ~0.7% combined W8A8 noise at K=256
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999, corr


def test_w8a8_knob_routes_linear(monkeypatch):
    """LOONGX_W8A8=1 must route int8 linears through the W8A8 kernel."""
    import numpy as np

    from loongx_tpu.models.flux.model import linear
    from loongx_tpu.ops import quant_matmul as qm

    monkeypatch.setenv("LOONGX_W8A8", "1")
    assert qm.use_w8a8()
    monkeypatch.setenv("LOONGX_W8A8", "0")
    assert not qm.use_w8a8()
