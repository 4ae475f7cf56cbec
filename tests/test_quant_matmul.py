"""Quantized-matmul Pallas kernel vs XLA dequant reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    """LOONGX_W8A8 must select which quant kernel linear() invokes (the
    kernel imports happen at call time, so module-attr stubs observe it)."""
    import numpy as np

    import jax as _jax

    from loongx_tpu.models.flux import model as model_mod
    from loongx_tpu.ops import quant_matmul as qm

    calls = []

    def stub(tag):
        def f(x, w_q, scale, *a, **k):
            calls.append(tag)
            return jnp.zeros((x.shape[0], w_q.shape[1]), jnp.bfloat16)
        return f

    monkeypatch.setattr(qm, "quant_matmul_vjp", stub("w-only"))
    monkeypatch.setattr(qm, "quant_matmul_w8a8_vjp", stub("w8a8"))
    # pretend we're on TPU so linear() takes the Pallas branch
    monkeypatch.setattr(model_mod.jax, "default_backend", lambda: "tpu")

    p = {
        "kernel_q": jnp.zeros((8, 16), jnp.int8),
        "kernel_scale": jnp.ones((1, 16), jnp.float32),
    }
    x = jnp.ones((4, 8), jnp.bfloat16)

    monkeypatch.setenv("LOONGX_W8A8", "0")
    model_mod.linear(p, x)
    monkeypatch.setenv("LOONGX_W8A8", "1")
    model_mod.linear(p, x)
    assert calls == ["w-only", "w8a8"], calls


def test_w8a8_vjp_grad_matches_weight_only_backward():
    """The W8A8 custom_vjp backward equals the weight-only backward (STE)."""
    import numpy as np

    from loongx_tpu.ops.quant_matmul import quant_matmul_vjp, quant_matmul_w8a8_vjp

    rng = np.random.default_rng(2)
    m, k, n = 32, 128, 64
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(np.full((1, n), 1e-3), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    g1 = jax.grad(lambda x: jnp.sum(
        quant_matmul_vjp(x, wq, scale).astype(jnp.float32) * cot))(x)
    g2 = jax.grad(lambda x: jnp.sum(
        quant_matmul_w8a8_vjp(x, wq, scale).astype(jnp.float32) * cot))(x)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_quant_matmul_vjp_grad_matches_dequant():
    """d/dx of the Pallas int8 matmul must equal the XLA dequant reference
    (enables QLoRA: LoRA gradients flow through the frozen int8 base)."""
    import numpy as np

    from loongx_tpu.ops.quant_matmul import quant_matmul_vjp

    rng = np.random.default_rng(1)
    m, k, n = 64, 128, 96
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(
        (0.02 / np.sqrt(k) / 127.0) * np.ones((1, n)), jnp.float32
    )
    cot = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)

    def f_pallas(x):
        return jnp.sum(quant_matmul_vjp(x, wq, scale).astype(jnp.float32) * cot)

    def f_ref(x):
        w = wq.astype(jnp.float32) * scale
        return jnp.sum(
            jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            ).astype(jnp.float32) * cot
        )

    g_pallas = np.asarray(jax.grad(f_pallas)(x), np.float32)
    g_ref = np.asarray(jax.grad(f_ref)(x), np.float32)
    # both backward paths round through bf16
    np.testing.assert_allclose(g_pallas, g_ref, atol=2e-4, rtol=2e-2)


def test_quantized_lora_train_step_runs():
    """End-to-end QLoRA: train step over a quantized tiny flux with LoRA
    leaves — loss finite, LoRA factors update, base int8 untouched."""
    import numpy as np
    import optax

    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import quantize_tree
    from loongx_tpu.train.lora import add_lora
    from loongx_tpu.train.step import make_train_step, trainable_mask, partition

    pipe = LoongXPipeline.tiny(jax.random.key(0))
    flux_q = quantize_tree(pipe.params["flux"])
    flux_q = add_lora(jax.random.key(1), flux_q, r=2, dtype=jnp.float32)
    pipe.params["flux"] = flux_q
    mask = trainable_mask(pipe.params)
    trainable, frozen = partition(pipe.params, mask)
    init_fn, step_fn = make_train_step(
        pipe.flux_cfg, optax.sgd(1e-2), flags={"latent_lora": True},
        attn_backend="xla", remat=True, dtype=jnp.float32,
    )
    state = init_fn(trainable)
    batch = {
        "x0": jnp.ones((2, 16, pipe.flux_cfg.in_channels)) * 0.1,
        "prompt_embeds": jnp.ones((2, 4, pipe.flux_cfg.joint_dim)) * 0.1,
        "pooled": jnp.ones((2, pipe.flux_cfg.pooled_dim)) * 0.1,
        "img_ids": latent_image_ids(8, 8),
        "txt_ids": jnp.zeros((4, 3)),
        "cond_tokens": jnp.ones((2, 16, pipe.flux_cfg.in_channels)) * 0.1,
        "cond_ids": latent_image_ids(8, 8),
    }
    state2, metrics = jax.jit(step_fn)(state, frozen, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    delta = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(state.trainable),
                        jax.tree.leaves(state2.trainable))
    )
    assert delta > 0


def test_fused_bias_gelu_epilogue_matches_composed():
    """bias + gelu fused into the kernel store == composed XLA ops, for both
    the weight-only and W8A8 kernels."""
    from loongx_tpu.ops.quant_matmul import quant_matmul, quant_matmul_w8a8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, (96, 128)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.03, (1, 128)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)

    for qmm, tol in ((quant_matmul, 2e-2), (quant_matmul_w8a8, 5e-2)):
        base = qmm(x, w_q, scale)
        composed = jax.nn.gelu(
            base.astype(jnp.float32) + bias, approximate=True
        )
        fused = qmm(x, w_q, scale, bias=bias, activation="gelu_tanh")
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(composed, np.float32),
            atol=tol, rtol=tol,
        )


def test_quant_linear_gelu_grad_matches_composed():
    """The recompute backward of the fused gelu matmul == grad of the
    composed form (bf16 store tolerance)."""
    from loongx_tpu.ops.quant_matmul import (
        quant_linear_gelu, quant_matmul_vjp,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    w_q = jnp.asarray(rng.integers(-127, 128, (64, 128)), jnp.int8)
    # keep pre-activations O(1): bf16 kernel stores carry ~0.4% relative
    # noise, which a quadratic loss amplifies at large |z|
    scale = jnp.asarray(rng.uniform(0.001, 0.003, (1, 128)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal((1, 128)), jnp.float32)

    def loss_fused(x):
        return jnp.sum(quant_linear_gelu(x, w_q, scale, bias) ** 2)

    def loss_composed(x):
        z = quant_matmul_vjp(x, w_q, scale).astype(jnp.float32) + bias
        return jnp.sum(jax.nn.gelu(z, approximate=True) ** 2)

    g_f = jax.grad(loss_fused)(x)
    g_c = jax.grad(loss_composed)(x)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_c), atol=0.06, rtol=0.05
    )


def test_linear_gelu_falls_back_with_lora():
    """An active LoRA delta must be added pre-activation -> the fused kernel
    is skipped and the composed path runs."""
    from loongx_tpu.models.flux.model import linear_gelu
    from loongx_tpu.ops.nn import gelu_tanh

    rng = np.random.default_rng(2)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (32, 64)), jnp.int8),
        "kernel_scale": jnp.asarray(rng.uniform(0.01, 0.03, (64,)), jnp.float32),
        "bias": jnp.zeros((64,), jnp.float32),
        "lora_a": jnp.asarray(rng.standard_normal((32, 2)) * 0.1, jnp.float32),
        "lora_b": jnp.asarray(rng.standard_normal((2, 64)) * 0.1, jnp.float32),
        "lora_scale": jnp.float32(1.0),
    }
    x = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    from loongx_tpu.models.flux.model import linear

    expected = gelu_tanh(linear(p, x, use_lora=True))
    got = linear_gelu(p, x, use_lora=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# Stacked-weight kernels (scalar-prefetch block indexing under lax.scan)
# ---------------------------------------------------------------------------


def _stacked_fixture(nb=3, k=64, n=96, m=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, n)), np.int8)
    scale3 = jnp.asarray(
        rng.uniform(0.005, 0.02, (nb, 1, n)), jnp.float32
    )
    bias3 = jnp.asarray(0.1 * rng.standard_normal((nb, 1, n)), jnp.float32)
    return x, wq3, scale3, bias3


def test_stacked_matches_flat_per_block():
    """quant_matmul_stacked(blk) == flat quant_matmul on the blk-th slice,
    for every block of the stack (incl. the fused bias+gelu epilogue)."""
    from loongx_tpu.ops.quant_matmul import quant_matmul, quant_matmul_stacked

    x, wq3, scale3, bias3 = _stacked_fixture()
    for blk in range(wq3.shape[0]):
        flat = quant_matmul(x, wq3[blk], scale3[blk])
        got = quant_matmul_stacked(x, wq3, scale3, jnp.int32(blk))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(flat, np.float32),
            atol=2e-2, rtol=2e-2,
        )
        flat_g = quant_matmul(
            x, wq3[blk], scale3[blk], bias=bias3[blk], activation="gelu_tanh"
        )
        got_g = quant_matmul_stacked(
            x, wq3, scale3, jnp.int32(blk), bias3=bias3,
            activation="gelu_tanh",
        )
        np.testing.assert_allclose(
            np.asarray(got_g, np.float32), np.asarray(flat_g, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_stacked_tile_policy_covers_flux_and_text_shapes():
    """_stacked_blocks must return DIVIDING tiles for every serving shape:
    a _stacked_ok failure silently falls back to the flat kernel on a
    per-call weight-slice COPY — worse than the XLA dequant path it was
    meant to replace.  FLUX shapes are 3072 multiples; the text encoders
    (T5-XXL 4096/10240, CLIP-L 768/3072, Whisper 1280/5120) are not."""
    from loongx_tpu.ops.quant_matmul import _stacked_blocks, _stacked_ok

    shapes = [
        (3072, 3072), (3072, 9216), (3072, 15360), (15360, 3072),  # FLUX
        (3072, 12288), (12288, 3072),      # proj_out K-split halves
        (1536, 3072), (3072, 1536),        # TP-local shards
        (4096, 4096), (4096, 10240), (10240, 4096),   # T5-XXL
        (768, 768), (768, 3072), (3072, 768),         # CLIP-L
        (1280, 1280), (1280, 5120), (5120, 1280),     # Whisper large
    ]
    for k, n in shapes:
        bn, bk = _stacked_blocks(k, n)
        bn, bk = min(bn, n), min(bk, k)
        assert _stacked_ok(k, n, bn, bk), (k, n, bn, bk)
    # and the FLUX 3072-multiple tiles stay at the measured (3072, 3072)
    assert _stacked_blocks(3072, 3072) == (3072, 3072)
    assert _stacked_blocks(15360, 3072) == (3072, 3072)


def test_stacked_w8a8_matches_flat(monkeypatch):
    from loongx_tpu.ops.quant_matmul import (
        quant_matmul_stacked, quant_matmul_w8a8,
    )

    monkeypatch.setenv("LOONGX_W8A8", "1")
    x, wq3, scale3, _ = _stacked_fixture(seed=3)
    blk = 1
    # same k-tile grouping as the stacked policy at this shape, so the
    # dynamic activation scales (and hence the int8 rounding) are identical
    flat = quant_matmul_w8a8(
        x, wq3[blk], scale3[blk], block_n=96, block_k=64
    )
    got = quant_matmul_stacked(x, wq3, scale3, jnp.int32(blk))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(flat, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_stacked_vjp_grad_matches_flat():
    """d/dx of the stacked matmul == d/dx of the flat vjp on the same slice
    (QLoRA under the stacked block scan)."""
    from loongx_tpu.ops.quant_matmul import (
        quant_matmul_stacked_vjp, quant_matmul_vjp,
    )

    x, wq3, scale3, _ = _stacked_fixture(seed=1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((x.shape[0], wq3.shape[2])),
        jnp.float32,
    )
    blk = 2
    g_st = jax.grad(lambda x: jnp.sum(
        quant_matmul_stacked_vjp(x, wq3, scale3, jnp.int32(blk)).astype(
            jnp.float32
        ) * cot
    ))(x)
    g_fl = jax.grad(lambda x: jnp.sum(
        quant_matmul_vjp(x, wq3[blk], scale3[blk]).astype(jnp.float32) * cot
    ))(x)
    np.testing.assert_allclose(
        np.asarray(g_st), np.asarray(g_fl), atol=2e-4, rtol=2e-2
    )


def test_stacked_gelu_grad_matches_composed():
    from loongx_tpu.ops.quant_matmul import (
        quant_linear_gelu_stacked, quant_matmul_stacked_vjp,
    )

    x, wq3, _, bias3 = _stacked_fixture(seed=2)
    # keep pre-activations O(1): bf16 stores carry ~0.4% relative noise,
    # which the quadratic loss amplifies at large |z| (same bound as the
    # flat quant_linear_gelu grad test)
    scale3 = jnp.asarray(
        np.random.default_rng(2).uniform(0.001, 0.003, wq3.shape[:1] + (1, wq3.shape[2])),
        jnp.float32,
    )
    bias3 = bias3 * 0.1
    blk = jnp.int32(0)

    def loss_fused(x):
        return jnp.sum(
            quant_linear_gelu_stacked(x, wq3, scale3, bias3, blk) ** 2
        )

    def loss_composed(x):
        z = quant_matmul_stacked_vjp(x, wq3, scale3, blk).astype(
            jnp.float32
        ) + bias3[0]
        return jnp.sum(jax.nn.gelu(z, approximate=True) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(x)),
        np.asarray(jax.grad(loss_composed)(x)),
        atol=0.06, rtol=0.05,
    )


def test_stacked_flux_forward_matches_sliced(monkeypatch):
    """Full quantized tiny-flux forward: the stacked block scan
    (LOONGX_STACKED_QMM=1, interpret-mode Pallas) must reproduce the
    plain sliced scan (LOONGX_STACKED_QMM=0, XLA dequant)."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import quantize_tree

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = quantize_tree(params["double_blocks"])
    params["single_blocks"] = quantize_tree(params["single_blocks"])

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(1), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),  # (8/2)*(8/2) = 16 packed tokens
        txt_ids=jnp.zeros((s_txt, 3)),
    )

    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    ref = flux_forward(params, cfg, **kwargs)
    monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
    got = flux_forward(params, cfg, **kwargs)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_fused_qkv_matches_unfused(monkeypatch):
    """fuse_qkv_projections must be exact: the fused tiny-flux forward
    reproduces the unfused one bit-for-bit on the XLA dequant path, and
    through the stacked Pallas path within kernel rounding."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = quantize_tree(params["double_blocks"])
    params["single_blocks"] = quantize_tree(params["single_blocks"])
    fused = dict(params)
    fused["double_blocks"] = fuse_qkv_projections(params["double_blocks"])
    fused["single_blocks"] = fuse_qkv_projections(params["single_blocks"])
    # the transform actually fused (q/k/v gone, qkv present)
    assert "to_qkv" in fused["double_blocks"]["attn"]
    assert "add_qkv_proj" in fused["double_blocks"]["attn"]
    assert "to_q" not in fused["double_blocks"]["attn"]
    assert "to_qkv" in fused["single_blocks"]["attn"]

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(1), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
    )
    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    ref = flux_forward(params, cfg, **kwargs)
    got = flux_forward(fused, cfg, **kwargs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
    got_st = flux_forward(fused, cfg, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got_st, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_stacked_fused_elementwise_with_cond_matches_sliced(monkeypatch):
    """The fused LN+adaLN prologue / gate+residual epilogue paths (stacked
    serving, B=1, WITH a condition stream so the row-segment boundary logic
    is exercised) must reproduce the plain sliced scan."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = quantize_tree(params["double_blocks"])
    params["single_blocks"] = quantize_tree(params["single_blocks"])
    params["double_blocks"] = fuse_qkv_projections(params["double_blocks"])
    params["single_blocks"] = fuse_qkv_projections(params["single_blocks"])

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(1), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
        cond=jax.random.normal(jax.random.key(4), (b, s_img, cfg.in_channels)),
        cond_ids=latent_image_ids(8, 8),
    )
    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    ref = flux_forward(params, cfg, **kwargs)
    monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
    # fused-elementwise knobs default OFF (measured MXU stall at full-dev,
    # benchmarks/fused_ew_ab.py) — force ON so the kernel paths stay covered
    monkeypatch.setenv("LOONGX_FUSE_LN", "1")
    monkeypatch.setenv("LOONGX_FUSE_GATE", "1")
    got = flux_forward(params, cfg, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
    # batch 2 must still work (fused elementwise auto-disables; segment
    # semantics preserved by the XLA fallback)
    kwargs2 = {
        k: (jnp.concatenate([v, v]) if k in
            ("img", "txt", "pooled", "timestep", "guidance", "cond") else v)
        for k, v in kwargs.items()
    }
    got2 = flux_forward(params, cfg, **kwargs2)
    np.testing.assert_allclose(
        np.asarray(got2[0], np.float32), np.asarray(got[0], np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_fused_qkv_skips_lora_projections():
    """A LoRA delta on any q/k/v projection must leave that triple unfused
    (adapters address the projections individually)."""
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree
    from loongx_tpu.train.lora import add_lora

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    blocks = quantize_tree(params["double_blocks"])
    blocks = add_lora(
        jax.random.key(1), blocks, r=2, dtype=jnp.float32,
        targets=(r"attn/to_(q|k|v)$",),
    )
    fused = fuse_qkv_projections(blocks)
    assert "to_qkv" not in fused["attn"]          # LoRA present -> untouched
    assert "to_q" in fused["attn"]
    assert "add_qkv_proj" in fused["attn"]        # context projs still fuse


def test_fused_qkv_consume_mutates_in_place():
    """consume=True must fuse the SAME tree object (incremental source
    dropping for the 12B serving path) and produce identical arrays to the
    pure walk."""
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree

    cfg = FluxConfig.tiny()
    blocks = quantize_tree(
        init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)[
            "double_blocks"
        ]
    )
    pure = fuse_qkv_projections(blocks)
    consumed = fuse_qkv_projections(blocks, consume=True)
    assert consumed is blocks and "to_q" not in blocks["attn"]
    np.testing.assert_array_equal(
        np.asarray(pure["attn"]["to_qkv"]["kernel_q"]),
        np.asarray(consumed["attn"]["to_qkv"]["kernel_q"]),
    )


def test_quant_qkv_stacked_kernel_matches_composed(monkeypatch):
    """The fused qkv kernel == matmul + split + per-head RMS composed, for
    both serving modes."""
    from loongx_tpu.ops.nn import rms_norm
    from loongx_tpu.ops.quant_matmul import quant_qkv_stacked

    rng = np.random.default_rng(0)
    nb, k, h, hd, m = 2, 64, 64, 32, 16
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, 3 * h)), np.int8)
    scale3 = jnp.asarray(rng.uniform(0.005, 0.02, (nb, 1, 3 * h)), jnp.float32)
    bias3 = jnp.asarray(0.1 * rng.standard_normal((nb, 1, 3 * h)), jnp.float32)
    wq_n = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
    wk_n = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
    norm_w = jnp.stack([
        jnp.tile(wq_n, h // hd), jnp.tile(wk_n, h // hd),
        jnp.ones((h,), jnp.float32),
    ])

    for w8a8 in (False, True):
        monkeypatch.setenv("LOONGX_W8A8", "1" if w8a8 else "0")
        blk = 1
        q, kk, v = quant_qkv_stacked(
            x, wq3, scale3, bias3, norm_w, jnp.int32(blk), hd
        )
        z = (
            np.asarray(x, np.float32)
            @ (np.asarray(wq3[blk], np.float32) * np.asarray(scale3[blk]))
            + np.asarray(bias3[blk])
        )
        zq, zk, zv = np.split(z, 3, axis=-1)

        def per_head_rms(t, w):
            t4 = jnp.asarray(t).reshape(m, h // hd, hd)
            return np.asarray(rms_norm(t4, w)).reshape(m, h)

        # W8A8 carries additive activation-quant noise (~sqrt(K)·absmax/254
        # per output element) that dominates near-zero outputs — bound the
        # worst element absolutely and the distribution by relative RMS.
        tol = dict(atol=0.25, rtol=8e-2) if w8a8 else dict(atol=3e-2, rtol=3e-2)
        for got, ref in (
            (q, per_head_rms(zq, wq_n)),
            (kk, per_head_rms(zk, wk_n)),
            (v, zv),
        ):
            g = np.asarray(got, np.float32)
            np.testing.assert_allclose(g, ref, **tol)
            rel_rms = np.sqrt(np.mean(((g - ref) / (np.abs(ref) + 1)) ** 2))
            assert rel_rms < 2e-2, (w8a8, rel_rms)


def test_add_lora_refuses_fused_tree():
    """add_lora on a qkv-fused tree must hard-fail (its q/k/v targets no
    longer exist; silently skipping them would train the wrong adapters)."""
    import pytest

    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree
    from loongx_tpu.train.lora import add_lora

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = fuse_qkv_projections(
        quantize_tree(params["double_blocks"])
    )
    with pytest.raises(ValueError, match="fuse_qkv=False"):
        add_lora(jax.random.key(1), params, r=2)


def test_tp_sharding_refuses_fused_tree():
    """param_sharding_rules under a real tensor axis must reject a
    qkv-fused tree (the TP rules shard the unfused projection axes;
    silently replicating the fused stacks would defeat the memory split)."""
    import pytest

    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree
    from loongx_tpu.parallel.mesh import make_mesh, param_sharding_rules

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = fuse_qkv_projections(
        quantize_tree(params["double_blocks"])
    )
    mesh = make_mesh(tensor=2)
    with pytest.raises(ValueError, match="fuse_qkv=False"):
        param_sharding_rules(params, mesh)
    # unfused trees still shard fine
    clean = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    param_sharding_rules(clean, mesh)


def test_qkv_stacked_fallback_for_odd_shapes():
    """K not divisible by the stacked k-tile must route to the flat-kernel
    fallback and still produce correct normed q/k/v."""
    from loongx_tpu.ops.nn import rms_norm
    from loongx_tpu.ops.quant_matmul import quant_qkv_stacked

    rng = np.random.default_rng(5)
    nb, k, h, hd, m = 2, 1664, 64, 32, 8  # 1664 % 1536 != 0 -> fallback
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.float32)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, 3 * h)), np.int8)
    scale3 = jnp.asarray(
        np.full((nb, 1, 3 * h), 1e-3), jnp.float32
    )
    bias3 = jnp.zeros((nb, 1, 3 * h), jnp.float32)
    norm_w = jnp.ones((3, h), jnp.float32)
    q, kk, v = quant_qkv_stacked(
        x, wq3, scale3, bias3, norm_w, jnp.int32(0), hd
    )
    z = np.asarray(x) @ (np.asarray(wq3[0], np.float32) * np.asarray(scale3[0]))
    zq, zk, zv = np.split(z, 3, axis=-1)
    ref_q = np.asarray(
        rms_norm(jnp.asarray(zq).reshape(m, h // hd, hd))
    ).reshape(m, h)
    np.testing.assert_allclose(
        np.asarray(q, np.float32), ref_q, atol=5e-2, rtol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(v, np.float32), zv, atol=5e-2, rtol=5e-2
    )


def test_split_proj_out_matches_fused(monkeypatch):
    """split_single_proj_out must be exact: the split tiny-flux forward
    (two K-partial proj_out matmuls through the gated residual, no
    [S, h+mlp] concat) reproduces the unsplit forward on both the XLA
    dequant path and the stacked Pallas path, with and without a cond
    stream."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import quantize_tree, split_single_proj_out

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = quantize_tree(params["double_blocks"])
    params["single_blocks"] = quantize_tree(params["single_blocks"])
    split = split_single_proj_out(params, cfg.hidden)
    assert "proj_out_mlp" in split["single_blocks"]
    assert (
        split["single_blocks"]["proj_out"]["kernel_q"].shape[1] == cfg.hidden
    )

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(1), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
    )
    cond_kwargs = dict(
        kwargs,
        cond=jax.random.normal(jax.random.key(4), (b, s_img, cfg.in_channels)),
        cond_ids=latent_image_ids(8, 8),
    )

    for kw in (kwargs, cond_kwargs):
        monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
        ref = flux_forward(params, cfg, **kw)
        got = flux_forward(split, cfg, **kw)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=1e-5, rtol=1e-5,
        )
        monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
        got_stacked = flux_forward(split, cfg, **kw)
        np.testing.assert_allclose(
            np.asarray(got_stacked, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_split_proj_out_lora_routing(monkeypatch):
    """A LoRA trained against the FUSED single-block proj_out must load onto
    a split serving tree (ops/quant.split_single_proj_out) with its factor
    rows routed across the two parts, reproducing the unsplit forward
    exactly (regression: infer.py --int8 --lora attaches AFTER quantize's
    split, which used to break shape alignment)."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import quantize_tree, split_single_proj_out
    from loongx_tpu.train.lora import (
        add_lora, load_lora_state_dict, lora_state_dict,
    )

    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    cfg = FluxConfig.tiny()
    base = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    base["double_blocks"] = quantize_tree(base["double_blocks"])
    base["single_blocks"] = quantize_tree(base["single_blocks"])

    # LoRA against the fused layout, with non-zero B so the delta matters
    with_lora = add_lora(jax.random.key(1), base, r=2, dtype=jnp.float32)
    p = with_lora["single_blocks"]["proj_out"]
    p["lora_b"] = jax.random.normal(jax.random.key(2), p["lora_b"].shape) * 0.1
    state = lora_state_dict(with_lora)
    assert any(k.startswith("single_blocks/proj_out/") for k in state)

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(3), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(4), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(5), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
        cond=jax.random.normal(jax.random.key(6), (b, s_img, cfg.in_channels)),
        cond_ids=latent_image_ids(8, 8),
        flags={"latent_lora": True},
    )
    ref = flux_forward(with_lora, cfg, **kwargs)

    split = split_single_proj_out(base, cfg.hidden)
    routed = load_lora_state_dict(split, state)
    sgl = routed["single_blocks"]
    assert sgl["proj_out"]["lora_a"].shape[-2] == cfg.hidden
    assert (
        sgl["proj_out"]["lora_a"].shape[-2]
        + sgl["proj_out_mlp"]["lora_a"].shape[-2]
        == p["lora_a"].shape[-2]
    )
    got = flux_forward(routed, cfg, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-5, rtol=1e-5,
    )

    # round trip back into a fused tree
    refused = load_lora_state_dict(
        jax.tree.map(lambda x: x, base), lora_state_dict(routed)
    )
    np.testing.assert_allclose(
        np.asarray(refused["single_blocks"]["proj_out"]["lora_a"]),
        np.asarray(p["lora_a"]), atol=0, rtol=0,
    )

    # wrong-layout factor without a split target raises a clear error
    bad = {"single_blocks/proj_mlp/lora_a": np.zeros(
        (cfg.num_single_blocks, 7, 2), np.float32)}
    with pytest.raises(ValueError, match="does not match the kernel"):
        load_lora_state_dict(jax.tree.map(lambda x: x, base), bad)


def test_add_lora_refuses_split_tree():
    from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
    from loongx_tpu.ops.quant import quantize_tree, split_single_proj_out
    from loongx_tpu.train.lora import add_lora

    cfg = FluxConfig.tiny()
    base = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    base["single_blocks"] = quantize_tree(base["single_blocks"])
    split = split_single_proj_out(base, cfg.hidden)
    with pytest.raises(ValueError, match="proj_out_mlp"):
        add_lora(jax.random.key(1), split, r=2)


def test_vjp_cotangent_dtypes_match_fp32_primals():
    """Every quant custom_vjp must return cotangents in the PRIMAL dtype:
    JAX's tolerance for inexact-dtype mismatches in bwd rules is a
    deprecated exception (jax custom_derivatives _temporary_dtype_exception)
    slated for removal — fp32 activations through the bf16-output transposed
    kernels would then raise at every QLoRA step."""
    import numpy as np

    from loongx_tpu.ops.quant_matmul import (
        quant_gate_res_linear_stacked,
        quant_linear_gelu,
        quant_linear_gelu_stacked,
        quant_ln_mod_linear_stacked,
        quant_matmul_stacked_vjp,
        quant_matmul_vjp,
        quant_matmul_w8a8_vjp,
    )

    rng = np.random.default_rng(7)
    m, k, n, nb = 16, 128, 128, 2
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(np.full((1, n), 1e-3), jnp.float32)
    bias = jnp.zeros((1, n), jnp.float32)
    wq3 = jnp.asarray(rng.integers(-127, 128, (nb, k, n)), jnp.int8)
    scale3 = jnp.asarray(np.full((nb, 1, n), 1e-3), jnp.float32)
    bias3 = jnp.zeros((nb, 1, n), jnp.float32)
    ab = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    gate = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
    resid = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    blk = jnp.asarray(0, jnp.int32)

    def gsum(f, *args, argnums=0):
        return jax.grad(
            lambda *a: jnp.sum(f(*a).astype(jnp.float32)), argnums=argnums
        )(*args)

    assert gsum(quant_matmul_vjp, x, wq, scale).dtype == jnp.float32
    assert gsum(quant_matmul_w8a8_vjp, x, wq, scale).dtype == jnp.float32
    assert gsum(
        lambda x: quant_matmul_stacked_vjp(x, wq3, scale3, blk), x
    ).dtype == jnp.float32
    assert gsum(
        lambda x: quant_linear_gelu_stacked(x, wq3, scale3, bias3, blk), x
    ).dtype == jnp.float32
    assert gsum(
        lambda x: quant_linear_gelu(x, wq, scale, bias), x
    ).dtype == jnp.float32
    assert gsum(
        lambda x: quant_ln_mod_linear_stacked(
            0, None, x, wq3, scale3, bias3, ab, blk
        ), x,
    ).dtype == jnp.float32
    dx, dresid = gsum(
        lambda x, r: quant_gate_res_linear_stacked(
            0, x, wq3, scale3, bias3, r, gate, blk
        ), x, resid, argnums=(0, 1),
    )
    assert dx.dtype == jnp.float32 and dresid.dtype == jnp.float32


def test_tp_layout_fused_qkv_flat_fallback(monkeypatch):
    """A TP-layout fused tree ([NB, K, 3, H] stacks) must still produce the
    unfused forward when the stacked scan is disabled (LOONGX_STACKED_QMM=0):
    the scan slices the stack to [K, 3, H], which the flat `linear` fallback
    flattens to [K, 3H] (regression: jnp.dot contracted K against the size-3
    axis and crashed)."""
    from loongx_tpu.models.flux.model import (
        FluxConfig, flux_forward, init_flux_params,
    )
    from loongx_tpu.ops.latents import latent_image_ids
    from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["double_blocks"] = quantize_tree(params["double_blocks"])
    params["single_blocks"] = quantize_tree(params["single_blocks"])
    fused = dict(params)
    fused["double_blocks"] = fuse_qkv_projections(
        params["double_blocks"], tp_layout=True
    )
    fused["single_blocks"] = fuse_qkv_projections(
        params["single_blocks"], tp_layout=True
    )
    assert fused["double_blocks"]["attn"]["to_qkv"]["kernel_q"].ndim == 4

    b, s_img, s_txt = 1, 16, 4
    kwargs = dict(
        img=jax.random.normal(jax.random.key(1), (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(jax.random.key(2), (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim)),
        timestep=jnp.full((b,), 0.5),
        guidance=jnp.full((b,), 3.5),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
    )
    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    ref = flux_forward(params, cfg, **kwargs)
    got = flux_forward(fused, cfg, **kwargs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
