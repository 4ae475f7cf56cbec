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


def test_quantized_text_encoders_close():
    """T5/CLIP serve from int8 weights (qdot path): outputs stay within
    quantization noise of the bf16 towers."""
    import numpy as np

    from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode
    from loongx_tpu.models.text.clip import (
        CLIPTextConfig, init_clip_params, clip_encode,
    )
    from loongx_tpu.ops.quant import quantize_tree

    t5_cfg = T5Config.tiny()
    t5 = init_t5_params(jax.random.key(0), t5_cfg, jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (2, 12), 0, t5_cfg.vocab_size)
    ref = np.asarray(t5_encode(t5, t5_cfg, ids))
    out = np.asarray(t5_encode(quantize_tree(t5), t5_cfg, ids))
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel

    c_cfg = CLIPTextConfig.tiny()
    clip = init_clip_params(jax.random.key(2), c_cfg, jnp.float32)
    cids = jax.random.randint(jax.random.key(3), (2, c_cfg.max_positions),
                              0, c_cfg.vocab_size)
    h_ref, p_ref = clip_encode(clip, c_cfg, cids)
    h_q, p_q = clip_encode(quantize_tree(clip), c_cfg, cids)
    rel = float(jnp.linalg.norm(h_q - h_ref) / (jnp.linalg.norm(h_ref) + 1e-9))
    assert rel < 0.05, rel


def test_t5_stacked_serving_matches_qdot_path():
    """Quantized T5's stacked Pallas scan (the serving default) agrees with
    the per-slice XLA dequant path: same int8 weights, the only deltas are
    the kernel's bf16 operand cast and the fp32 epilogue gelu."""
    import numpy as np

    from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode
    from loongx_tpu.ops.quant import quantize_tree

    cfg = T5Config.tiny()
    qparams = quantize_tree(init_t5_params(jax.random.key(0), cfg, jnp.float32))
    ids = jax.random.randint(jax.random.key(1), (2, 12), 0, cfg.vocab_size)
    mask = (ids % 7 != 0).astype(jnp.int32)
    stacked = np.asarray(
        t5_encode(qparams, cfg, ids, mask, stacked_kernels=True)
    )
    xla = np.asarray(
        t5_encode(qparams, cfg, ids, mask, stacked_kernels=False)
    )
    rel = np.linalg.norm(stacked - xla) / (np.linalg.norm(xla) + 1e-9)
    assert rel < 2e-2, rel


def test_pipeline_quantize_and_free_text_encoders():
    from loongx_tpu.models.pipeline import LoongXPipeline

    pipe = LoongXPipeline.tiny(jax.random.key(0)).quantize()
    # DiT + text towers now carry int8 leaves
    for name in ("flux", "t5", "clip"):
        leaves = jax.tree_util.tree_leaves_with_path(pipe.params[name])
        assert any("kernel_q" in str(p) for p, _ in leaves), name
    # staged serving: drop text encoders, memory shrinks, encode_text raises
    pipe.free_text_encoders()
    assert "t5" not in pipe.params and "clip" not in pipe.params
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        pipe.encode_text(["x"])
