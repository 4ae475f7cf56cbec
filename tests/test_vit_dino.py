"""Generic ViT (DINO) tower + conversion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.models.vision import (
    ViTConfig, init_vit_params, vit_encode, vit_preprocess,
)
from loongx_tpu.utils.convert import convert_vit_state


def test_shapes_and_finite():
    cfg = ViTConfig.tiny()
    params = init_vit_params(jax.random.key(0), cfg)
    imgs = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    feats = vit_encode(params, cfg, imgs)
    assert feats.shape == (2, cfg.hidden)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_preprocess_imagenet_norm():
    imgs = jnp.ones((1, 8, 8, 3)) * 0.5
    out = vit_preprocess(imgs, size=16)
    assert out.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(
        float(out[0, 0, 0, 0]), (0.5 - 0.485) / 0.229, atol=1e-5
    )


def test_convert_hf_vit_layout():
    """Round-trip through a synthetic HF ViTModel state dict."""
    cfg = ViTConfig.tiny()
    rng = np.random.RandomState(0)
    h, ff, p = cfg.hidden, cfg.d_ff, cfg.patch_size
    state = {
        "embeddings.cls_token": rng.randn(1, 1, h).astype(np.float32),
        "embeddings.position_embeddings": rng.randn(
            1, cfg.num_patches + 1, h
        ).astype(np.float32),
        "embeddings.patch_embeddings.projection.weight": rng.randn(
            h, 3, p, p
        ).astype(np.float32),
        "embeddings.patch_embeddings.projection.bias": rng.randn(h).astype(
            np.float32
        ),
        "layernorm.weight": np.ones(h, np.float32),
        "layernorm.bias": np.zeros(h, np.float32),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        for name, shape in {
            "attention.attention.query": (h, h),
            "attention.attention.key": (h, h),
            "attention.attention.value": (h, h),
            "attention.output.dense": (h, h),
            "intermediate.dense": (ff, h),
            "output.dense": (h, ff),
        }.items():
            state[f"{pre}.{name}.weight"] = rng.randn(*shape).astype(np.float32) * 0.05
            state[f"{pre}.{name}.bias"] = rng.randn(shape[0]).astype(np.float32) * 0.01
        for ln in ("layernorm_before", "layernorm_after"):
            state[f"{pre}.{ln}.weight"] = np.ones(h, np.float32)
            state[f"{pre}.{ln}.bias"] = np.zeros(h, np.float32)

    params = convert_vit_state(state, cfg)
    imgs = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    feats = vit_encode(params, cfg, imgs)
    assert feats.shape == (1, h)
    assert np.all(np.isfinite(np.asarray(feats)))
    # converted CLS token made it through
    np.testing.assert_allclose(
        np.asarray(params["cls_token"]),
        state["embeddings.cls_token"].reshape(-1), atol=1e-6,
    )


def test_dino_backend_identity_pairs(tmp_path):
    from PIL import Image

    from loongx_tpu.evaluation import evaluate_directory
    from loongx_tpu.evaluation.jax_backend import make_jax_dino_backend

    rng = np.random.RandomState(0)
    for i in range(2):
        base = rng.randint(0, 255, (16, 16, 3), np.uint8)
        Image.fromarray(base).save(tmp_path / f"d{i}_0.png")
        Image.fromarray(base).save(tmp_path / f"d{i}_1.png")
    cfg = ViTConfig.tiny()
    params = init_vit_params(jax.random.key(0), cfg)
    dino_fn = make_jax_dino_backend(params, cfg)
    results = evaluate_directory(
        str(tmp_path), dino_image_embed=dino_fn, image_size=16
    )
    np.testing.assert_allclose(results["dino_i"], 1.0, atol=1e-5)
