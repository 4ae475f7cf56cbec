"""CLIP vision tower + in-framework eval backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.models.text.clip import (
    CLIPTextConfig, init_clip_params, clip_text_features,
)
from loongx_tpu.models.text.clip_vision import (
    CLIPVisionConfig, init_clip_vision_params, clip_vision_encode,
    clip_preprocess, _patches,
)
from loongx_tpu.ops.nn import init_linear


class TestVisionTower:
    def test_shapes(self):
        cfg = CLIPVisionConfig.tiny()
        params = init_clip_vision_params(jax.random.key(0), cfg)
        imgs = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
        feats = clip_vision_encode(params, cfg, imgs)
        assert feats.shape == (2, cfg.projection_dim)
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_patches_matches_conv(self):
        """Flattened-patch linear == stride-p conv (torch cross-check)."""
        torch = pytest.importorskip("torch")
        p, c, hid = 4, 3, 6
        rng = np.random.RandomState(0)
        img = rng.randn(1, 8, 8, c).astype(np.float32)
        w = rng.randn(hid, c, p, p).astype(np.float32)
        conv = torch.nn.functional.conv2d(
            torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(w), stride=p
        )  # [1, hid, 2, 2]
        expected = conv.permute(0, 2, 3, 1).reshape(1, 4, hid).numpy()
        kernel = np.transpose(w, (2, 3, 1, 0)).reshape(-1, hid)
        got = np.asarray(
            jnp.dot(_patches(jnp.asarray(img), p), jnp.asarray(kernel))
        )
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_preprocess_resize_and_normalise(self):
        imgs = jnp.ones((1, 8, 8, 3)) * 0.5
        out = clip_preprocess(imgs, size=16)
        assert out.shape == (1, 16, 16, 3)
        # 0.5 normalised by CLIP mean/std
        expected = (0.5 - 0.48145466) / 0.26862954
        np.testing.assert_allclose(float(out[0, 0, 0, 0]), expected, atol=1e-5)

    def test_image_sensitivity(self):
        cfg = CLIPVisionConfig.tiny()
        params = init_clip_vision_params(jax.random.key(0), cfg)
        a = clip_vision_encode(params, cfg, jnp.zeros((1, 16, 16, 3)))
        b = clip_vision_encode(params, cfg, jnp.ones((1, 16, 16, 3)))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestTextFeatures:
    def test_projection_head(self):
        cfg = CLIPTextConfig.tiny()
        params = init_clip_params(jax.random.key(0), cfg, jnp.float32)
        params["text_projection"] = init_linear(
            jax.random.key(1), cfg.hidden, 16, bias=False, dtype=jnp.float32
        )
        ids = jnp.asarray([[1, 2, 3, cfg.eos_token_id]])
        feats = clip_text_features(params, cfg, ids)
        assert feats.shape == (1, 16)

    def test_missing_projection_raises(self):
        cfg = CLIPTextConfig.tiny()
        params = init_clip_params(jax.random.key(0), cfg, jnp.float32)
        with pytest.raises(KeyError):
            clip_text_features(params, cfg, jnp.asarray([[1, 2]]))


class TestJaxBackend:
    def test_backend_end_to_end(self, tmp_path):
        from PIL import Image

        from loongx_tpu.evaluation.jax_backend import make_jax_clip_backend
        from loongx_tpu.evaluation import evaluate_directory

        # synthetic gen/gt pairs
        rng = np.random.RandomState(0)
        for i in range(2):
            base = rng.randint(0, 255, (16, 16, 3), np.uint8)
            Image.fromarray(base).save(tmp_path / f"x{i}_0.png")
            Image.fromarray(base).save(tmp_path / f"x{i}_1.png")

        tcfg = CLIPTextConfig.tiny()
        tparams = init_clip_params(jax.random.key(0), tcfg, jnp.float32)
        tparams["text_projection"] = init_linear(
            jax.random.key(1), tcfg.hidden, 16, bias=False, dtype=jnp.float32
        )
        vcfg = CLIPVisionConfig.tiny()
        vparams = init_clip_vision_params(jax.random.key(2), vcfg)

        class Tok:
            def __call__(self, texts, **kw):
                ids = np.ones((len(texts), 8), np.int32)

                class R:
                    input_ids = ids

                return R()

        img_fn, txt_fn = make_jax_clip_backend(
            tparams, tcfg, vparams, vcfg, Tok()
        )
        results = evaluate_directory(
            str(tmp_path),
            instructions={f"x{i}": "hello" for i in range(2)},
            clip_image_embed=img_fn,
            clip_text_embed=txt_fn,
            image_size=16,
        )
        # identical gen/gt images -> CLIP-I == 1
        np.testing.assert_allclose(results["clip_i"], 1.0, atol=1e-5)
        assert np.isfinite(results["clip_t_gen"])
