"""Golden tests for the in-framework JAX Depth-Anything estimator.

Same methodology as tests/test_speech_models.py: a tiny random HF torch
DepthAnythingForDepthEstimation produces a state dict,
utils/convert.convert_depth_anything_state maps it onto our pytree, and
depth_anything_forward must match torch in fp32 to tight tolerance —
including the non-square input path that exercises the bicubic
position-embedding interpolation.  This is the model behind the
reference's depth / depth_pred condition synthesis
(/root/reference/src/flux/condition.py:59-75, src/train/data.py:271-277).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from loongx_tpu.models.depth import (
    DepthAnythingConfig,
    DepthAnythingEstimator,
    depth_anything_forward,
    dinov2_features,
    dpt_resize_hw,
    init_depth_anything_params,
    resize2d,
)
from loongx_tpu.utils.convert import convert_depth_anything_state

ATOL = 2e-4


def _tiny_torch_model(seed=0):
    from transformers import (
        DepthAnythingConfig as HFDepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    torch.manual_seed(seed)
    bb = Dinov2Config(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        mlp_ratio=4,
        image_size=56,
        patch_size=14,
        out_indices=[1, 2, 3, 4],
        apply_layernorm=True,
        reshape_hidden_states=False,
    )
    cfg = HFDepthAnythingConfig(
        backbone_config=bb,
        reassemble_hidden_size=32,
        patch_size=14,
        neck_hidden_sizes=[8, 16, 24, 32],
        reassemble_factors=[4, 2, 1, 0.5],
        fusion_hidden_size=16,
        head_hidden_size=8,
        head_in_index=-1,
        depth_estimation_type="relative",
        max_depth=1,
    )
    model = DepthAnythingForDepthEstimation(cfg).eval()
    # non-trivial layer scales / norms so every branch actually contributes
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "lambda1" in name:
                p.mul_(0.7)
    return model


def _our_cfg():
    return DepthAnythingConfig(
        hidden_size=32,
        num_layers=4,
        num_heads=2,
        mlp_ratio=4,
        patch_size=14,
        image_size=56,
        out_indices=(1, 2, 3, 4),
        neck_hidden_sizes=(8, 16, 24, 32),
        reassemble_factors=(4.0, 2.0, 1.0, 0.5),
        fusion_hidden_size=16,
        head_hidden_size=8,
    )


def _sd(model):
    return {
        k: v.detach().cpu().numpy().astype(np.float32)
        for k, v in model.state_dict().items()
    }


@pytest.fixture(scope="module")
def golden():
    model = _tiny_torch_model()
    cfg = _our_cfg()
    params = convert_depth_anything_state(_sd(model), cfg, dtype=jnp.float32)
    return model, cfg, params


def test_resize2d_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    for size, mode, align in [
        ((10, 14), "linear", True),
        ((10, 14), "linear", False),
        ((3, 4), "linear", True),
        ((3, 4), "linear", False),
        ((11, 9), "cubic", False),
        ((4, 3), "cubic", False),
        # out dim of 1 under align_corners=True: torch samples source
        # index 0 (scale is 0/0), not the half-pixel center
        ((1, 1), "linear", True),
        ((1, 4), "linear", True),
        ((1, 1), "linear", False),
    ]:
        want = torch.nn.functional.interpolate(
            xt,
            size=size,
            mode="bilinear" if mode == "linear" else "bicubic",
            align_corners=align,
        )
        got = resize2d(jnp.asarray(x), size, mode, align)
        err = np.max(
            np.abs(np.asarray(got) - want.permute(0, 2, 3, 1).numpy())
        )
        assert err < 1e-5, (size, mode, align, err)


def test_backbone_features_match_torch(golden):
    model, cfg, params = golden
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.backbone(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).feature_maps
    got = dinov2_features(params, cfg, jnp.asarray(x))
    assert len(got) == len(want) == 4
    for i, (g, w) in enumerate(zip(got, want)):
        err = np.max(np.abs(np.asarray(g) - w.numpy()))
        assert err < ATOL, f"stage {i}: {err:.2e}"


def test_depth_forward_matches_torch(golden):
    model, cfg, params = golden
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).predicted_depth
    got = depth_anything_forward(params, cfg, jnp.asarray(x))
    assert got.shape == tuple(want.shape)
    err = np.max(np.abs(np.asarray(got) - want.numpy()))
    assert err < ATOL, f"max abs err {err:.2e}"


def test_depth_forward_nonsquare_interpolated_pos(golden):
    """H != W triggers the fp32 bicubic position-embedding interpolation
    (Dinov2Embeddings.interpolate_pos_encoding)."""
    model, cfg, params = golden
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 56, 84, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).predicted_depth
    got = depth_anything_forward(params, cfg, jnp.asarray(x))
    assert got.shape == tuple(want.shape)
    err = np.max(np.abs(np.asarray(got) - want.numpy()))
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_dpt_resize_rule():
    # square target, multiple-of-14, scale-as-little-as-possible
    assert dpt_resize_hw(518, 518, 518, 14) == (518, 518)
    assert dpt_resize_hw(480, 640, 518, 14) == (518, 686)
    # replicates the HF sizing util exactly
    from transformers.models.dpt.image_processing_dpt import (
        get_resize_output_image_size,
    )

    rng = np.random.default_rng(4)
    for _ in range(10):
        h, w = int(rng.integers(64, 900)), int(rng.integers(64, 900))
        want = get_resize_output_image_size(
            np.zeros((h, w, 3), np.uint8),
            output_size=(518, 518),
            keep_aspect_ratio=True,
            multiple=14,
        )
        assert dpt_resize_hw(h, w, 518, 14) == tuple(want), (h, w)


def test_estimator_pipeline_format(golden, tmp_path):
    """__call__ returns the HF pipeline's dict: min-max-normalized uint8
    'depth' PIL at the source resolution."""
    from PIL import Image

    _, cfg, params = golden
    est = DepthAnythingEstimator(params, cfg, size=56, ensure_multiple_of=14)
    img = Image.fromarray(
        (np.random.default_rng(5).random((60, 80, 3)) * 255).astype(np.uint8)
    )
    out = est(img)
    assert out["predicted_depth"].shape == (60, 80)
    assert out["depth"].size == (80, 60)
    arr = np.asarray(out["depth"])
    assert arr.dtype == np.uint8
    assert arr.min() == 0 and arr.max() == 255


def test_estimator_matches_hf_pipeline_end_to_end(golden, tmp_path):
    """Save the tiny torch model as a local HF checkout; from_pretrained +
    __call__ must reproduce the torch pipeline's predicted depth."""
    from PIL import Image
    from transformers import DPTImageProcessor

    model, cfg, params = golden
    path = tmp_path / "depth-anything-tiny"
    model.save_pretrained(path)
    proc = DPTImageProcessor(
        do_resize=True,
        size={"height": 56, "width": 56},
        keep_aspect_ratio=True,
        ensure_multiple_of=14,
        do_rescale=True,
        do_normalize=True,
        image_mean=[0.485, 0.456, 0.406],
        image_std=[0.229, 0.224, 0.225],
    )
    proc.save_pretrained(path)

    est = DepthAnythingEstimator.from_pretrained(str(path))
    assert est.size == (56, 56) and est.ensure_multiple_of == 14

    img = Image.fromarray(
        (np.random.default_rng(6).random((70, 56, 3)) * 255).astype(np.uint8)
    )
    inputs = proc(images=img, return_tensors="pt")
    with torch.no_grad():
        want = model(**inputs).predicted_depth
    want = torch.nn.functional.interpolate(
        want[None], size=(70, 56), mode="bicubic", align_corners=False
    )[0, 0]

    got = est.predict_depth(img)
    err = np.max(np.abs(got - want.numpy()))
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_estimator_honors_processor_config(golden, tmp_path):
    """Non-default preprocessor_config.json fields (bilinear resample,
    do_normalize=False, non-square size) change preprocessing exactly like
    the HF DPTImageProcessor — not silently ignored."""
    from PIL import Image
    from transformers import DPTImageProcessor

    model, cfg, params = golden
    path = tmp_path / "depth-anything-odd"
    model.save_pretrained(path)
    proc = DPTImageProcessor(
        do_resize=True,
        size={"height": 42, "width": 56},
        keep_aspect_ratio=False,
        ensure_multiple_of=14,
        resample=2,  # bilinear
        do_rescale=True,
        do_normalize=False,
        image_mean=[0.485, 0.456, 0.406],
        image_std=[0.229, 0.224, 0.225],
    )
    proc.save_pretrained(path)

    est = DepthAnythingEstimator.from_pretrained(str(path))
    assert est.size == (42, 56)
    assert est.resample == 2 and est.do_normalize is False

    img = Image.fromarray(
        (np.random.default_rng(7).random((64, 48, 3)) * 255).astype(np.uint8)
    )
    inputs = proc(images=img, return_tensors="pt")
    with torch.no_grad():
        want = model(**inputs).predicted_depth
    want = torch.nn.functional.interpolate(
        want[None], size=(64, 48), mode="bicubic", align_corners=False
    )[0, 0]

    got = est.predict_depth(img)
    err = np.max(np.abs(got - want.numpy()))
    assert err < 5e-4, f"max abs err {err:.2e}"


def test_depth_condition_synthesis_uses_jax_backend(golden, tmp_path, monkeypatch):
    """synthesize_condition_image('depth', ...) resolves $LOONGX_DEPTH_MODEL
    to a local checkout and runs the JAX estimator (no torch pipeline)."""
    from PIL import Image

    import loongx_tpu.models.depth as depth_mod
    from loongx_tpu.sampling.condition import synthesize_condition_image

    model, _, _ = golden
    path = tmp_path / "depth-anything-tiny"
    model.save_pretrained(path)
    monkeypatch.setenv("LOONGX_DEPTH_MODEL", str(path))
    depth_mod._ESTIMATOR_CACHE.clear()
    try:
        img = Image.fromarray(
            (np.random.default_rng(7).random((64, 64, 3)) * 255).astype(np.uint8)
        )
        out = synthesize_condition_image("depth", img)
        assert out.mode == "RGB" and out.size == (64, 64)
        assert isinstance(
            depth_mod._ESTIMATOR_CACHE[str(path)], DepthAnythingEstimator
        )
    finally:
        depth_mod._ESTIMATOR_CACHE.clear()


def test_random_init_smoke():
    cfg = _our_cfg()
    params = init_depth_anything_params(jax.random.key(0), cfg)
    out = depth_anything_forward(params, cfg, jnp.zeros((1, 56, 56, 3)))
    assert out.shape == (1, 56, 56)
    assert np.all(np.isfinite(np.asarray(out)))
