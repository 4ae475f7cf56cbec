"""Native host-ops library vs numpy/PIL fallbacks."""

import numpy as np
import pytest

from loongx_tpu import native


def test_u8_to_f32_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    out = native.u8_to_f32(img)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)
    # [-1, 1] scaling
    out2 = native.u8_to_f32(img, 1.0 / 127.5, -1.0)
    np.testing.assert_allclose(
        out2, img.astype(np.float32) / 127.5 - 1.0, atol=1e-5
    )


def test_resize_identity_size():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = native.resize_bilinear(img, 16, 16)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-5)


def test_resize_downscale_reasonable():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = 200  # top half bright
    out = native.resize_bilinear(img, 8, 8)
    assert out.shape == (8, 8, 3)
    assert out[:3].mean() > 0.6
    assert out[5:].mean() < 0.2


def test_rgb_to_gray3():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    out = native.rgb_to_gray3(img)
    assert out.shape == img.shape
    # channels equal
    assert (out[..., 0] == out[..., 1]).all()
    expected = (
        img.astype(np.int64) @ np.asarray([299, 587, 114]) + 500
    ) // 1000
    np.testing.assert_allclose(out[..., 0], expected, atol=1)


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_native_lib_actually_loaded():
    assert native.get_lib() is not None
