"""Unit tests for RoPE, latent packing, and schedule math (SURVEY §7 stage 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.ops.rope import rope_embed, apply_rope
from loongx_tpu.ops.latents import (
    pack_latents,
    unpack_latents,
    latent_image_ids,
    shift_ids,
)
from loongx_tpu.ops.schedule import (
    calculate_shift,
    time_shift,
    flux_sigmas,
    euler_step,
    flow_match_xt,
)


class TestRope:
    def test_shapes(self):
        ids = jnp.zeros((10, 3))
        cos, sin = rope_embed(ids, (16, 56, 56))
        assert cos.shape == (10, 128) and sin.shape == (10, 128)

    def test_zero_ids_identity(self):
        """Zero positions -> no rotation."""
        ids = jnp.zeros((5, 3))
        cos, sin = rope_embed(ids, (8, 12, 12))
        x = jax.random.normal(jax.random.key(0), (1, 2, 5, 32))
        out = apply_rope(x, cos, sin)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_rotation_preserves_norm(self):
        ids = jax.random.uniform(jax.random.key(1), (7, 3)) * 32
        cos, sin = rope_embed(ids, (16, 56, 56))
        x = jax.random.normal(jax.random.key(2), (2, 4, 7, 128))
        out = apply_rope(x, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(out, axis=-1), jnp.linalg.norm(x, axis=-1), rtol=1e-5
        )

    def test_relative_property(self):
        """<rope(q,m), rope(k,n)> depends only on m-n (per single axis)."""
        def dot_at(m, n):
            ids_q = jnp.array([[m, 0.0, 0.0]])
            ids_k = jnp.array([[n, 0.0, 0.0]])
            cq, sq = rope_embed(ids_q, (16,))
            ck, sk = rope_embed(ids_k, (16,))
            q = jnp.arange(16, dtype=jnp.float32)[None, None, None, :] / 16
            k = jnp.ones((1, 1, 1, 16), jnp.float32)
            return jnp.sum(apply_rope(q, cq, sq) * apply_rope(k, ck, sk))

        a = dot_at(5.0, 3.0)
        b = dot_at(12.0, 10.0)
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_matches_torch_formula(self):
        """Cross-check the interleaved pairing against an independent torch
        implementation of the same math (FLUX/diffusers convention)."""
        torch = pytest.importorskip("torch")
        dim, theta = 16, 10000.0
        pos = np.array([3.7, 11.0])
        # independent impl: complex rotation on interleaved pairs
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2) / dim))
        ang = pos[:, None] * freqs[None]  # [2, 8]
        x = np.random.RandomState(0).randn(1, 1, 2, dim).astype(np.float32)
        xt = torch.tensor(x)
        xr = xt.reshape(1, 1, 2, dim // 2, 2)
        re, im = xr[..., 0], xr[..., 1]
        angt = torch.tensor(ang, dtype=torch.float32)
        out_re = re * torch.cos(angt) - im * torch.sin(angt)
        out_im = re * torch.sin(angt) + im * torch.cos(angt)
        expected = torch.stack([out_re, out_im], dim=-1).reshape(1, 1, 2, dim)

        ids = jnp.stack([jnp.asarray(pos, jnp.float32)], axis=-1)
        cos, sin = rope_embed(ids, (dim,), theta)
        got = apply_rope(jnp.asarray(x), cos, sin)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


class TestLatents:
    def test_pack_unpack_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 6, 16))
        tokens = pack_latents(x)
        assert tokens.shape == (2, 4 * 3, 64)
        back = unpack_latents(tokens, 8, 6)
        np.testing.assert_array_equal(back, x)

    def test_pack_matches_torch_semantics(self):
        """Token layout must equal diffusers' _pack_latents: NCHW view +
        permute(0,2,4,1,3,5)."""
        torch = pytest.importorskip("torch")
        b, c, h, w = 1, 4, 4, 4
        x_nchw = torch.arange(b * c * h * w, dtype=torch.float32).reshape(b, c, h, w)
        lat = x_nchw.view(b, c, h // 2, 2, w // 2, 2)
        lat = lat.permute(0, 2, 4, 1, 3, 5)
        expected = lat.reshape(b, (h // 2) * (w // 2), c * 4).numpy()

        x_nhwc = jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())
        got = pack_latents(x_nhwc)
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_ids(self):
        ids = latent_image_ids(8, 6)
        assert ids.shape == (4 * 3, 3)
        np.testing.assert_array_equal(ids[:, 0], 0)
        assert ids[0, 1] == 0 and ids[0, 2] == 0
        assert ids[-1, 1] == 3 and ids[-1, 2] == 2
        # row-major: second token is (0, 0, 1)
        np.testing.assert_array_equal(ids[1], [0, 0, 1])

    def test_shift_ids(self):
        ids = latent_image_ids(4, 4)
        shifted = shift_ids(ids, (2, -3), 1.0)
        np.testing.assert_array_equal(shifted[:, 1], ids[:, 1] + 2)
        np.testing.assert_array_equal(shifted[:, 2], ids[:, 2] - 3)
        scaled = shift_ids(ids, (0, 0), 2.0)
        np.testing.assert_allclose(
            scaled[:, 1], ids[:, 1] * 2.0 + 0.5, rtol=1e-6
        )


class TestSchedule:
    def test_calculate_shift_endpoints(self):
        # At the scheduler's calibration points the shift equals base/max.
        assert abs(calculate_shift(256) - 0.5) < 1e-9
        assert abs(calculate_shift(4096) - 1.15) < 1e-9

    def test_sigmas_properties(self):
        sig = flux_sigmas(28, 1024)
        assert sig.shape == (29,)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0)  # strictly decreasing
        # first sigma: time_shift(mu, 1.0, 1.0) == 1.0 exactly
        np.testing.assert_allclose(sig[0], 1.0, atol=1e-6)

    def test_time_shift_formula(self):
        mu = calculate_shift(1024)
        t = np.array([0.5])
        expected = np.exp(mu) / (np.exp(mu) + (1 / t - 1))
        np.testing.assert_allclose(time_shift(mu, 1.0, t), expected)

    def test_euler_integrates_linear_flow(self):
        """With v = x1 - x0 constant, Euler from sigma=1 to 0 recovers x0."""
        x0 = jnp.array([1.0, -2.0, 3.0])
        x1 = jnp.array([0.5, 0.5, 0.5])
        v = x1 - x0
        sig = flux_sigmas(8, 256)
        x = x1
        for i in range(8):
            x = euler_step(x, v, sig[i], sig[i + 1])
        np.testing.assert_allclose(x, x0, atol=1e-5)

    def test_flow_match_xt(self):
        x0 = jnp.ones((2, 3, 4))
        x1 = jnp.zeros((2, 3, 4))
        t = jnp.array([0.25, 0.75])
        xt = flow_match_xt(x0, x1, t)
        np.testing.assert_allclose(xt[0], 0.75, atol=1e-6)
        np.testing.assert_allclose(xt[1], 0.25, atol=1e-6)
