"""Tests for S4D layers and pooling ops (CS3 building blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.ops.pooling import (
    adaptive_avg_pool1d,
    feature_pyramid_pooling,
    spatial_pyramid_pooling,
)
from loongx_tpu.ops.s4 import (
    init_s4d_layer,
    s4d_conv,
    s4d_scan,
    s4d_kernel,
    init_s4_stack,
    s4_stack_apply,
)


class TestAdaptivePool:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(0).randn(2, 3, 100).astype(np.float32)
        for out in (4, 7, 50, 64, 100):
            expected = torch.nn.AdaptiveAvgPool1d(out)(torch.tensor(x)).numpy()
            got = adaptive_avg_pool1d(jnp.asarray(x), out)
            np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_fpp_shape(self):
        x = jnp.ones((2, 4, 4096))
        out = feature_pyramid_pooling(x, (128, 256, 512, 1024, 2048))
        assert out.shape == (2, 4, 3968)

    def test_spp_pad_truncate(self):
        x = jnp.ones((1, 4, 100))
        padded = spatial_pyramid_pooling(x, 128)
        assert padded.shape == (1, 4, 128)
        np.testing.assert_array_equal(padded[..., 100:], 0.0)
        trunc = spatial_pyramid_pooling(x, 50)
        assert trunc.shape == (1, 4, 50)
        same = spatial_pyramid_pooling(x, 100)
        assert same.shape == (1, 4, 100)

    def test_spp_adaptive(self):
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8)
        out = spatial_pyramid_pooling(x, 4, adaptive=True)
        np.testing.assert_allclose(out[0, 0], [0.5, 2.5, 4.5, 6.5])


class TestS4D:
    def test_conv_scan_equivalence(self):
        """FFT-conv and associative-scan modes must agree."""
        p = init_s4d_layer(jax.random.key(0), d_model=8, n_state=16)
        u = jax.random.normal(jax.random.key(1), (2, 64, 8))
        y_conv = s4d_conv(p, u)
        y_scan = s4d_scan(p, u)
        np.testing.assert_allclose(
            np.asarray(y_conv), np.asarray(y_scan), atol=1e-3, rtol=1e-3
        )

    def test_kernel_decays(self):
        """Stable SSM: kernel magnitude decays over long horizons."""
        p = init_s4d_layer(jax.random.key(0), d_model=4, n_state=8)
        k = s4d_kernel(p, 2048)
        head = jnp.mean(jnp.abs(k[:, :64]))
        tail = jnp.mean(jnp.abs(k[:, -64:]))
        assert tail < head

    def test_causality(self):
        """Output at position t must not depend on inputs after t."""
        p = init_s4d_layer(jax.random.key(0), d_model=4, n_state=8)
        u1 = jax.random.normal(jax.random.key(1), (1, 32, 4))
        u2 = u1.at[:, 20:].set(99.0)
        y1, y2 = s4d_conv(p, u1), s4d_conv(p, u2)
        np.testing.assert_allclose(
            np.asarray(y1[:, :20]), np.asarray(y2[:, :20]), atol=1e-4
        )

    def test_stack_shapes_and_grad(self):
        p = init_s4_stack(jax.random.key(0), d_input=4, d_model=16, d_output=8)
        u = jax.random.normal(jax.random.key(1), (2, 64, 4))
        y = s4_stack_apply(p, u)
        assert y.shape == (2, 64, 8)

        def loss(p):
            return jnp.mean(s4_stack_apply(p, u) ** 2)

        g = jax.grad(loss)(p)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(x)) for x in leaves)
        # SSM params must receive gradient
        assert float(jnp.sum(jnp.abs(g["blocks"][0]["s4"]["C"]))) > 0
