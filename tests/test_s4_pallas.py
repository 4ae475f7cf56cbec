"""Pallas S4D recurrence kernel vs conv/scan modes (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.s4 import init_s4d_layer, s4d_conv, s4d_scan
from loongx_tpu.ops.s4_pallas import s4d_scan_pallas


def test_pallas_matches_conv_and_scan():
    p = init_s4d_layer(jax.random.key(0), d_model=8, n_state=16)
    u = jax.random.normal(jax.random.key(1), (2, 64, 8))
    y_conv = s4d_conv(p, u)
    y_scan = s4d_scan(p, u)
    y_pl = s4d_scan_pallas(p, u, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_scan), np.asarray(y_conv), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_scan), atol=1e-4, rtol=1e-4
    )


def test_pallas_streaming_state_is_causal():
    p = init_s4d_layer(jax.random.key(0), d_model=4, n_state=8)
    u1 = jax.random.normal(jax.random.key(1), (1, 32, 4))
    u2 = u1.at[:, 16:].set(-5.0)
    y1 = s4d_scan_pallas(p, u1, interpret=True)
    y2 = s4d_scan_pallas(p, u2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y1[:, :16]), np.asarray(y2[:, :16]), atol=1e-5
    )
