"""Pallas TPU kernel for the S4D diagonal-SSM recurrence.

The CS3 encoders' SSM core (SURVEY §2c row "s4torch") in streaming form:

    x_k = Abar x_{k-1} + Bbar u_k        (complex diagonal, conjugate pairs)
    y_k = 2 Re(C x_k) + D u_k

Complex math is expressed with real/imag planes (TPU has no complex
support in Mosaic).  One grid program handles one batch element; the time
loop runs in-kernel with the [H, N, 2] state resident in VMEM — zero HBM
traffic for the state, one streaming pass over u.

This is the *streaming/serving* path (constant memory in L, exact
recurrence).  Training/eval default to the FFT-convolution path in ops/s4.py
(O(L log L), better MXU/VPU utilisation at L=4096); both are tested
equivalent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _s4d_scan_kernel(
    u_ref,      # [L, H]
    ar_ref, ai_ref,  # [H, N] discrete Abar (real, imag)
    br_ref, bi_ref,  # [H, N] Bbar
    cr_ref, ci_ref,  # [H, N] C
    d_ref,      # [1, H]
    y_ref,      # [L, H] output
    xr, xi,     # scratch [H, N] state planes
    *,
    length: int,
    chunk: int,
):
    xr[...] = jnp.zeros_like(xr)
    xi[...] = jnp.zeros_like(xi)
    ar, ai = ar_ref[...], ai_ref[...]
    br, bi = br_ref[...], bi_ref[...]
    cr, ci = cr_ref[...], ci_ref[...]
    d = d_ref[0, :]

    def step(t, _):
        u_t = u_ref[t, :]  # [H]
        u_col = u_t[:, None]  # [H, 1]
        xr_p, xi_p = xr[...], xi[...]
        # complex state update: x = a*x + b*u
        new_r = ar * xr_p - ai * xi_p + br * u_col
        new_i = ai * xr_p + ar * xi_p + bi * u_col
        xr[...] = new_r
        xi[...] = new_i
        # y = 2 Re(C x) + D u
        y = 2.0 * jnp.sum(cr * new_r - ci * new_i, axis=1) + d * u_t
        y_ref[t, :] = y
        return 0

    jax.lax.fori_loop(0, length, step, 0)


def s4d_scan_pallas(params, u: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """u: [B, L, H] -> [B, L, H], S4D recurrence via a Pallas kernel.

    ``params`` is an ops.s4 S4D layer dict (log_A_real / A_imag / C / log_dt
    / D).  interpret=None auto-selects interpret mode off-TPU so the
    ``s4_mode="pallas"`` path stays runnable (and CPU-testable) everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _s4d_scan_pallas(params, u, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _s4d_scan_pallas(
    params, u: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    from loongx_tpu.ops.s4 import discretise_real

    ar, ai, br, bi, cr, ci = discretise_real(params)
    d = params["D"][None, :]
    b, length, h = u.shape

    kernel = functools.partial(
        _s4d_scan_kernel, length=length, chunk=min(length, 512)
    )

    def one_batch(u_b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((length, h), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(ar.shape, jnp.float32),
                pltpu.VMEM(ar.shape, jnp.float32),
            ],
            interpret=interpret,
        )(u_b.astype(jnp.float32), ar, ai, br, bi, cr, ci, d)

    y = jax.vmap(one_batch)(u)
    return y.astype(u.dtype)
