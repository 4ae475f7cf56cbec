"""S4D diagonal state-space sequence layer (heart of the CS3 encoders).

TPU-native replacement for the ``s4torch.S4Model`` stacks the reference uses
in every biosignal encoder (/root/reference/src/train/model.py:31-55,
153-160, 224-231, 293-300).  We use the S4D (diagonal) parametrisation:

    x_k = Abar x_{k-1} + Bbar u_k,   y_k = 2 Re(C x_k) + D u_k
    A = -exp(log_A_real) + i A_imag      (stable left-half-plane diagonal)
    ZOH discretisation: Abar = exp(dt A), Bbar = (Abar - 1)/A

Two equivalent evaluation modes, both jit-friendly:

  * ``conv``: materialise the length-L kernel K[l] = 2 Re(C Abar^l Bbar) via a
    log-space Vandermonde product and convolve by FFT — O(L log L), the fast
    path for training/eval on TPU (XLA lowers FFT natively).
  * ``scan``: ``jax.lax.associative_scan`` over the complex recurrence —
    O(L) work with log-depth, used for streaming and as a cross-check.

All SSM math runs in float32 (the reference keeps S4 in fp32 too —
model.py:77-81); inputs/outputs cast to the surrounding dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params, init_layer_norm, init_linear, layer_norm, linear,
)


def init_s4d_layer(
    key: jax.Array,
    d_model: int,
    n_state: int = 64,
    dt_min: float = 1e-3,
    dt_max: float = 1e-1,
) -> Params:
    """One S4D layer: d_model independent SSMs, each with n_state/2 complex
    conjugate-pair states (we store the half-spectrum)."""
    n = n_state // 2
    k_c, k_dt = jax.random.split(key)
    # S4D-Lin initialisation: A_n = -1/2 + i*pi*n
    a_imag = math.pi * jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32), (d_model, n)
    )
    log_a_real = jnp.log(0.5 * jnp.ones((d_model, n), jnp.float32))
    c = jax.random.normal(k_c, (d_model, n, 2), jnp.float32)
    log_dt = jax.random.uniform(k_dt, (d_model,), jnp.float32) * (
        math.log(dt_max) - math.log(dt_min)
    ) + math.log(dt_min)
    return {
        "log_A_real": log_a_real,
        "A_imag": a_imag,
        "C": c,  # [..., 0]=real, [..., 1]=imag
        "log_dt": log_dt,
        "D": jnp.ones((d_model,), jnp.float32),
    }


def discretise_real(p: Params):
    """ZOH discretisation in real arithmetic (TPU backends lack complex
    support in several code paths — scans, Mosaic).  Returns the real/imag
    planes (abar_r, abar_i, bbar_r, bbar_i, c_r, c_i), each [H, N]."""
    a_re = -jnp.exp(p["log_A_real"])  # [H, N]
    a_im = p["A_imag"]
    dt = jnp.exp(p["log_dt"])[:, None]  # [H, 1]
    dta_re, dta_im = a_re * dt, a_im * dt
    mag = jnp.exp(dta_re)
    abar_r = mag * jnp.cos(dta_im)
    abar_i = mag * jnp.sin(dta_im)
    # bbar = (abar - 1) / a  (complex division by a, B = 1)
    denom = a_re * a_re + a_im * a_im
    num_r, num_i = abar_r - 1.0, abar_i
    bbar_r = (num_r * a_re + num_i * a_im) / denom
    bbar_i = (num_i * a_re - num_r * a_im) / denom
    return abar_r, abar_i, bbar_r, bbar_i, p["C"][..., 0], p["C"][..., 1]


def _dta(p: Params):
    a_re = -jnp.exp(p["log_A_real"])
    a_im = p["A_imag"]
    dt = jnp.exp(p["log_dt"])[:, None]
    return a_re * dt, a_im * dt


def s4d_kernel(p: Params, length: int) -> jnp.ndarray:
    """Materialise the [H, L] real convolution kernel (real-arithmetic
    Vandermonde: K[h,l] = 2 Re(sum_n (C Bbar)[h,n] exp(dtA[h,n] l)))."""
    _, _, bbar_r, bbar_i, c_r, c_i = discretise_real(p)
    ctb_r = c_r * bbar_r - c_i * bbar_i  # [H, N]
    ctb_i = c_r * bbar_i + c_i * bbar_r
    dta_re, dta_im = _dta(p)
    steps = jnp.arange(length, dtype=jnp.float32)  # [L]
    mag = jnp.exp(dta_re[:, :, None] * steps[None, None, :])  # [H, N, L]
    phase = dta_im[:, :, None] * steps[None, None, :]
    vander_r = mag * jnp.cos(phase)
    vander_i = mag * jnp.sin(phase)
    return 2.0 * (
        jnp.einsum("hn,hnl->hl", ctb_r, vander_r)
        - jnp.einsum("hn,hnl->hl", ctb_i, vander_i)
    )


def s4d_conv(p: Params, u: jnp.ndarray) -> jnp.ndarray:
    """FFT convolution mode.  u: [B, L, H] (any float dtype) -> [B, L, H]."""
    b, length, h = u.shape
    uf = u.astype(jnp.float32)
    k = s4d_kernel(p, length)  # [H, L]
    n_fft = 2 * length
    ku = jnp.fft.rfft(k, n=n_fft, axis=-1)  # [H, F]
    uu = jnp.fft.rfft(uf.transpose(0, 2, 1), n=n_fft, axis=-1)  # [B, H, F]
    y = jnp.fft.irfft(uu * ku[None], n=n_fft, axis=-1)[..., :length]
    y = y.transpose(0, 2, 1) + uf * p["D"][None, None, :]
    return y.astype(u.dtype)


def s4d_scan(p: Params, u: jnp.ndarray) -> jnp.ndarray:
    """Associative-scan recurrent mode (streaming-friendly).  Same contract
    as `s4d_conv`; numerically equivalent up to float error.  Real-arithmetic
    complex pairs (TPU-safe)."""
    abar_r, abar_i, bbar_r, bbar_i, c_r, c_i = discretise_real(p)
    uf = u.astype(jnp.float32)  # [B, L, H]
    bu_r = bbar_r[None, None] * uf[..., None]  # [B, L, H, N]
    bu_i = bbar_i[None, None] * uf[..., None]

    a_r = jnp.broadcast_to(abar_r[None, None], bu_r.shape)
    a_i = jnp.broadcast_to(abar_i[None, None], bu_r.shape)

    def combine(l, r):
        alr, ali, xlr, xli = l
        arr, ari, xrr, xri = r
        # a = ar*al (complex); x = ar*xl + xr
        return (
            arr * alr - ari * ali,
            arr * ali + ari * alr,
            arr * xlr - ari * xli + xrr,
            arr * xli + ari * xlr + xri,
        )

    _, _, xs_r, xs_i = jax.lax.associative_scan(
        combine, (a_r, a_i, bu_r, bu_i), axis=1
    )
    y = 2.0 * (
        jnp.einsum("hn,blhn->blh", c_r, xs_r)
        - jnp.einsum("hn,blhn->blh", c_i, xs_i)
    )
    y = y + uf * p["D"][None, None, :]
    return y.astype(u.dtype)


# ---------------------------------------------------------------------------
# S4 stack: encoder linear -> [S4D + GLU + residual + LN] x n -> decoder
# ---------------------------------------------------------------------------


def init_s4_stack(
    key: jax.Array,
    d_input: int,
    d_model: int,
    d_output: int,
    n_blocks: int = 2,
    n_state: int = 64,
    dtype=jnp.float32,
) -> Params:
    """Mirror of the reference's S4Model topology (encoder/blocks/decoder)."""
    keys = jax.random.split(key, 2 * n_blocks + 2)
    blocks = []
    for i in range(n_blocks):
        blocks.append(
            {
                "s4": init_s4d_layer(keys[2 * i], d_model, n_state),
                "out": init_linear(keys[2 * i + 1], d_model, 2 * d_model, dtype=dtype),
                "norm": init_layer_norm(d_model, dtype),
            }
        )
    return {
        "encoder": init_linear(keys[-2], d_input, d_model, dtype=dtype),
        "blocks": blocks,
        "decoder": init_linear(keys[-1], d_model, d_output, dtype=dtype),
    }


def s4_stack_apply(
    params: Params, u: jnp.ndarray, mode: str = "conv"
) -> jnp.ndarray:
    """u: [B, L, d_input] -> [B, L, d_output].

    mode: "conv" (FFT convolution — the default and the fastest at the CS3
    operating points, benchmarks/s4_mode_bench.py), "scan" (XLA
    associative scan), or "pallas" (in-VMEM recurrence kernel,
    ops/s4_pallas.py — constant memory in L, the streaming/serving form).
    """
    if mode == "pallas":
        from loongx_tpu.ops.s4_pallas import s4d_scan_pallas

        core = s4d_scan_pallas
    elif mode == "scan":
        core = s4d_scan
    elif mode == "conv":
        core = s4d_conv
    else:
        raise ValueError(f"unknown s4 mode {mode!r} (conv | scan | pallas)")
    x = linear(params["encoder"], u)
    for blk in params["blocks"]:
        z = core(blk["s4"], x)
        z = linear(blk["out"], z)
        z = jax.nn.glu(z, axis=-1)
        x = layer_norm(x + z, blk["norm"]["weight"], blk["norm"]["bias"])
    return linear(params["decoder"], x)
