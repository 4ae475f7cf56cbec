"""Biosignal preprocessing, in-graph (jit-friendly).

The reference feeds raw pickled EEG/fNIRS/PPG/motion arrays straight into
SPP + encoders (reference src/train/model.py:625-647).  Real deployments
clean the signals first; these ops fold windowing, normalisation and
spectral filtering into the same XLA graph as the encoders (BASELINE.json
north star: "fold signal preprocessing (windowing, normalization, spectral
features) ... into the same XLA graph") so preprocessing rides the device,
not the host.

All ops take [..., C, L] arrays and are shape-static.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def zscore(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """Per-channel standardisation."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    std = jnp.std(xf, axis=axis, keepdims=True)
    return ((xf - mean) / (std + eps)).astype(x.dtype)


def detrend(x: jnp.ndarray) -> jnp.ndarray:
    """Remove per-channel linear trend (least squares on [0, 1] ramp)."""
    xf = x.astype(jnp.float32)
    length = x.shape[-1]
    t = jnp.linspace(-1.0, 1.0, length)
    t_norm = jnp.sum(t * t)
    slope = jnp.sum(xf * t, axis=-1, keepdims=True) / t_norm
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    return (xf - mean - slope * t).astype(x.dtype)


def bandpass_fft(
    x: jnp.ndarray, low_hz: float, high_hz: float, fs: float
) -> jnp.ndarray:
    """Brick-wall FFT bandpass along the last axis."""
    xf = x.astype(jnp.float32)
    length = x.shape[-1]
    spec = jnp.fft.rfft(xf, axis=-1)
    freqs = jnp.fft.rfftfreq(length, 1.0 / fs)
    mask = (freqs >= low_hz) & (freqs <= high_hz)
    return jnp.fft.irfft(spec * mask, n=length, axis=-1).astype(x.dtype)


def notch_fft(
    x: jnp.ndarray, notch_hz: float, fs: float, width_hz: float = 1.0
) -> jnp.ndarray:
    """FFT notch (mains-hum removal, e.g. 50/60 Hz)."""
    xf = x.astype(jnp.float32)
    length = x.shape[-1]
    spec = jnp.fft.rfft(xf, axis=-1)
    freqs = jnp.fft.rfftfreq(length, 1.0 / fs)
    keep = jnp.abs(freqs - notch_hz) > width_hz / 2
    return jnp.fft.irfft(spec * keep, n=length, axis=-1).astype(x.dtype)


def hann_window(length: int) -> jnp.ndarray:
    n = jnp.arange(length, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / length)


def stft_power(
    x: jnp.ndarray, frame: int = 256, hop: int = 128
) -> jnp.ndarray:
    """Windowed short-time power spectrum: [..., C, L] ->
    [..., C, n_frames, frame//2+1]."""
    xf = x.astype(jnp.float32)
    length = x.shape[-1]
    n_frames = max(1, (length - frame) // hop + 1)
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(frame)[None, :])  # [F, frame]
    frames = xf[..., idx] * hann_window(frame)
    spec = jnp.fft.rfft(frames, axis=-1)
    return (jnp.abs(spec) ** 2).astype(jnp.float32)


def band_powers(
    x: jnp.ndarray,
    fs: float,
    bands: Tuple[Tuple[float, float], ...] = (
        (0.5, 4.0), (4.0, 8.0), (8.0, 13.0), (13.0, 30.0), (30.0, 100.0),
    ),
) -> jnp.ndarray:
    """Mean per-band log-power (delta/theta/alpha/beta/gamma by default):
    [..., C, L] -> [..., C, n_bands]."""
    xf = x.astype(jnp.float32)
    length = x.shape[-1]
    psd = jnp.abs(jnp.fft.rfft(xf, axis=-1)) ** 2 / length
    freqs = np.fft.rfftfreq(length, 1.0 / fs)
    outs = []
    for lo, hi in bands:
        mask = jnp.asarray((freqs >= lo) & (freqs < hi), jnp.float32)
        denom = jnp.maximum(mask.sum(), 1.0)
        outs.append(jnp.log1p(jnp.sum(psd * mask, axis=-1) / denom))
    return jnp.stack(outs, axis=-1)


def preprocess_signal(
    x: jnp.ndarray,
    fs: float,
    bandpass: Optional[Tuple[float, float]] = None,
    notch: Optional[float] = None,
    normalize: bool = True,
    remove_trend: bool = False,
) -> jnp.ndarray:
    """Composable cleanup chain; jit this together with the encoders."""
    if remove_trend:
        x = detrend(x)
    if notch is not None:
        x = notch_fft(x, notch, fs)
    if bandpass is not None:
        x = bandpass_fft(x, bandpass[0], bandpass[1], fs)
    if normalize:
        x = zscore(x)
    return x
