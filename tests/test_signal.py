"""Signal preprocessing op tests (synthetic sinusoids)."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.ops.signal import (
    zscore, detrend, bandpass_fft, notch_fft, stft_power, band_powers,
    preprocess_signal,
)

FS = 256.0


def _tone(hz, length=1024, amp=1.0):
    t = np.arange(length) / FS
    return amp * np.sin(2 * np.pi * hz * t).astype(np.float32)


def test_zscore():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 512) * 7 + 3)
    z = zscore(x)
    np.testing.assert_allclose(np.asarray(z.mean(-1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z.std(-1)), 1.0, atol=1e-3)


def test_detrend_removes_ramp():
    ramp = np.linspace(0, 10, 512, dtype=np.float32)
    x = jnp.asarray(_tone(10, 512) + ramp)[None, None]
    y = np.asarray(detrend(x))[0, 0]
    # residual trend should be tiny relative to the ramp
    fit = np.polyfit(np.arange(512), y, 1)
    assert abs(fit[0]) < 1e-3


def test_bandpass_keeps_inband_kills_outband():
    x = jnp.asarray(_tone(10) + _tone(80))[None, None]
    y = np.asarray(bandpass_fft(x, 5, 20, FS))[0, 0]
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(1024, 1 / FS)
    p10 = spec[np.argmin(np.abs(freqs - 10))]
    p80 = spec[np.argmin(np.abs(freqs - 80))]
    assert p10 > 100 * max(p80, 1e-9)


def test_notch_removes_mains():
    x = jnp.asarray(_tone(10) + _tone(50))[None, None]
    y = np.asarray(notch_fft(x, 50, FS, width_hz=2.0))[0, 0]
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(1024, 1 / FS)
    p50 = spec[np.argmin(np.abs(freqs - 50))]
    p10 = spec[np.argmin(np.abs(freqs - 10))]
    assert p10 > 100 * max(p50, 1e-9)


def test_stft_shape():
    x = jnp.zeros((2, 4, 1024))
    out = stft_power(x, frame=256, hop=128)
    assert out.shape == (2, 4, 7, 129)


def test_band_powers_alpha_peak():
    x = jnp.asarray(_tone(10))[None, None]  # 10 Hz = alpha band
    bp = np.asarray(band_powers(x, FS))[0, 0]
    assert bp.argmax() == 2  # (8, 13) band


def test_preprocess_chain_jits():
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 512).astype(np.float32))

    @jax.jit
    def f(x):
        return preprocess_signal(x, FS, bandpass=(1, 40), notch=50.0,
                                 normalize=True, remove_trend=True)

    y = f(x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))
