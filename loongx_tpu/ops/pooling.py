"""Pooling ops for biosignal encoders.

* ``adaptive_avg_pool1d`` — exact torch ``nn.AdaptiveAvgPool1d`` semantics
  (bin i averages [floor(i*L/out), ceil((i+1)*L/out))), realised as a
  precomputed [L, out] averaging matrix so the op is a single MXU matmul
  instead of a gather loop.
* ``feature_pyramid_pooling`` — multi-scale concat of adaptive pools
  (reference: src/train/model.py:345-373).
* ``spatial_pyramid_pooling`` — pad/truncate (or adaptive-pool) variable-length
  signals to a fixed length (reference: src/train/model.py:479-511).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _pool_matrix(length: int, out_size: int) -> np.ndarray:
    """[length, out_size] matrix M with x @ M == AdaptiveAvgPool1d(out)(x)."""
    m = np.zeros((length, out_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * length) // out_size
        end = -(-((i + 1) * length) // out_size)  # ceil
        m[start:end, i] = 1.0 / (end - start)
    return m


def adaptive_avg_pool1d(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """x: [..., L] -> [..., out_size], exact torch semantics."""
    length = x.shape[-1]
    if length == out_size:
        return x
    m = jnp.asarray(_pool_matrix(length, out_size))
    y = jnp.matmul(
        x.astype(jnp.float32), m, preferred_element_type=jnp.float32
    )
    return y.astype(x.dtype)


def feature_pyramid_pooling(
    x: jnp.ndarray, output_sizes: Sequence[int]
) -> jnp.ndarray:
    """x: [B, C, L] -> [B, C, sum(output_sizes)] multi-scale features."""
    return jnp.concatenate(
        [adaptive_avg_pool1d(x, s) for s in output_sizes], axis=-1
    )


def spatial_pyramid_pooling(
    x: jnp.ndarray, output_size: int, adaptive: bool = False
) -> jnp.ndarray:
    """Normalise [B, C, L] to [B, C, output_size] by zero-pad / truncate
    (default) or adaptive average pooling."""
    length = x.shape[-1]
    if length == output_size:
        return x
    if adaptive:
        return adaptive_avg_pool1d(x, output_size)
    if length < output_size:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, output_size - length)]
        return jnp.pad(x, pad)
    return x[..., :output_size]
