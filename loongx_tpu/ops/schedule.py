"""Flow-match Euler schedule math.

Pure, golden-testable re-derivation of the schedule used by the reference
(diffusers ``FlowMatchEulerDiscreteScheduler`` + ``calculate_shift`` +
``retrieve_timesteps``, used at /root/reference/src/flux/generate.py:289-310
and the Euler update at :349).  FLUX.1-dev scheduler constants:
base_image_seq_len=256, max_image_seq_len=4096, base_shift=0.5,
max_shift=1.15, dynamic (exponential) time shifting.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """mu(image_seq_len): linear interpolation of the log-shift."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    """Exponential dynamic shifting: t -> e^mu / (e^mu + (1/t - 1)^sigma)."""
    return np.exp(mu) / (np.exp(mu) + (1.0 / t - 1.0) ** sigma)


def flux_sigmas(
    num_steps: int,
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
    use_dynamic_shifting: bool = True,
) -> np.ndarray:
    """The sigma ladder for a FLUX sampling run, including the trailing 0.

    Matches sigmas = linspace(1, 1/n, n) shifted by mu(image_seq_len)
    (reference: generate.py:290-306), with sigma_{n} = 0 appended so the last
    Euler step lands exactly on the data manifold.

    Returns: float32 numpy array of shape [num_steps + 1].  (numpy, not jax —
    this is host-side schedule precomputation.)
    """
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    if use_dynamic_shifting:
        mu = calculate_shift(
            image_seq_len, base_seq_len, max_seq_len, base_shift, max_shift
        )
        sigmas = time_shift(mu, 1.0, sigmas)
    else:
        # static shift (schnell): sigma' = shift*s/(1+(shift-1)*s) with shift=1
        pass
    return np.append(sigmas, 0.0).astype(np.float32)


def euler_step(
    latents: jnp.ndarray,
    model_output: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
) -> jnp.ndarray:
    """One flow-match Euler update x <- x + (sigma_next - sigma) * v.

    The model predicts the flow velocity v = x1 - x0 (noise minus data), so
    stepping toward sigma=0 integrates to the clean image.  Computed in
    float32 like the reference scheduler, cast back to the latent dtype.
    """
    out = latents.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(
        jnp.float32
    )
    return out.astype(latents.dtype)


def flow_match_xt(
    x0: jnp.ndarray, x1: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Training-time interpolant x_t = (1-t) x0 + t x1
    (reference: src/train/model.py:594-597)."""
    t = t.reshape(t.shape[0], *([1] * (x0.ndim - 1)))
    return (1.0 - t) * x0 + t * x1
