"""CS3 (Cross-Scale State Space) biosignal encoders.

TPU-native re-implementation of the reference's EEG/PPG/fNIRS/Motion encoders
(/root/reference/src/train/model.py:16-343): per modality, S4 state-space
stacks over the raw signal + multi-scale feature-pyramid pooling, concatenated
and projected to the text-embedding spaces —

  * EEG  [B, 4, 4096]  -> [B, 512, 4096]  (T5 prompt-embed shape)
  * PPG  [B, 4, 256]   -> [B, 512, 4096]
  * fNIRS[B, 6, 512]   -> [B, 768]        (CLIP pooled shape)
  * Motion[B, 6, 128]  -> [B, 768]

Exact feature-dimension arithmetic mirrors the reference so converted
checkpoints remain loadable; the S4 core is our S4D/Pallas implementation
(ops/s4.py), not a torch port.  SSM math runs fp32; projections run in the
requested compute dtype.

Note on the reference's train/infer asymmetry: ``generate()`` calls these
encoders on ``signal.flatten(1)`` (2-D) while training passes [B, C, L]
(SURVEY.md §2b).  We accept both and canonicalise to [B, C, L], fixing the
upstream crash deliberately.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import (
    Params,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from loongx_tpu.ops.pooling import (
    adaptive_avg_pool1d,
    feature_pyramid_pooling,
    spatial_pyramid_pooling,
)
from loongx_tpu.ops.s4 import init_s4_stack, s4_stack_apply

# Fixed post-SPP lengths per modality (reference: model.py:417-420).
FIXED_LENGTHS = {"eeg": 4096, "fnirs": 512, "ppg": 256, "motion": 128}
# Channel counts per modality.
CHANNELS = {"eeg": 4, "fnirs": 6, "ppg": 4, "motion": 6}


def canonicalise_signal(x: jnp.ndarray, modality: str) -> jnp.ndarray:
    """Accept [B, C, L], [C, L], or [B, C*L] and return [B, C, L_fixed].

    CAUTION — the 2-D layouts are ambiguous when a batch of flattened
    signals happens to have B == C (e.g. 4 flattened EEG rows [4, C*L]):
    the [C, L] single-sample reading wins whenever the leading dim equals
    the modality's channel count, because single raw recordings [C, L_any]
    are the common call and a flattened batch cannot be told apart by
    shape.  Pass the explicit [B, C, L] layout for batches."""
    c = CHANNELS[modality]
    fixed = FIXED_LENGTHS[modality]
    if x.ndim == 2:
        if x.shape[0] == c:  # [C, L] -> add batch (see CAUTION above)
            x = x[None]
        else:  # [B, C*L] flattened (reference generate.py:215-231 path)
            if x.shape[1] % c != 0:
                raise ValueError(
                    f"cannot interpret {modality} signal of shape {x.shape}: "
                    f"neither [C={c}, L] nor [B, C*L]"
                )
            x = x.reshape(x.shape[0], c, -1)
    return spatial_pyramid_pooling(x, fixed)


def _mlp_ln_relu(key, dims, dtype) -> Params:
    """Linear->LN->ReLU stack params (dropout is inference-off; training adds
    it functionally via rng)."""
    keys = jax.random.split(key, len(dims) - 1)
    p: Params = {}
    for i in range(len(dims) - 1):
        p[f"linear_{i}"] = init_linear(keys[i], dims[i], dims[i + 1], dtype=dtype)
        p[f"ln_{i}"] = init_layer_norm(dims[i + 1], dtype)
    return p


def _apply_mlp_ln_relu(
    p: Params, x: jnp.ndarray, n: int, dropout_rate: float,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    for i in range(n):
        x = linear(p[f"linear_{i}"], x)
        x = layer_norm(x, p[f"ln_{i}"]["weight"], p[f"ln_{i}"]["bias"], eps=1e-5)
        x = jax.nn.relu(x)
        if rng is not None and dropout_rate > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    return x


# ---------------------------------------------------------------------------
# EEG encoder: two-scale S4 + FPP -> [B, 512, 4096]
# ---------------------------------------------------------------------------


def init_eeg_encoder(key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 5)
    return {
        # wide S4: d_model 64, pooled to 4 per-channel features
        "s4_wide": init_s4_stack(ks[0], 4, 64, 64, n_blocks=2, n_state=64),
        # narrow S4: d_model 4, pooled to 64
        "s4_narrow": init_s4_stack(ks[1], 4, 4, 4, n_blocks=2, n_state=4),
        "proj": _mlp_ln_relu(ks[2], [4 * 4096, 2048, 4096], dtype),
        "token_proj": init_linear(ks[3], 8, 4096, dtype=dtype),
    }


def eeg_encode(
    params: Params, x: jnp.ndarray, rng: Optional[jax.Array] = None,
    s4_mode: str = "conv",
) -> jnp.ndarray:
    """x: EEG signal (canonicalised to [B, 4, 4096]) -> [B, 512, 4096]."""
    x = canonicalise_signal(x, "eeg")
    b = x.shape[0]
    u = x.transpose(0, 2, 1)  # [B, L, C]
    # wide path: [B, L, 64] -> pool length-wise per feature to 4 -> [B, 4, 64]
    z1 = s4_stack_apply(params["s4_wide"], u, s4_mode)  # [B, 4096, 64]
    z1 = adaptive_avg_pool1d(z1.transpose(0, 2, 1), 4)  # [B, 64, 4]
    z1 = z1.transpose(0, 2, 1)  # [B, 4, 64]
    # narrow path: [B, L, 4] -> [B, 4, 4096] -> pool to 64 -> [B, 4, 64]
    z2 = s4_stack_apply(params["s4_narrow"], u, s4_mode)  # [B, 4096, 4]
    z2 = adaptive_avg_pool1d(z2.transpose(0, 2, 1), 64)  # [B, 4, 64]
    # multi-scale pyramid: [B, 4, 128+256+512+1024+2048 = 3968]
    fpp = feature_pyramid_pooling(x, (128, 256, 512, 1024, 2048))
    combined = jnp.concatenate([z1, fpp, z2], axis=-1)  # [B, 4, 4096]
    h = _apply_mlp_ln_relu(
        params["proj"], combined.reshape(b, -1), 2, 0.3, rng
    )  # [B, 4096]
    h = h.reshape(b, 512, 8)
    return linear(params["token_proj"], h)  # [B, 512, 4096]


# ---------------------------------------------------------------------------
# PPG encoder -> [B, 512, 4096]
# ---------------------------------------------------------------------------


def init_ppg_encoder(key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "s4": init_s4_stack(ks[0], 4, 4, 4, n_blocks=2, n_state=4),
        "proj": _mlp_ln_relu(ks[1], [4 * 16 + 448 * 4, 1024, 4096], dtype),
        "token_proj": init_linear(ks[2], 8, 4096, dtype=dtype),
    }


def ppg_encode(
    params: Params, x: jnp.ndarray, rng: Optional[jax.Array] = None,
    s4_mode: str = "conv",
) -> jnp.ndarray:
    x = canonicalise_signal(x, "ppg")  # [B, 4, 256]
    b = x.shape[0]
    z = s4_stack_apply(params["s4"], x.transpose(0, 2, 1), s4_mode)  # [B,256,4]
    z = adaptive_avg_pool1d(z.transpose(0, 2, 1), 16)  # [B, 4, 16]
    fpp = feature_pyramid_pooling(x, (64, 128, 256))  # [B, 4, 448]
    combined = jnp.concatenate([z.reshape(b, -1), fpp.reshape(b, -1)], axis=-1)
    h = _apply_mlp_ln_relu(params["proj"], combined, 2, 0.3, rng)  # [B, 4096]
    return linear(params["token_proj"], h.reshape(b, 512, 8))


# ---------------------------------------------------------------------------
# fNIRS encoder -> [B, 768]
# ---------------------------------------------------------------------------


def init_fnirs_encoder(key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 2)
    return {
        "s4": init_s4_stack(ks[0], 6, 6, 6, n_blocks=2, n_state=6),
        "proj": _mlp_ln_relu(ks[1], [6 * 32 + 832 * 6, 1024, 768], dtype),
    }


def fnirs_encode(
    params: Params, x: jnp.ndarray, rng: Optional[jax.Array] = None,
    s4_mode: str = "conv",
) -> jnp.ndarray:
    x = canonicalise_signal(x, "fnirs")  # [B, 6, 512]
    b = x.shape[0]
    z = s4_stack_apply(params["s4"], x.transpose(0, 2, 1), s4_mode)
    z = adaptive_avg_pool1d(z.transpose(0, 2, 1), 32)  # [B, 6, 32]
    fpp = feature_pyramid_pooling(x, (128, 256, 448))  # [B, 6, 832]
    combined = jnp.concatenate([z.reshape(b, -1), fpp.reshape(b, -1)], axis=-1)
    return _apply_mlp_ln_relu(params["proj"], combined, 2, 0.3, rng)


# ---------------------------------------------------------------------------
# Motion encoder -> [B, 768]
# ---------------------------------------------------------------------------


def init_motion_encoder(key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 2)
    return {
        "s4": init_s4_stack(ks[0], 6, 6, 6, n_blocks=2, n_state=6),
        "proj": _mlp_ln_relu(ks[1], [6 * 6 + 220 * 6, 512, 768], dtype),
    }


def motion_encode(
    params: Params, x: jnp.ndarray, rng: Optional[jax.Array] = None,
    s4_mode: str = "conv",
) -> jnp.ndarray:
    x = canonicalise_signal(x, "motion")  # [B, 6, 128]
    b = x.shape[0]
    z = s4_stack_apply(params["s4"], x.transpose(0, 2, 1), s4_mode)
    z = adaptive_avg_pool1d(z.transpose(0, 2, 1), 6)  # [B, 6, 6]
    fpp = feature_pyramid_pooling(x, (32, 64, 124))  # [B, 6, 220]
    combined = jnp.concatenate([z.reshape(b, -1), fpp.reshape(b, -1)], axis=-1)
    return _apply_mlp_ln_relu(params["proj"], combined, 2, 0.3, rng)


ENCODERS = {
    "eeg": (init_eeg_encoder, eeg_encode),
    "ppg": (init_ppg_encoder, ppg_encode),
    "fnirs": (init_fnirs_encoder, fnirs_encode),
    "motion": (init_motion_encoder, motion_encode),
}
