"""DGF (Dynamic Gated Fusion): DUAN adaptive normalisation + fusion MLPs.

TPU-native re-implementation of the reference's DUAN module and fusion path
(/root/reference/src/train/model.py:947-1034 and :430-454, :680-698,
:731-779).  DUAN = Dynamic Unified Adaptive Normalisation:

  1. per-channel (instance) and per-layer statistics of the content x;
  2. a sigmoid gate net on the condition c mixes the two statistics;
  3. condition-pooled gamma/beta modulation;
  4. dynamic top-k channel mask (keep_ratio of channels by mean |y|).

All statistics run in float32 (the reference casts to .float() too,
model.py:995).  The top-k mask is hard on BOTH passes: masked channels get
exactly-zero gradients, matching the reference's scatter of constants
(model.py:1026-1033) — the mask itself is stop-gradiented so no gradient
flows through the importance ranking.

The fusion wiring has a documented train/infer asymmetry in the reference
(SURVEY.md §2b): training fuses DUAN output through concat+linear+residual
(model.py:680-698) while inference applies DUAN directly with swapped
argument order (generate.py:242-255).  Both paths are implemented explicitly
(``fuse_text_train`` / ``fuse_text_infer``) so the behaviour is a config
choice rather than an accident.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.ops.nn import Params, init_linear, linear


# ---------------------------------------------------------------------------
# DUAN
# ---------------------------------------------------------------------------


def init_duan(key, channels: int, hidden_dim: int = 128, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        # gate: pointwise convs over the channel axis == per-position linears
        "gate_in": init_linear(ks[0], channels, hidden_dim, dtype=dtype),
        "gate_out": init_linear(ks[1], hidden_dim, channels, dtype=dtype),
        # gamma/beta generator on the pooled condition
        "mlp_in": init_linear(ks[2], channels, hidden_dim, dtype=dtype),
        "mlp_out": init_linear(ks[3], hidden_dim, 2 * channels, dtype=dtype),
    }


def duan_apply(
    params: Params,
    x: jnp.ndarray,
    c: jnp.ndarray,
    keep_ratio: float = 0.7,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """x, c: [B, C, L] content / condition features -> [B, C, L].

    Matches the reference's forward exactly (model.py:989-1034) with fp32
    internals and the same eps placement (sqrt(var + eps)).
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    c = c.astype(jnp.float32)
    b, ch, length = x.shape

    # 1. statistics
    mu_c = jnp.mean(x, axis=2, keepdims=True)  # [B, C, 1]
    var_c = jnp.var(x, axis=2, keepdims=True)
    sigma_c = jnp.sqrt(var_c + eps)
    mu_l = jnp.mean(x, axis=(1, 2), keepdims=True)  # [B, 1, 1]
    var_l = jnp.var(x, axis=(1, 2), keepdims=True)
    sigma_l = jnp.sqrt(var_l + eps)

    # 2. gated mixing: gate is a pointwise 2-layer net over channels applied
    # per position, then averaged over length (== reference's
    # gate(c).mean(dim=2)).
    g = c.transpose(0, 2, 1)  # [B, L, C]
    g = jax.nn.relu(linear(params["gate_in"], g))
    g = jax.nn.sigmoid(linear(params["gate_out"], g))
    g_mix = jnp.mean(g, axis=1)[:, :, None]  # [B, C, 1]
    mu = g_mix * mu_c + (1.0 - g_mix) * mu_l
    sigma = g_mix * sigma_c + (1.0 - g_mix) * sigma_l
    x_hat = (x - mu) / sigma

    # 3. gamma/beta from the pooled condition
    cond_pool = jnp.mean(c, axis=2)  # [B, C]
    gb = linear(params["mlp_out"], jax.nn.relu(linear(params["mlp_in"], cond_pool)))
    gamma, beta = jnp.split(gb, 2, axis=-1)  # [B, C] each
    y = (1.0 + gamma[:, :, None]) * x_hat + beta[:, :, None]

    # 4. dynamic top-k channel mask — EXACTLY k channels kept like the
    # reference's torch.topk scatter (model.py:1026-1033; a >=threshold test
    # would keep every tied channel).  Hard mask on both passes: masked
    # channels get zero gradient, same as the reference.
    imp = jnp.mean(jnp.abs(y), axis=2)  # [B, C]
    k = max(1, int(ch * keep_ratio))
    _, top_idx = jax.lax.top_k(imp, k)  # [B, k] channel indices
    mask = (
        jnp.zeros((imp.shape[0], ch), y.dtype)
        .at[jnp.arange(imp.shape[0])[:, None], top_idx]
        .set(1.0)
    )
    y = y * jax.lax.stop_gradient(mask)[:, :, None]

    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# DGF fusion params: duan norms + fusion linears (reference model.py:430-454)
# ---------------------------------------------------------------------------


def init_dgf(key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "duan_signal": init_duan(ks[0], channels=512, dtype=dtype),   # duan_norm1
        "duan_pooled_sig": init_duan(ks[1], channels=1, dtype=dtype),  # duan_norm2
        "duan_prompt": init_duan(ks[2], channels=512, dtype=dtype),
        "duan_pooled": init_duan(ks[3], channels=1, dtype=dtype),
        "fusion_signal": init_linear(ks[4], 1024, 512, dtype=dtype),   # fusion1
        "fusion_pooled_sig": init_linear(ks[5], 1536, 768, dtype=dtype),  # fusion2
        "fusion_prompt": init_linear(ks[6], 1024, 512, dtype=dtype),   # fusion3
        "fusion_pooled": init_linear(ks[7], 1536, 768, dtype=dtype),   # fusion4
    }


def fuse_eeg_ppg(
    params: Params, eeg_feat: jnp.ndarray, ppg_feat: jnp.ndarray
) -> jnp.ndarray:
    """EEG [B,512,4096] + PPG [B,512,4096] -> brain prompt embeds [B,512,4096]
    (reference fuse_eeg, model.py:731-755: DUAN(ppg, eeg) -> concat on the
    token axis -> linear back to 512 tokens)."""
    fused = duan_apply(params["duan_signal"], ppg_feat, eeg_feat)
    cat = jnp.concatenate([eeg_feat, fused], axis=1)  # [B, 1024, 4096]
    out = linear(params["fusion_signal"], cat.transpose(0, 2, 1))
    return out.transpose(0, 2, 1)  # [B, 512, 4096]


def fuse_fnirs_motion(
    params: Params, fnirs_feat: jnp.ndarray, motion_feat: jnp.ndarray
) -> jnp.ndarray:
    """fNIRS [B,768] + Motion [B,768] -> brain pooled embeds [B,768]
    (reference fuse_fnirs, model.py:757-779)."""
    f = fnirs_feat[:, None, :]  # [B, 1, 768]
    m = motion_feat[:, None, :]
    fused = duan_apply(params["duan_pooled_sig"], f, m)
    cat = jnp.concatenate([f, fused], axis=-1)  # [B, 1, 1536]
    return linear(params["fusion_pooled_sig"], cat)[:, 0]  # [B, 768]


def fuse_text_train(
    params: Params,
    prompt_embeds: jnp.ndarray,
    pooled_embeds: jnp.ndarray,
    brain_prompt: jnp.ndarray,
    brain_pooled: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training-path fusion (reference model.py:680-698): DUAN(brain, text)
    -> concat -> fusion linear -> residual add onto the text embeds.

    ``brain_pooled=None`` (fNIRS absent in the sample — reference guards
    'FNIRS' in bio_data, data.py:81) skips the pooled-fusion branch entirely
    and returns ``pooled_embeds`` unchanged — no placeholder DUAN compute."""
    fused_p = duan_apply(params["duan_prompt"], brain_prompt, prompt_embeds)
    cat = jnp.concatenate([prompt_embeds, fused_p], axis=1)  # [B,1024,4096]
    delta = linear(params["fusion_prompt"], cat.transpose(0, 2, 1)).transpose(0, 2, 1)
    prompt_out = prompt_embeds + delta

    if brain_pooled is None:
        return prompt_out, pooled_embeds
    p = pooled_embeds[:, None, :]
    bp = brain_pooled[:, None, :]
    fused_pool = duan_apply(params["duan_pooled"], bp, p)[:, 0]  # [B,768]
    cat_pool = jnp.concatenate([pooled_embeds, fused_pool], axis=-1)
    pooled_out = pooled_embeds + linear(params["fusion_pooled"], cat_pool)
    return prompt_out, pooled_out


def fuse_text_infer(
    params: Params,
    prompt_embeds: jnp.ndarray,
    pooled_embeds: jnp.ndarray,
    brain_prompt: jnp.ndarray,
    brain_pooled: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-path fusion (reference generate.py:240-255): DUAN applied
    directly with (text, brain) argument order, no concat/residual."""
    prompt_out = duan_apply(params["duan_prompt"], prompt_embeds, brain_prompt)
    pooled_out = duan_apply(
        params["duan_pooled"], pooled_embeds[:, None, :], brain_pooled[:, None, :]
    )[:, 0]
    return prompt_out, pooled_out
