"""Batch preparation: host samples -> device-ready train_step inputs.

Equivalent of the reference's no-grad region in ``OminiModel.step``
(/root/reference/src/train/model.py:584-654): VAE-encode target + condition
images, T5/CLIP-encode prompts, SPP-normalise biosignals, apply condition-id
position transforms.  All array work happens in ONE jitted function per
shape so the frozen encoders run on-device at full speed.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.models.encoders import FIXED_LENGTHS, canonicalise_signal
from loongx_tpu.models.flux.vae import vae_encode, scale_latents
from loongx_tpu.ops.latents import pack_latents, latent_image_ids, shift_ids
from loongx_tpu.sampling.condition import Condition


@partial(jax.jit, static_argnames=("vae_cfg",))
def _encode_images_jit(vae_params, vae_cfg, images):
    mean, _ = vae_encode(vae_params, vae_cfg, images)
    return pack_latents(scale_latents(vae_cfg, mean))


def build_text_cache(pipeline, descriptions, chunk: int = 8):
    """Pre-encode every prompt the dataset can emit (staged-text training).

    Returns ``({prompt: (embeds [S,D], pooled [D])}, txt_ids)`` as host
    numpy — the text encoders can then be freed before the DiT is loaded.
    This is the training mirror of the serving staging recipe
    (cli/infer.staged_text_encode, docs/WEIGHTS.md): at the 12B scale the
    int8 flux tree (11.1 GiB) and int8 T5-XXL (~4.7 GiB) cannot be
    co-resident on one ~14 GiB chip, and unlike serving, training needs
    text embeds on EVERY step (fuse_flag=True).  Cached rows are exactly
    what ``encode_text`` returns (fixed-length padding makes each row
    independent of chunk composition), so staged training matches resident
    training bit for bit (tests/test_train_loop.py)."""
    # "" is always cached: prompt-dropout / missing descriptions fall back
    # to the empty prompt
    uniq = sorted(set(descriptions) | {""})
    cache: Dict[str, tuple] = {}
    txt_ids = None
    for s in range(0, len(uniq), chunk):
        batch = uniq[s : s + chunk]
        emb, pooled, ids = pipeline.encode_text(batch)
        emb, pooled = np.asarray(emb), np.asarray(pooled)
        for i, d in enumerate(batch):
            cache[d] = (emb[i], pooled[i])
        txt_ids = np.asarray(ids)
    return cache, txt_ids


def prepare_batch(
    pipeline,
    host_batch: Dict[str, Any],
    position_scale: float = 1.0,
    text_cache=None,
) -> Dict[str, Any]:
    """host_batch (from data.loader): images in [0,1] float32 NHWC, raw
    biosignals, descriptions.  Returns the train_step batch dict."""
    dtype = pipeline.dtype
    imgs = jnp.asarray(host_batch["image"]) * 2.0 - 1.0
    conds = jnp.asarray(host_batch["condition"]) * 2.0 - 1.0
    lat_h = imgs.shape[1] // pipeline.vae_cfg.downscale
    lat_w = imgs.shape[2] // pipeline.vae_cfg.downscale

    x0 = _encode_images_jit(
        pipeline.params["vae"], pipeline.vae_cfg, imgs.astype(dtype)
    )
    cond_tokens = _encode_images_jit(
        pipeline.params["vae"], pipeline.vae_cfg, conds.astype(dtype)
    )
    img_ids = latent_image_ids(lat_h, lat_w)
    c_h = conds.shape[1] // pipeline.vae_cfg.downscale
    c_w = conds.shape[2] // pipeline.vae_cfg.downscale
    delta = host_batch.get("position_delta")
    delta = (0, 0) if delta is None else tuple(np.asarray(delta)[0].tolist())
    cond_ids = shift_ids(latent_image_ids(c_h, c_w), delta, position_scale)

    prompts = host_batch.get("description", [""] * imgs.shape[0])
    if text_cache is not None:
        cache, cached_ids = text_cache
        try:
            prompt_embeds = jnp.asarray(np.stack([cache[p][0] for p in prompts]))
            pooled = jnp.asarray(np.stack([cache[p][1] for p in prompts]))
        except KeyError as exc:
            raise KeyError(
                f"staged-text cache has no entry for prompt {exc}: the "
                "cache was built from dataset.descriptions() — a dataset "
                "emitting prompts outside that set cannot train staged"
            ) from None
        txt_ids = jnp.asarray(cached_ids)
    else:
        prompt_embeds, pooled, txt_ids = pipeline.encode_text(prompts)

    batch = {
        "x0": x0.astype(jnp.float32),
        "img_ids": img_ids,
        "txt_ids": txt_ids,
        "prompt_embeds": prompt_embeds,
        "pooled": pooled,
        "cond_tokens": cond_tokens,
        "cond_ids": cond_ids,
    }
    for name in ("eeg", "fnirs", "ppg", "motion"):
        if host_batch.get(name) is not None:
            sig = jnp.asarray(host_batch[name], jnp.float32)
            batch[name] = canonicalise_signal(sig, name)
    return batch
