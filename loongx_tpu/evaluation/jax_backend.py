"""In-framework CLIP backends for the eval harness.

Replaces the torch CLIPModel the reference eval loads (test.py:85-146) with
our JAX CLIP text + vision towers, so CLIP-I / CLIP-T run on TPU with no
torch dependency.  Build from a converted checkpoint dir (cli/convert with
--clip_vision) or pass param trees directly.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.models.text.clip import CLIPTextConfig, clip_text_features
from loongx_tpu.models.text.clip_vision import (
    CLIPVisionConfig, clip_vision_encode, clip_preprocess,
)


def make_jax_clip_backend(
    text_params,
    text_cfg: CLIPTextConfig,
    vision_params,
    vision_cfg: CLIPVisionConfig,
    tokenizer,
    batch_size: int = 16,
) -> Tuple[Callable, Callable]:
    """Returns (image_embed(paths) -> [N, D], text_embed(texts) -> [N, D])."""
    # bundles store numpy leaves (pickle-portable); the towers index the
    # embedding tables with traced ids, which requires jnp arrays
    text_params = jax.tree.map(jnp.asarray, text_params)
    vision_params = jax.tree.map(jnp.asarray, vision_params)

    @jax.jit
    def _img_fn(images):
        return clip_vision_encode(
            vision_params, vision_cfg,
            clip_preprocess(images, vision_cfg.image_size),
        )

    @jax.jit
    def _txt_fn(ids):
        return clip_text_features(text_params, text_cfg, ids)

    def image_embed(paths: Sequence[str]) -> np.ndarray:
        from PIL import Image

        out = []
        for start in range(0, len(paths), batch_size):
            chunk = paths[start : start + batch_size]
            imgs = np.stack([
                np.asarray(
                    Image.open(p).convert("RGB").resize(
                        (vision_cfg.image_size, vision_cfg.image_size)
                    ),
                    np.float32,
                ) / 255.0
                for p in chunk
            ])
            out.append(np.asarray(_img_fn(jnp.asarray(imgs))))
        return np.concatenate(out)

    def text_embed(texts: Sequence[str]) -> np.ndarray:
        ids = tokenizer(
            list(texts), padding="max_length",
            max_length=min(77, text_cfg.max_positions), truncation=True,
            return_tensors="np",
        ).input_ids
        return np.asarray(_txt_fn(jnp.asarray(ids)))

    return image_embed, text_embed


def make_jax_dino_backend(vit_params, vit_cfg, batch_size: int = 16):
    """DINO CLS-feature image embedder (torch-free DINO-I) from a converted
    HF ViT checkpoint (utils/convert.convert_vit_state)."""
    from loongx_tpu.models.vision import vit_encode, vit_preprocess

    @jax.jit
    def _fn(images):
        return vit_encode(
            vit_params, vit_cfg, vit_preprocess(images, vit_cfg.image_size)
        )

    def image_embed(paths: Sequence[str]) -> np.ndarray:
        from PIL import Image

        out = []
        for start in range(0, len(paths), batch_size):
            chunk = paths[start : start + batch_size]
            imgs = np.stack([
                np.asarray(
                    Image.open(p).convert("RGB").resize(
                        (vit_cfg.image_size, vit_cfg.image_size)
                    ), np.float32,
                ) / 255.0
                for p in chunk
            ])
            out.append(np.asarray(_fn(jnp.asarray(imgs))))
        return np.concatenate(out)

    return image_embed
