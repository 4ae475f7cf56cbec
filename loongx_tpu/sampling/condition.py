"""Condition abstraction: spatial-control / subject / biosignal conditions.

Equivalent of the reference's ``Condition`` class
(/root/reference/src/flux/condition.py): maps a condition type to an integer
type id, synthesises the condition image on the host (canny / grayscale /
blur / fill / sr — cheap cv2/PIL work off the hot path), and encodes it to
VAE latent tokens + RoPE ids with position_delta / position_scale transforms.

Host-side image work stays in numpy/PIL (SURVEY §2c: off the hot path);
encoding runs through the jitted VAE.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from loongx_tpu.ops.latents import pack_latents, latent_image_ids, shift_ids

# Type-id registry (matches reference condition_dict, condition.py:10-21).
CONDITION_TYPE_IDS = {
    "depth": 0,
    "canny": 1,
    "subject": 4,
    "coloring": 6,
    "deblurring": 7,
    "depth_pred": 8,
    "fill": 9,
    "sr": 10,
    "cartoon": 11,
    "eeg+fnirs": 12,
}

_IMAGE_CONDITION_TYPES = (
    "depth", "canny", "subject", "coloring", "deblurring", "depth_pred",
    "fill", "sr", "cartoon",
    # SEED editing: the SOURCE image is the spatial condition (type id 12);
    # the reference encodes it to latent tokens like any other condition
    # image (condition.py:106-138, SeedDataset data.py:78-97) while the
    # biosignals ride separately through the CS3 encoders
    "eeg+fnirs",
)


def _to_numpy_image(img) -> np.ndarray:
    """PIL.Image | np.ndarray [H,W,3] uint8 -> float32 [-1, 1] NHWC."""
    if hasattr(img, "convert"):  # PIL
        img = np.asarray(img.convert("RGB"))
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 127.5 - 1.0
    return img.astype(np.float32)


def synthesize_condition_image(condition_type: str, raw_img) -> Any:
    """Host-side synthesis of the condition image from a raw PIL image
    (reference condition.py:53-90; dataset variants data.py:255-297)."""
    from PIL import Image, ImageFilter

    if condition_type == "canny":
        import cv2

        edges = cv2.Canny(np.asarray(raw_img.convert("RGB")), 100, 200)
        return Image.fromarray(edges).convert("RGB")
    if condition_type == "coloring":
        return raw_img.convert("L").convert("RGB")
    if condition_type == "deblurring":
        return raw_img.convert("RGB").filter(ImageFilter.GaussianBlur(10))
    if condition_type == "sr":
        w, h = raw_img.size
        return raw_img.resize((w // 4, h // 4)).resize((w, h))
    if condition_type in ("subject", "fill", "cartoon"):
        return raw_img.convert("RGB")
    if condition_type in ("depth", "depth_pred"):
        import os

        # in-framework JAX Depth-Anything for local checkouts
        # ($LOONGX_DEPTH_MODEL); HF torch pipeline fallback for hub ids
        from loongx_tpu.models.depth import depth_estimator

        try:
            est = depth_estimator()
        except Exception as exc:  # no weights in zero-egress envs
            hint = (
                "failed to load the depth-estimation model from "
                f"$LOONGX_DEPTH_MODEL={os.environ['LOONGX_DEPTH_MODEL']!r} "
                "(unsupported variant or malformed checkpoint? see chained "
                "cause)"
                if os.environ.get("LOONGX_DEPTH_MODEL")
                else "depth condition requires a local depth-estimation "
                "model (point $LOONGX_DEPTH_MODEL at an HF checkout of "
                "depth-anything)"
            )
            raise RuntimeError(hint) from exc
        return est(raw_img.convert("RGB"))["depth"].convert("RGB")
    return raw_img


@dataclasses.dataclass
class Condition:
    """One condition attached to a generation call.

    Either ``raw_img`` (condition image synthesised from it) or ``condition``
    (precomputed condition image / array) must be given for image-typed
    conditions.  Biosignals ride along as raw arrays (encoded separately by
    the CS3 encoders).
    """

    condition_type: str
    raw_img: Any = None
    condition: Any = None
    position_delta: Optional[Tuple[int, int]] = None
    position_scale: float = 1.0
    eeg: Optional[np.ndarray] = None
    fnirs: Optional[np.ndarray] = None
    ppg: Optional[np.ndarray] = None
    motion: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.condition_type not in CONDITION_TYPE_IDS:
            raise ValueError(
                f"unknown condition type {self.condition_type!r}; "
                f"known: {sorted(CONDITION_TYPE_IDS)}"
            )
        if self.condition is None and self.raw_img is not None:
            self.condition = synthesize_condition_image(
                self.condition_type, self.raw_img
            )

    @property
    def type_id(self) -> int:
        return CONDITION_TYPE_IDS[self.condition_type]

    @staticmethod
    def get_type_id(condition_type: str) -> int:
        return CONDITION_TYPE_IDS[condition_type]

    def encode(
        self, pipeline, key=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Encode the condition image -> (tokens [B,S,C*4], ids [S,3],
        type_ids [S,1]) via the pipeline's VAE (reference
        condition.py:106-138).  With ``key`` the latent dist is sampled like
        the reference's encode_images (pipeline_tools.py:7-30, seeded
        generator); without it the deterministic mean is used."""
        if self.condition_type not in _IMAGE_CONDITION_TYPES:
            raise NotImplementedError(
                f"condition type {self.condition_type!r} has no latent encoding"
            )
        img = _to_numpy_image(self.condition)[None]  # [1, H, W, 3]
        tokens, h, w = pipeline.encode_image_tokens(jnp.asarray(img), key=key)
        ids = latent_image_ids(h, w)
        delta = self.position_delta
        if delta is None and self.condition_type == "subject":
            # subject conditions sit beside the target canvas by default
            delta = (0, -img.shape[2] // 16)
        ids = shift_ids(ids, delta or (0, 0), self.position_scale)
        type_ids = jnp.full((ids.shape[0], 1), self.type_id, jnp.float32)
        return tokens, ids, type_ids
