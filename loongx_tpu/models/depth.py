"""In-framework Depth-Anything depth estimator (JAX/XLA).

TPU-native replacement for the HF torch depth-estimation pipeline the
reference invokes to synthesise depth / depth_pred condition images
(/root/reference/src/flux/condition.py:59-75 and
/root/reference/src/train/data.py:271-277, both loading
``LiheYoung/depth-anything-small-hf``).  Follows the same in-framework
pattern as the JAX Whisper/Marian/CLIP towers: a from-scratch functional
model + a golden-tested checkpoint converter
(``utils/convert.convert_depth_anything_state``), so a local HF checkout
of the depth-anything weights runs without torch.

Architecture (Depth Anything = DINOv2 backbone + DPT decoder):

* DINOv2 ViT backbone: patch-14 conv embedding, [CLS] token, learned
  absolute position embeddings (bicubic-interpolated in fp32 for input
  grids other than the trained one), pre-LN transformer blocks with
  per-branch layer-scale, exact-erf GELU MLP.  Hidden states are
  collected after the layers named by ``out_indices`` and passed through
  the backbone's final LayerNorm.
* DPT reassemble stage: drop [CLS], reshape tokens to an image grid,
  1x1-project to per-stage channel counts, then rescale by the stage
  factor (4x / 2x transposed conv, identity, or 0.5x strided conv).
* DPT feature-fusion stage: coarsest-first residual fusion with
  pre-activation residual conv units and align_corners=True bilinear
  upsampling between stages.
* Depth head: 3 convs with a bilinear upsample to the pixel grid;
  ReLU output for relative depth (sigmoid * max_depth for metric).

Interpolation helpers reproduce torch's conventions exactly (bilinear
align_corners True/False; bicubic A=-0.75 half-pixel) so converted
checkpoints match the torch reference to float tolerance — see
tests/test_depth.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    # DINOv2 backbone
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 518  # training grid for the position embeddings
    layer_norm_eps: float = 1e-6
    out_indices: Tuple[int, ...] = (9, 10, 11, 12)  # 1-based layer numbers
    # DPT neck + head
    neck_hidden_sizes: Tuple[int, ...] = (48, 96, 192, 384)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    head_in_index: int = -1
    depth_estimation_type: str = "relative"  # or "metric"
    max_depth: float = 1.0

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def from_hf_config(cfg: dict) -> "DepthAnythingConfig":
        """Build from a parsed HF ``config.json`` (DepthAnythingConfig)."""
        bb = cfg["backbone_config"]
        return DepthAnythingConfig(
            hidden_size=bb["hidden_size"],
            num_layers=bb["num_hidden_layers"],
            num_heads=bb["num_attention_heads"],
            mlp_ratio=int(bb.get("mlp_ratio", 4)),
            patch_size=bb.get("patch_size", cfg.get("patch_size", 14)),
            image_size=bb.get("image_size", 518),
            layer_norm_eps=bb.get("layer_norm_eps", 1e-6),
            out_indices=tuple(bb["out_indices"]),
            neck_hidden_sizes=tuple(cfg["neck_hidden_sizes"]),
            reassemble_factors=tuple(cfg["reassemble_factors"]),
            fusion_hidden_size=cfg["fusion_hidden_size"],
            head_hidden_size=cfg["head_hidden_size"],
            head_in_index=cfg.get("head_in_index", -1),
            depth_estimation_type=cfg.get("depth_estimation_type", "relative"),
            max_depth=cfg.get("max_depth", 1.0) or 1.0,
        )


# ---------------------------------------------------------------------------
# torch-convention separable resampling (static shapes; weights built on host)
# ---------------------------------------------------------------------------


def _interp_taps(in_size: int, out_size: int, mode: str, align_corners: bool):
    """1-D resampling taps: (idx [out, taps] int32, w [out, taps] float32).

    Matches torch.nn.functional.interpolate: half-pixel source mapping for
    align_corners=False, endpoint mapping for True; cubic convolution with
    A=-0.75 and border-clamped taps for "cubic"."""
    if align_corners:
        # out_size == 1: torch samples source index 0 (scale is 0/0 there),
        # NOT the half-pixel center
        src = (
            np.arange(out_size) * (in_size - 1) / (out_size - 1)
            if out_size > 1
            else np.zeros(out_size)
        )
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    if mode == "linear":
        src = np.maximum(src, 0.0)
        i0 = np.floor(src)
        t = src - i0
        idx = np.stack([i0, i0 + 1], axis=-1)
        w = np.stack([1.0 - t, t], axis=-1)
    elif mode == "cubic":
        a = -0.75
        i0 = np.floor(src)
        idx = i0[:, None] + np.array([-1.0, 0.0, 1.0, 2.0])[None, :]
        x = np.abs(idx - src[:, None])
        w = np.where(
            x <= 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, a * (((x - 5.0) * x + 8.0) * x - 4.0), 0.0),
        )
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    idx = np.clip(idx, 0, in_size - 1).astype(np.int32)
    return idx, w.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "linear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC ``x`` to ``out_hw`` with torch interpolation semantics."""
    ih, iw = int(x.shape[1]), int(x.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (ih, iw) == (oh, ow):
        return x
    dt = x.dtype
    x = x.astype(jnp.float32)
    if ih != oh:
        idx, w = _interp_taps(ih, oh, mode, align_corners)
        x = jnp.einsum("botwc,ot->bowc", x[:, idx], jnp.asarray(w))
    if iw != ow:
        idx, w = _interp_taps(iw, ow, mode, align_corners)
        x = jnp.einsum("bhotc,ot->bhoc", x[:, :, idx], jnp.asarray(w))
    return x.astype(dt)


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------


def _init_lin(key, din, dout, dtype, std=0.02):
    kw, _ = jax.random.split(key)
    return {
        "kernel": (jax.random.normal(kw, (din, dout)) * std).astype(dtype),
        "bias": jnp.zeros((dout,), dtype),
    }


def _init_conv(key, kh, kw_, cin, cout, dtype, bias=True, std=0.02):
    k, _ = jax.random.split(key)
    p = {"kernel": (jax.random.normal(k, (kh, kw_, cin, cout)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _init_ln(c, dtype):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_depth_anything_params(
    key, cfg: DepthAnythingConfig, dtype=jnp.float32
) -> Params:
    c = cfg.hidden_size
    keys = iter(jax.random.split(key, 64 + 8 * cfg.num_layers))

    def nk():
        return next(keys)

    blocks: List[Params] = []
    for _ in range(cfg.num_layers):
        blocks.append(
            {
                "ln1": _init_ln(c, dtype),
                "q": _init_lin(nk(), c, c, dtype),
                "k": _init_lin(nk(), c, c, dtype),
                "v": _init_lin(nk(), c, c, dtype),
                "o": _init_lin(nk(), c, c, dtype),
                "ls1": jnp.ones((c,), dtype),
                "ln2": _init_ln(c, dtype),
                "fc1": _init_lin(nk(), c, c * cfg.mlp_ratio, dtype),
                "fc2": _init_lin(nk(), c * cfg.mlp_ratio, c, dtype),
                "ls2": jnp.ones((c,), dtype),
            }
        )

    fh = cfg.fusion_hidden_size
    reassemble, convs, fusion = [], [], []
    for ch, factor in zip(cfg.neck_hidden_sizes, cfg.reassemble_factors):
        layer: Params = {"proj": _init_conv(nk(), 1, 1, c, ch, dtype)}
        if factor > 1:
            f = int(factor)
            # transposed-conv kernel stored [cin, kh, kw, cout]
            layer["resize"] = {
                "kernel": (
                    jax.random.normal(nk(), (ch, f, f, ch)) * 0.02
                ).astype(dtype),
                "bias": jnp.zeros((ch,), dtype),
            }
        elif factor < 1:
            layer["resize"] = _init_conv(nk(), 3, 3, ch, ch, dtype)
        reassemble.append(layer)
        convs.append(_init_conv(nk(), 3, 3, ch, fh, dtype, bias=False))
        fusion.append(
            {
                "proj": _init_conv(nk(), 1, 1, fh, fh, dtype),
                "res1": {
                    "conv1": _init_conv(nk(), 3, 3, fh, fh, dtype),
                    "conv2": _init_conv(nk(), 3, 3, fh, fh, dtype),
                },
                "res2": {
                    "conv1": _init_conv(nk(), 3, 3, fh, fh, dtype),
                    "conv2": _init_conv(nk(), 3, 3, fh, fh, dtype),
                },
            }
        )

    return {
        "cls": (jax.random.normal(nk(), (1, 1, c)) * 0.02).astype(dtype),
        "pos": (
            jax.random.normal(nk(), (1, cfg.num_positions + 1, c)) * 0.02
        ).astype(dtype),
        "patch": _init_conv(nk(), cfg.patch_size, cfg.patch_size, 3, c, dtype),
        "blocks": blocks,
        "ln": _init_ln(c, dtype),
        "reassemble": reassemble,
        "convs": convs,
        "fusion": fusion,
        "head": {
            "conv1": _init_conv(nk(), 3, 3, fh, fh // 2, dtype),
            "conv2": _init_conv(nk(), 3, 3, fh // 2, cfg.head_hidden_size, dtype),
            "conv3": _init_conv(nk(), 1, 1, cfg.head_hidden_size, 1, dtype),
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def _lin(x, p):
    return x @ p["kernel"] + p["bias"]


def _conv2d(x, p, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"],
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def _conv_transpose_block(x, p):
    """Transposed conv with kernel_size == stride and no padding: each input
    pixel expands to a k x k block (kernel stored [cin, kh, kw, cout])."""
    w = p["kernel"]
    k = int(w.shape[1])
    b, h, wd, _ = x.shape
    y = jnp.einsum("bhwc,cuvo->bhuwvo", x, w)
    y = y.reshape(b, h * k, wd * k, w.shape[-1])
    return y + p["bias"]


def _vit_block(x, p, num_heads, eps):
    b, n, c = x.shape
    hd = c // num_heads

    h = _ln(x, p["ln1"], eps)
    q = _lin(h, p["q"]).reshape(b, n, num_heads, hd)
    k = _lin(h, p["k"]).reshape(b, n, num_heads, hd)
    v = _lin(h, p["v"]).reshape(b, n, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits * (hd**-0.5), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
    x = x + _lin(o, p["o"]) * p["ls1"]

    h = _ln(x, p["ln2"], eps)
    h = _lin(jax.nn.gelu(_lin(h, p["fc1"]), approximate=False), p["fc2"])
    return x + h * p["ls2"]


def _interpolated_pos(params, cfg: DepthAnythingConfig, ph, pw, square):
    pos = params["pos"]
    num_positions = pos.shape[1] - 1
    if ph * pw == num_positions and square:
        return pos
    side = int(round(num_positions**0.5))
    grid = pos[:, 1:].reshape(1, side, side, cfg.hidden_size)
    grid = resize2d(grid, (ph, pw), mode="cubic", align_corners=False)
    grid = grid.reshape(1, ph * pw, cfg.hidden_size)
    return jnp.concatenate([pos[:, :1], grid], axis=1)


def dinov2_features(
    params: Params, cfg: DepthAnythingConfig, pixel_values: jnp.ndarray
) -> List[jnp.ndarray]:
    """DINOv2 backbone: normalized NHWC pixels -> layernormed hidden states
    (with [CLS]) collected after each layer in cfg.out_indices."""
    b, h, w, _ = pixel_values.shape
    p = cfg.patch_size
    ph, pw = h // p, w // p

    x = _conv2d(pixel_values, params["patch"], stride=p, pad=0)
    x = x.reshape(b, ph * pw, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls"], (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolated_pos(params, cfg, ph, pw, square=(h == w)).astype(x.dtype)

    want = set(cfg.out_indices)
    feats = []
    for i, blk in enumerate(params["blocks"]):
        x = _vit_block(x, blk, cfg.num_heads, cfg.layer_norm_eps)
        if (i + 1) in want:
            feats.append(_ln(x, params["ln"], cfg.layer_norm_eps))
    return feats


def _pre_act_residual(x, p):
    h = jax.nn.relu(x)
    h = _conv2d(h, p["conv1"], pad=1)
    h = jax.nn.relu(h)
    h = _conv2d(h, p["conv2"], pad=1)
    return x + h


def depth_anything_forward(
    params: Params, cfg: DepthAnythingConfig, pixel_values: jnp.ndarray
) -> jnp.ndarray:
    """Normalized NHWC pixels [B, H, W, 3] -> predicted depth [B, H, W]."""
    b, h, w, _ = pixel_values.shape
    p = cfg.patch_size
    ph, pw = h // p, w // p

    feats = dinov2_features(params, cfg, pixel_values)

    # reassemble: tokens -> grids at per-stage scales
    grids = []
    for feat, layer, factor in zip(
        feats, params["reassemble"], cfg.reassemble_factors
    ):
        g = feat[:, 1:].reshape(b, ph, pw, cfg.hidden_size)
        g = _conv2d(g, layer["proj"], pad=0)
        if factor > 1:
            g = _conv_transpose_block(g, layer["resize"])
        elif factor < 1:
            g = _conv2d(g, layer["resize"], stride=int(round(1 / factor)), pad=1)
        grids.append(g)
    grids = [_conv2d(g, cv, pad=1) for g, cv in zip(grids, params["convs"])]

    # fusion: coarsest first, upsampling into the next finer stage's grid
    rev = grids[::-1]
    fused_list = []
    fused = None
    for idx, (stage, layer) in enumerate(zip(rev, params["fusion"])):
        size = rev[idx + 1].shape[1:3] if idx + 1 < len(rev) else None
        if fused is None:
            fused = stage
        else:
            if stage.shape != fused.shape:
                stage = resize2d(stage, fused.shape[1:3], "linear", False)
            fused = fused + _pre_act_residual(stage, layer["res1"])
        fused = _pre_act_residual(fused, layer["res2"])
        out_hw = size if size is not None else (
            fused.shape[1] * 2,
            fused.shape[2] * 2,
        )
        fused = resize2d(fused, out_hw, "linear", align_corners=True)
        fused = _conv2d(fused, layer["proj"], pad=0)
        fused_list.append(fused)

    # head
    hd = params["head"]
    y = _conv2d(fused_list[cfg.head_in_index], hd["conv1"], pad=1)
    y = resize2d(y, (ph * p, pw * p), "linear", align_corners=True)
    y = jax.nn.relu(_conv2d(y, hd["conv2"], pad=1))
    y = _conv2d(y, hd["conv3"], pad=0)
    if cfg.depth_estimation_type == "metric":
        y = jax.nn.sigmoid(y) * cfg.max_depth
    else:
        y = jax.nn.relu(y) * cfg.max_depth
    return y[..., 0]


# ---------------------------------------------------------------------------
# estimator wrapper: HF-pipeline-compatible preprocessing / postprocessing
# ---------------------------------------------------------------------------

def _imagenet_mean_std() -> Tuple[np.ndarray, np.ndarray]:
    # single source of truth for the ImageNet stats (models/vision.py)
    from loongx_tpu.models.vision import IMAGENET_MEAN, IMAGENET_STD

    return np.asarray(IMAGENET_MEAN, np.float32), np.asarray(IMAGENET_STD, np.float32)


def _constrain_multiple(val: float, multiple: int, min_val: int = 0) -> int:
    """DPT sizing rule (image_processing_dpt.constrain_to_multiple_of)."""
    x = round(val / multiple) * multiple
    if x < min_val:
        x = int(np.ceil(val / multiple)) * multiple
    return int(x)


def dpt_resize_hw(
    in_h: int,
    in_w: int,
    target,
    multiple: int,
    keep_aspect_ratio: bool = True,
) -> Tuple[int, int]:
    """Output (H, W) per the DPT image processor: scale as little as
    possible toward ``target`` (an int for square, or (H, W)), each dim
    rounded to ``multiple``."""
    t_h, t_w = (target, target) if isinstance(target, int) else target
    scale_h = t_h / in_h
    scale_w = t_w / in_w
    if keep_aspect_ratio:
        if abs(1 - scale_w) < abs(1 - scale_h):
            scale_h = scale_w
        else:
            scale_w = scale_h
    return (
        _constrain_multiple(scale_h * in_h, multiple, min_val=multiple),
        _constrain_multiple(scale_w * in_w, multiple, min_val=multiple),
    )


class DepthAnythingEstimator:
    """Drop-in equivalent of ``hf_pipeline("depth-estimation", ...)`` over a
    LOCAL HF checkout, running the JAX model end to end.

    ``__call__(pil_image)`` returns ``{"predicted_depth": np[H, W],
    "depth": PIL.Image}`` with the pipeline's min-max 0..255 formatting."""

    def __init__(
        self,
        params: Params,
        cfg: DepthAnythingConfig,
        image_mean: Optional[Sequence[float]] = None,
        image_std: Optional[Sequence[float]] = None,
        size=518,
        ensure_multiple_of: int = 14,
        keep_aspect_ratio: bool = True,
        resample: int = 3,  # PIL code: 3 = BICUBIC (the DPT default)
        do_resize: bool = True,
        do_rescale: bool = True,
        rescale_factor: float = 1.0 / 255.0,
        do_normalize: bool = True,
    ):
        mean, std = _imagenet_mean_std()
        self.params = params
        self.cfg = cfg
        self.image_mean = np.asarray(
            mean if image_mean is None else image_mean, np.float32
        )
        self.image_std = np.asarray(
            std if image_std is None else image_std, np.float32
        )
        self.size = size
        self.ensure_multiple_of = ensure_multiple_of
        self.keep_aspect_ratio = keep_aspect_ratio
        self.resample = int(resample)
        self.do_resize = bool(do_resize)
        self.do_rescale = bool(do_rescale)
        self.rescale_factor = float(rescale_factor)
        self.do_normalize = bool(do_normalize)
        # NOTE: the jitted forward specialises on the preprocessed (H, W);
        # mixed-aspect inputs under keep_aspect_ratio each pay one XLA
        # compile for their multiple-of-14 shape bucket (the fixed-size
        # training path compiles once)
        self._fwd = jax.jit(
            functools.partial(depth_anything_forward, cfg=cfg)
        )

    @staticmethod
    def from_pretrained(path: str, dtype=jnp.float32) -> "DepthAnythingEstimator":
        import json
        import os

        from loongx_tpu.utils.convert import (
            convert_depth_anything_state,
            load_torch_or_safetensors_dir,
        )

        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        cfg = DepthAnythingConfig.from_hf_config(hf_cfg)
        state = load_torch_or_safetensors_dir(path)
        params = convert_depth_anything_state(state, cfg, dtype=dtype)

        pp: Dict[str, Any] = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
        size = pp.get("size", {})
        if isinstance(size, dict):
            target = (size.get("height", 518), size.get("width", 518))
        elif isinstance(size, int):
            target = (size, size)
        else:
            target = (518, 518)
        return DepthAnythingEstimator(
            params,
            cfg,
            image_mean=pp.get("image_mean"),
            image_std=pp.get("image_std"),
            size=target,
            ensure_multiple_of=pp.get("ensure_multiple_of", 14),
            keep_aspect_ratio=pp.get("keep_aspect_ratio", True),
            resample=pp.get("resample", 3),
            do_resize=pp.get("do_resize", True),
            do_rescale=pp.get("do_rescale", True),
            rescale_factor=pp.get("rescale_factor", 1.0 / 255.0),
            do_normalize=pp.get("do_normalize", True),
        )

    def predict_depth(self, image) -> np.ndarray:
        """PIL image -> relative depth at the ORIGINAL resolution [H, W]."""
        rgb = image.convert("RGB")
        w0, h0 = rgb.size
        if self.do_resize:
            oh, ow = dpt_resize_hw(
                h0, w0, self.size, self.ensure_multiple_of,
                self.keep_aspect_ratio,
            )
            rgb = rgb.resize((ow, oh), self.resample)
        x = np.asarray(rgb, np.float32)
        if self.do_rescale:
            x = x * self.rescale_factor
        if self.do_normalize:
            x = (x - self.image_mean) / self.image_std
        depth = self._fwd(self.params, pixel_values=jnp.asarray(x[None]))
        # pipeline postprocess: torch-bicubic back to the source resolution
        depth = resize2d(depth[..., None], (h0, w0), "cubic", False)[0, ..., 0]
        return np.asarray(depth)

    def __call__(self, image) -> Dict[str, Any]:
        from PIL import Image

        depth = self.predict_depth(image)
        lo, hi = float(depth.min()), float(depth.max())
        norm = (depth - lo) / (hi - lo) if hi > lo else np.zeros_like(depth)
        return {
            "predicted_depth": depth,
            "depth": Image.fromarray((norm * 255).astype(np.uint8)),
        }


_ESTIMATOR_CACHE: Dict[str, Any] = {}


def depth_estimator(path: Optional[str] = None):
    """Resolve the depth-estimation callable used for depth / depth_pred
    condition synthesis: ``est(pil)["depth"]`` -> PIL depth map.

    A LOCAL HF checkout directory runs the in-framework JAX estimator; a
    hub id falls back to the HF torch pipeline (reference behavior,
    condition.py:59-75 — needs network/weights).  Default path comes from
    $LOONGX_DEPTH_MODEL.  Cached per path."""
    import os

    path = path or os.environ.get(
        "LOONGX_DEPTH_MODEL", "LiheYoung/depth-anything-small-hf"
    )
    if path in _ESTIMATOR_CACHE:
        return _ESTIMATOR_CACHE[path]
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "config.json")):
        est: Any = DepthAnythingEstimator.from_pretrained(path)
    else:
        from transformers import pipeline as hf_pipeline

        est = hf_pipeline(task="depth-estimation", model=path)
    _ESTIMATOR_CACHE[path] = est
    return est
