"""Evaluation CLI (reference test.py / test.sh equivalent).

Usage:
  python -m loongx_tpu.cli.evaluate --gen_dir outs [--gt_dir gts]
      [--clip_path /local/clip] [--dino_path /local/dino]
      [--caption_path test.jsonl] [--out_dir results]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="LoongX-TPU evaluation")
    parser.add_argument("--gen_dir", type=str, required=True)
    parser.add_argument("--gt_dir", type=str, default=None)
    parser.add_argument("--clip_path", type=str, default=None,
                        help="local HF CLIP checkpoint (torch backend)")
    parser.add_argument("--jax_clip_path", type=str, default=None,
                        help="converted JAX CLIP dir (in-framework backend, "
                             "runs on TPU; see cli/convert --eval_clip)")
    parser.add_argument("--dino_path", type=str, default=None,
                        help="local HF DINO checkpoint (torch backend)")
    parser.add_argument("--jax_dino_path", type=str, default=None,
                        help="local HF DINO ViT dir converted on the fly "
                             "(in-framework backend, runs on TPU)")
    parser.add_argument("--caption_path", type=str, default=None,
                        help="jsonl with instructions for CLIP-T")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=512)
    args = parser.parse_args(argv)

    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    instructions = None
    if args.caption_path and os.path.exists(args.caption_path):
        instructions = {}
        with open(args.caption_path, "r", encoding="utf-8") as f:
            for line in f:
                row = json.loads(line)
                name = os.path.splitext(
                    row.get("source_image", "").split("/")[-1]
                )[0].removesuffix("_0")
                instructions[name] = (
                    row.get("speech2text") or row.get("instruction", "")
                )

    from loongx_tpu.evaluation import evaluate_directory

    img_fn = txt_fn = None
    if args.jax_clip_path:
        import pickle

        from transformers import CLIPTokenizer

        from loongx_tpu.evaluation.jax_backend import make_jax_clip_backend
        from loongx_tpu.models.text.clip import CLIPTextConfig
        from loongx_tpu.models.text.clip_vision import CLIPVisionConfig

        with open(f"{args.jax_clip_path}/eval_clip.pkl", "rb") as f:
            bundle = pickle.load(f)
        img_fn, txt_fn = make_jax_clip_backend(
            bundle["text_params"], CLIPTextConfig(**bundle["text_cfg"]),
            bundle["vision_params"], CLIPVisionConfig(**bundle["vision_cfg"]),
            CLIPTokenizer.from_pretrained(args.jax_clip_path),
        )

    dino_fn = None
    if args.jax_dino_path:
        from loongx_tpu.evaluation.jax_backend import make_jax_dino_backend
        from loongx_tpu.models.vision import ViTConfig
        from loongx_tpu.utils.convert import (
            convert_vit_state, load_safetensors_dir,
        )

        state = {
            k.removeprefix("vit."): v
            for k, v in load_safetensors_dir(args.jax_dino_path).items()
        }
        n_layers = 1 + max(
            int(k.split(".")[2]) for k in state if k.startswith("encoder.layer.")
        )
        hidden = state["embeddings.cls_token"].size
        patch = state[
            "embeddings.patch_embeddings.projection.weight"
        ].shape[-1]
        ff = state["encoder.layer.0.intermediate.dense.weight"].shape[0]
        vcfg = ViTConfig(hidden=hidden, num_layers=n_layers,
                         num_heads=max(1, hidden // 64), patch_size=patch,
                         d_ff=ff)
        dino_fn = make_jax_dino_backend(convert_vit_state(state, vcfg), vcfg)

    results = evaluate_directory(
        args.gen_dir,
        gt_dir=args.gt_dir,
        instructions=instructions,
        clip_image_embed=img_fn,
        clip_text_embed=txt_fn,
        dino_image_embed=dino_fn,
        clip_path=args.clip_path,
        dino_path=args.dino_path,
        out_dir=args.out_dir,
        image_size=args.image_size,
    )
    for k, v in results.items():
        print(f"{k}: {v:.6f}")
    return results


if __name__ == "__main__":
    main()
