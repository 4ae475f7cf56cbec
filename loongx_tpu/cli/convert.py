"""Weight conversion CLI: HF safetensors -> loongx_tpu pipeline directory.

Usage:
  python -m loongx_tpu.cli.convert --flux <dir> --t5 <dir> --clip <dir> \
      --vae <dir> --out checkpoints/flux-dev [--schnell]

Each input dir holds the published safetensors for that component (e.g. the
``transformer/``, ``text_encoder_2/``, ``text_encoder/``, ``vae/`` subdirs of
a diffusers FLUX.1 checkpoint).  Tokenizer dirs are copied alongside when
given so the pipeline can tokenize offline.
"""

from __future__ import annotations

import argparse
import shutil


def main(argv=None):
    parser = argparse.ArgumentParser(description="Convert HF weights")
    parser.add_argument("--flux", type=str, required=True)
    parser.add_argument("--t5", type=str, required=True)
    parser.add_argument("--clip", type=str, required=True)
    parser.add_argument("--vae", type=str, required=True)
    parser.add_argument("--t5_tokenizer", type=str, default=None)
    parser.add_argument("--clip_tokenizer", type=str, default=None)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--schnell", action="store_true",
                        help="FLUX.1-schnell (no guidance embedder)")
    parser.add_argument("--dtype", type=str, default="bfloat16")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from loongx_tpu.models.flux.model import FluxConfig
    from loongx_tpu.models.flux.vae import VAEConfig
    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.models.text.clip import CLIPTextConfig
    from loongx_tpu.models.text.t5 import T5Config
    from loongx_tpu.utils.checkpoint import save_pipeline
    from loongx_tpu.utils.convert import (
        convert_clip_state, convert_flux_state, convert_t5_state,
        convert_vae_state, load_safetensors_dir,
    )

    dtype = jnp.dtype(args.dtype)
    flux_cfg = FluxConfig.flux_schnell() if args.schnell else FluxConfig.flux_dev()
    vae_cfg = VAEConfig.flux()
    t5_cfg = T5Config.xxl()
    clip_cfg = CLIPTextConfig.large()

    print("[convert] flux ...")
    params = {
        "flux": convert_flux_state(load_safetensors_dir(args.flux), flux_cfg, dtype)
    }
    print("[convert] vae ...")
    params["vae"] = convert_vae_state(
        load_safetensors_dir(args.vae), vae_cfg, jnp.float32
    )
    print("[convert] t5 ...")
    params["t5"] = convert_t5_state(load_safetensors_dir(args.t5), t5_cfg, dtype)
    print("[convert] clip ...")
    params["clip"] = convert_clip_state(
        load_safetensors_dir(args.clip), clip_cfg, dtype
    )

    pipe = LoongXPipeline(
        flux_cfg=flux_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg, clip_cfg=clip_cfg,
        params=params, dtype=dtype,
    )
    save_pipeline(pipe, args.out)
    for name, src in (("t5_tokenizer", args.t5_tokenizer),
                      ("clip_tokenizer", args.clip_tokenizer)):
        if src:
            shutil.copytree(src, f"{args.out}/{name}", dirs_exist_ok=True)
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
