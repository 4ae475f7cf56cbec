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


def convert_eval_clip(hf_dir: str, out_dir: str):
    """Convert a full HF CLIP checkpoint (text + vision + projections) into
    the in-framework eval backend bundle (see cli/evaluate --jax_clip_path)."""
    import dataclasses
    import os
    import pickle
    import shutil

    import jax
    import jax.numpy as jnp
    import numpy as np

    from loongx_tpu.models.text.clip import CLIPTextConfig
    from loongx_tpu.models.text.clip_vision import CLIPVisionConfig
    from loongx_tpu.utils.convert import (
        convert_clip_state, convert_clip_vision_state, load_safetensors_dir,
        _lin,
    )

    state = load_safetensors_dir(hf_dir)
    state = {k.removeprefix("text_model_with_projection."): v
             for k, v in state.items()}
    # head counts are not derivable from the weights — read config.json when
    # present (head_dim 64 is only a CLIP-L/B convention)
    heads = {}
    eos_id = None
    cfg_json = os.path.join(hf_dir, "config.json")
    if os.path.exists(cfg_json):
        import json

        with open(cfg_json) as f:
            hf_cfg = json.load(f)
        for part in ("text_config", "vision_config"):
            heads[part] = hf_cfg.get(part, {}).get("num_attention_heads")
        eos_id = hf_cfg.get("text_config", {}).get("eos_token_id")
    # infer the rest of the geometry from the weights
    hidden = state["text_model.embeddings.token_embedding.weight"].shape[1]
    n_text = len({k.split(".")[3] for k in state
                  if k.startswith("text_model.encoder.layers.")})
    text_cfg = CLIPTextConfig(
        vocab_size=state["text_model.embeddings.token_embedding.weight"].shape[0],
        hidden=hidden, num_layers=n_text,
        num_heads=heads.get("text_config") or max(1, hidden // 64),
        d_ff=state["text_model.encoder.layers.0.mlp.fc1.weight"].shape[0],
        max_positions=state["text_model.embeddings.position_embedding.weight"].shape[0],
        **({"eos_token_id": eos_id} if eos_id is not None else {}),
    )
    v_hidden = state["vision_model.embeddings.class_embedding"].size
    n_vis = len({k.split(".")[3] for k in state
                 if k.startswith("vision_model.encoder.layers.")})
    patch = state["vision_model.embeddings.patch_embedding.weight"].shape[-1]
    n_pos = state["vision_model.embeddings.position_embedding.weight"].shape[0]
    image_size = int(((n_pos - 1) ** 0.5) * patch)
    vision_cfg = CLIPVisionConfig(
        image_size=image_size, patch_size=patch, hidden=v_hidden,
        num_layers=n_vis,
        num_heads=heads.get("vision_config") or max(1, v_hidden // 64),
        d_ff=state["vision_model.encoder.layers.0.mlp.fc1.weight"].shape[0],
        projection_dim=state["visual_projection.weight"].shape[0],
    )
    text_params = convert_clip_state(state, text_cfg, jnp.float32)
    text_params["text_projection"] = _lin(
        state, "text_projection", jnp.float32, bias=False
    )
    vision_params = convert_clip_vision_state(state, vision_cfg, jnp.float32)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "eval_clip.pkl"), "wb") as f:
        pickle.dump(
            {
                "text_params": jax.tree.map(np.asarray, text_params),
                "text_cfg": dataclasses.asdict(text_cfg),
                "vision_params": jax.tree.map(np.asarray, vision_params),
                "vision_cfg": dataclasses.asdict(vision_cfg),
            },
            f,
        )
    for name in ("vocab.json", "merges.txt", "tokenizer.json",
                 "tokenizer_config.json", "special_tokens_map.json"):
        src = os.path.join(hf_dir, name)
        if os.path.exists(src):
            shutil.copy(src, out_dir)
    print(f"[convert] wrote {out_dir}/eval_clip.pkl")


def main(argv=None):
    import sys

    parser = argparse.ArgumentParser(description="Convert HF weights")
    # standalone eval-CLIP mode: --eval_clip <hf_dir> --out <dir>
    argv_list = list(argv) if argv is not None else sys.argv[1:]
    if "--eval_clip" in argv_list:
        i = argv_list.index("--eval_clip")
        hf_dir = argv_list[i + 1]
        out = argv_list[argv_list.index("--out") + 1]
        convert_eval_clip(hf_dir, out)
        return
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
    parser.add_argument(
        "--init-encoders", action="store_true",
        help="also write freshly-initialized full-size CS3 biosignal "
        "encoders + DGF fusion trees as 'encoders'/'dgf' components, so "
        "the converted directory is a COMPLETE deployable pipeline for "
        "the neural-editing CLI (train or overwrite them afterwards; the "
        "reference ships these separately via save_custom_weights, "
        "/root/reference/src/train/model.py:780-943)",
    )
    parser.add_argument(
        "--quantize", action="store_true",
        help="int8-quantize the DiT + text encoders during conversion "
        "(on host) and save the quantized checkpoint — REQUIRED for "
        "serving the 12B flux-dev from one ~16 GB chip: the bf16 tree "
        "(23.8 GB) never fits HBM, so quantization cannot happen "
        "device-side after loading (docs/WEIGHTS.md)",
    )
    parser.add_argument(
        "--serving", action="store_true",
        help="also bake the single-chip serving transforms (fused qkv "
        "projections + single-block proj_out K-split) into the saved "
        "checkpoint, on host.  The infer CLI applies the same transforms "
        "after load when they are missing, but at 12B that reshuffles "
        "~11 GiB through the device tunnel on EVERY serve start; baking "
        "them at convert time makes serving start = one orbax restore.  "
        "Do NOT use for tensor-parallel serving (the TP sharding rules "
        "address the unfused projection axes) or before LoRA attachment "
        "(adapters address q/k/v individually)",
    )
    args = parser.parse_args(argv)

    import jax
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

    # The whole conversion runs ON HOST (CPU backend): full-scale bf16
    # trees (FLUX 23.8 GB, T5 9.5 GB) exceed a single chip's HBM — the
    # accelerator only ever sees the final (optionally int8) checkpoint at
    # load time, via orbax restore.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        print("[convert] flux ...")
        params = {
            "flux": convert_flux_state(
                load_safetensors_dir(args.flux), flux_cfg, dtype
            )
        }
        print("[convert] vae ...")
        params["vae"] = convert_vae_state(
            load_safetensors_dir(args.vae), vae_cfg, jnp.float32
        )
        print("[convert] t5 ...")
        params["t5"] = convert_t5_state(
            load_safetensors_dir(args.t5), t5_cfg, dtype
        )
        print("[convert] clip ...")
        params["clip"] = convert_clip_state(
            load_safetensors_dir(args.clip), clip_cfg, dtype
        )

        if args.quantize:
            from loongx_tpu.ops.quant import quantize_tree

            for name in ("flux", "t5", "clip"):
                print(f"[convert] int8-quantize {name} (host) ...")
                params[name] = quantize_tree(params[name])

        if args.serving:
            from loongx_tpu.ops.quant import (
                fuse_qkv_projections, split_single_proj_out,
            )

            print("[convert] bake serving transforms (host) ...")
            params["flux"] = fuse_qkv_projections(
                params["flux"], consume=True
            )
            params["flux"] = split_single_proj_out(
                params["flux"], flux_cfg.hidden, consume=True
            )
            # ADVICE r4: both transforms silently return the tree unchanged
            # on unexpected layouts — a convert run must not claim a serving
            # checkpoint that still pays the load-time reshuffle
            def _has(tree, key):
                return isinstance(tree, dict) and (
                    key in tree or any(_has(v, key) for v in tree.values())
                )

            missing = [
                k for k in ("to_qkv", "proj_out_mlp")
                if not _has(params["flux"], k)
            ]
            if missing:
                raise SystemExit(
                    f"[convert] --serving failed to bake {missing}: the "
                    "flux tree's q/k/v (or single-block proj_out) leaves "
                    "are not in the expected layout — refusing to write a "
                    "checkpoint that would still pay the load-time "
                    "transform"
                )

        if args.init_encoders:
            from loongx_tpu.models.encoders import (
                init_eeg_encoder, init_fnirs_encoder, init_motion_encoder,
                init_ppg_encoder,
            )
            from loongx_tpu.models.fusion import init_dgf

            print("[convert] init CS3 encoders + DGF ...")
            ks = jax.random.split(jax.random.key(0), 5)
            params["encoders"] = {
                "eeg": init_eeg_encoder(ks[0], dtype),
                "ppg": init_ppg_encoder(ks[1], dtype),
                "fnirs": init_fnirs_encoder(ks[2], dtype),
                "motion": init_motion_encoder(ks[3], dtype),
            }
            params["dgf"] = init_dgf(ks[4], dtype)

        pipe = LoongXPipeline(
            flux_cfg=flux_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg,
            clip_cfg=clip_cfg, params=params, dtype=dtype,
        )
        save_pipeline(pipe, args.out)
    for name, src in (("t5_tokenizer", args.t5_tokenizer),
                      ("clip_tokenizer", args.clip_tokenizer)):
        if src:
            shutil.copytree(src, f"{args.out}/{name}", dirs_exist_ok=True)
    print(f"[convert] wrote {args.out}")


if __name__ == "__main__":
    main()
