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
import jax.numpy as jnp


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
    neural_only: bool = False,
):
    """Edit a single image (reference inference_single_image,
    inference.py:77-117)."""
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate, neural_edit

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
    if (
        not fuse_flag
        and brain.get("EEG") is not None
        and brain.get("FNIRS") is not None
    ):
        # deployed replace mode with both embedding slots covered: brain
        # encode + cond VAE encode + denoise + decode run as ONE dispatch
        # (sampling.generate.neural_edit ≡ the generate() call below,
        # tested in tests/test_generate.py)
        out = neural_edit(
            pipeline,
            cond.condition,
            eeg=brain.get("EEG"),
            ppg=brain.get("PPG"),
            fnirs=brain.get("FNIRS"),
            motion=brain.get("Motion"),
            condition_type=condition_type,
            height=target_size,
            width=target_size,
            num_inference_steps=num_steps,
            guidance_scale=guidance,
            seed=seed,
            position_delta=position_delta,
            output_type="uint8",
        )
        return Image.fromarray(out[0])
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
        neural_only=neural_only,
        output_type="uint8",
    )
    return Image.fromarray(out[0])


def batch_edit(pipeline, args, brain_data, captions):
    """Directory batch mode: images are grouped into batches and edited in
    ONE sharded generate call per group over a ("data", "tensor") device
    mesh — the TPU-native replacement for the reference's mp.spawn + NCCL +
    per-rank image-chunking loop (inference.py:177-261).

    With more than one device the pipeline params are sharded ONCE
    (replicated under pure data parallelism; Megatron column/row split
    under ``--tensor N``), and per group the initial latents, condition
    tokens and biosignals are ``device_put`` with a batch-axis
    NamedSharding, so each chip denoises its slice of the group and the
    Pallas kernels run per shard (``mesh_context``).  The final group is
    padded (by repeating its last image) to a multiple of the data axis;
    padded outputs are dropped."""
    import time as _time

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from PIL import Image

    import loongx_tpu.sampling as sampling
    from loongx_tpu.sampling.condition import synthesize_condition_image
    from loongx_tpu.ops.latents import latent_image_ids, shift_ids
    from loongx_tpu.parallel import make_mesh, shard_params
    from loongx_tpu.parallel.mesh import mesh_context

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(args.input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    n_dev = len(jax.devices())
    tensor = max(1, getattr(args, "tensor", 1) or 1)
    mesh = make_mesh(data=-1, tensor=tensor)
    n_data = mesh.shape["data"]
    sharded = n_dev > 1
    if sharded:
        # one-time placement: flux/vae/encoder leaves follow the TP rules
        # (everything replicated when tensor == 1)
        pipeline.params = shard_params(
            pipeline.params, mesh, tensor_parallel=tensor > 1
        )
    batch_sh = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(x, batch_sh) if sharded else x

    group = max(args.batch_size or n_data, 1)
    if sharded and group % n_data:
        group = -(-group // n_data) * n_data  # round up to the data axis
    print(
        f"[infer] {len(files)} images, groups of {group} on mesh "
        f"{dict(mesh.shape)}"
    )
    size = args.target_size
    vae_scale = pipeline.vae_cfg.downscale
    lat_h = lat_w = size // vae_scale
    n_tok = (lat_h // 2) * (lat_w // 2)
    done, times = 0, []
    for start in range(0, len(files), group):
        t0 = _time.time()
        chunk = files[start : start + group]
        # pad the tail group so the batch axis divides the mesh
        pad = (-len(chunk)) % n_data if sharded else 0
        proc = chunk + [chunk[-1]] * pad
        conds, prompts = [], []
        for fname in proc:
            img = Image.open(
                os.path.join(args.input_dir, fname)
            ).convert("RGB").resize((size, size))
            cimg = synthesize_condition_image(args.condition_type, img)
            arr = np.asarray(cimg, np.float32)[None] / 127.5 - 1.0
            toks, h, w = pipeline.encode_image_tokens(jnp.asarray(arr))
            conds.append(np.asarray(toks[0]))
            prompts.append(captions.get(fname, args.prompt or ""))
        b = len(proc)
        cond_tokens = put(jnp.asarray(np.stack(conds)))
        cond_ids = shift_ids(
            latent_image_ids(h, w),
            (args.position_delta_x, args.position_delta_y),
        )
        # initial latents: same construction generate() would use (so the
        # sharded group run equals the unsharded call bit-for-bit), but
        # device_put with the batch-axis sharding BEFORE the denoise scan
        k_lat, _ = jax.random.split(jax.random.key(args.seed))
        latents = jax.random.normal(
            k_lat, (b, lat_h // 2, lat_w // 2, pipeline.flux_cfg.in_channels),
            jnp.float32,
        ).reshape(b, n_tok, pipeline.flux_cfg.in_channels)
        latents = put(latents.astype(pipeline.dtype))
        # biosignals: batch only when every image in the group has them
        brains = [brain_data.get(f, {}) for f in proc]
        use_brain = all(b_.get("EEG") is not None for b_ in brains) and brains
        kw = {}
        if use_brain:
            for key, name in (("EEG", "eeg"), ("FNIRS", "fnirs"),
                              ("PPG", "ppg"), ("Motion", "motion")):
                vals = [b_.get(key) for b_ in brains]
                if all(v is not None for v in vals):
                    from loongx_tpu.models.encoders import canonicalise_signal

                    kw[name] = put(jnp.stack([
                        canonicalise_signal(jnp.asarray(v, jnp.float32), name)[0]
                        for v in vals
                    ]))
        with mesh_context(mesh):
            out = sampling.generate(
                pipeline,
                prompt=prompts,
                cond_tokens=cond_tokens,
                cond_ids=cond_ids,
                height=size,
                width=size,
                num_inference_steps=args.steps,
                guidance_scale=args.guidance,
                seed=args.seed,
                latents=latents,
                use_brain_condition=bool(kw),
                fuse_flag=args.fuse,
                neural_only=args.neural_only,
                output_type="uint8",
                # chunked decode would serialize a SHARDED batch axis; under
                # pure tensor parallelism (n_data == 1) the batch axis is
                # unsharded and chunking stays valid (and is what caps the
                # batched VAE-decode memory)
                decode_chunk=(
                    None if n_data > 1 else getattr(args, "decode_chunk", None)
                ),
                **kw,
            )
        for fname, arr in zip(chunk, out):  # padded rows fall off the zip
            out_path = os.path.join(args.output_dir, fname)
            Image.fromarray(arr).save(out_path)
            done += 1
            print(f"[infer] [{done}/{len(files)}] {out_path}")
        dt = _time.time() - t0
        times.extend([dt / len(chunk)] * len(chunk))
        if getattr(args, "timing", False):
            print(
                f"[infer] group of {len(chunk)}: {dt:.3f}s "
                f"({dt / len(chunk):.3f}s/image end-to-end)"
            )
    if getattr(args, "timing", False) and times:
        times.sort()
        p50 = times[len(times) // 2]
        print(
            f"[infer] wall-clock per-image p50 {p50:.3f}s over "
            f"{len(times)} images (host decode + condition synthesis + "
            f"denoise + PNG write)"
        )


def _tree_has_key(tree, key: str) -> bool:
    """True if ``key`` appears as a dict key anywhere in the nested param
    tree — the one probe behind "is this tree int8-quantized" (kernel_q)
    and "does it carry baked fused-qkv serving layout" (to_qkv)."""
    return isinstance(tree, dict) and (
        key in tree or any(_tree_has_key(v, key) for v in tree.values())
    )


def _load_lora_tree(pipeline, path: str):
    """Load a LoRA safetensors file (ours or reference-trained peft layout)
    into a copy of the flux param tree with lora leaves set."""
    from safetensors import safe_open

    from loongx_tpu.utils.checkpoint import load_lora_safetensors

    fname = path if path.endswith(".safetensors") else (
        os.path.join(path, "lora.safetensors")
    )
    with safe_open(fname, framework="np") as f:
        keys = list(f.keys())
    if any(".lora_A." in k or ".lora_B." in k for k in keys):
        # reference-trained (peft / FluxPipeline.save_lora_weights) LoRA
        from loongx_tpu.utils.convert import convert_reference_lora

        with safe_open(fname, framework="np") as f:
            state = {k: f.get_tensor(k) for k in keys}
        return convert_reference_lora(
            state, pipeline.params["flux"], pipeline.flux_cfg
        )
    return load_lora_safetensors(pipeline.params["flux"], path)


def _attach_lora(pipeline, path: str, name=None):
    """Bare path: merge into base weights.  name=path: register as a named
    adapter selected per condition type (reference set_adapters model)."""
    from loongx_tpu.train.lora import lora_state_dict, merge_lora

    tree = _load_lora_tree(pipeline, path)
    if name is None:
        if _tree_has_key(tree, "kernel_q"):
            # int8 base: merging would requantize the folded weights (lossy)
            # and merge_lora refuses; keep the deltas live — linear() applies
            # them on top of the quant matmul exactly (QLoRA-style serving)
            pipeline.params["flux"] = tree
            print(f"[infer] int8 base: serving LoRA {path} as live deltas")
            return
        pipeline.params["flux"] = merge_lora(tree)
        return
    from loongx_tpu.train.adapters import AdapterRegistry

    if pipeline.adapters is None:
        pipeline.adapters = AdapterRegistry()
    pipeline.adapters.add(name, lora_state_dict(tree))
    # hold DEACTIVATED lora leaves in the live tree: switching is then a
    # pure value swap, and nothing is applied until set_adapters selects it
    pipeline.params["flux"] = pipeline.adapters.deactivate(tree)
    pipeline.active_adapter = None
    print(f"[infer] registered adapter {name!r} from {path}")


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
    parser.add_argument("--batch_size", type=int, default=None,
                        help="images per sharded batch (default: the data "
                        "axis of the mesh; rounded up to a multiple of it)")
    parser.add_argument("--tensor", type=int, default=1,
                        help="tensor-parallel axis of the device mesh "
                        "(data axis = n_devices / tensor).  With --int8 the "
                        "qkv projections are fused in the TP layout so the "
                        "quantized TP serving kernels apply")
    parser.add_argument("--decode_chunk", type=int, default=None,
                        help="decode at most this many images per VAE call "
                        "(single-chip int8-12B serving: batched 512² decoder "
                        "activations OOM at batch >= 4 while the batched "
                        "denoise fits; chunking caps decode memory).  "
                        "Ignored under a multi-device mesh")
    parser.add_argument("--timing", action="store_true",
                        help="report end-to-end wall-clock per image "
                        "(host decode + condition synthesis + denoise + "
                        "PNG write) and the p50 across the run")
    parser.add_argument("--fuse", action="store_true",
                        help="DUAN-fuse brain+text instead of replacing")
    parser.add_argument("--neural_only", action="store_true",
                        help="allow running without text tokenizers (zero "
                        "text embeds; brain embeds replace them)")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantize DiT + text encoders at load "
                        "(single-chip serving of the 12B; W8A8 via "
                        "LOONGX_W8A8=1)")
    parser.add_argument(
        "--components", type=str, default=None,
        help="comma list of checkpoint components to load (e.g. "
        "'flux,vae,encoders,dgf').  At the 12B scale the int8 DiT and "
        "int8 T5-XXL cannot be co-resident on one ~16 GB chip; the "
        "deployed replace mode (fuse_flag=False) never runs the text "
        "encoders, so staging them out makes the 12B fit "
        "(docs/WEIGHTS.md).  Default: everything in the checkpoint")
    parser.add_argument(
        "--lora", action="append", default=None,
        help="LoRA safetensors to load.  A bare path merges the adapter into "
        "the base weights (single-adapter fast path).  Repeatable "
        "'name=path' entries register named adapters selected per "
        "condition type at generate time (reference generate.py:279 "
        "set_adapters; name them after condition types, e.g. "
        "--lora canny=./canny_lora --lora depth=./depth_lora)",
    )
    args = parser.parse_args(argv)

    from loongx_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from loongx_tpu.models.pipeline import LoongXPipeline

    components = (
        tuple(c.strip() for c in args.components.split(",") if c.strip())
        if args.components else None
    )
    pipeline = LoongXPipeline.from_pretrained(
        args.checkpoint, components=components
    )
    if args.tensor > 1 and _tree_has_key(
        pipeline.params.get("flux", {}), "to_qkv"
    ):
        parser.error(
            "--tensor > 1 on a checkpoint with baked serving transforms "
            "(fused qkv): the TP sharding rules address the unfused "
            "projection axes.  Re-convert without --serving for "
            "tensor-parallel serving."
        )
    if args.int8 and _tree_has_key(pipeline.params.get("flux", {}), "kernel_q"):
        # checkpoint was converted with --quantize: kernel_q leaves restore
        # directly; re-quantizing would be lossy.  Apply the serving
        # transforms the load-time path would have applied (no-ops leaf by
        # leaf when the checkpoint already baked them via convert --serving).
        print("[infer] checkpoint already int8; applying serving transforms")
        from loongx_tpu.ops.quant import (
            fuse_qkv_projections, split_single_proj_out,
        )

        if args.tensor > 1:
            if not args.lora:
                pipeline.params["flux"] = fuse_qkv_projections(
                    pipeline.params["flux"], consume=True, tp_layout=True
                )
        else:
            if not args.lora:
                pipeline.params["flux"] = fuse_qkv_projections(
                    pipeline.params["flux"], consume=True
                )
            pipeline.params["flux"] = split_single_proj_out(
                pipeline.params["flux"], pipeline.flux_cfg.hidden,
                consume=True,
            )
    elif args.int8:
        if args.tensor > 1:
            # TP serving: the flat serving-fused qkv cannot column-shard
            # (parallel/mesh.py refusal) — quantize unfused, then re-fuse in
            # the TP layout ([*, K, 3, H], head axis shardable); proj_out
            # stays whole (its split is a single-chip transform)
            pipeline.quantize(fuse_qkv=False, split_proj_out=False)
            if not args.lora:
                from loongx_tpu.ops.quant import fuse_qkv_projections

                pipeline.params["flux"] = fuse_qkv_projections(
                    pipeline.params["flux"], consume=True, tp_layout=True
                )
        else:
            # qkv fusion cannot carry LoRA (adapters address q/k/v
            # individually) — keep it off when adapters follow; the proj_out
            # split stays on either way (attach routes its factor rows)
            pipeline.quantize(fuse_qkv=not args.lora)
    for spec in args.lora or []:
        name, path = spec.split("=", 1) if "=" in spec else (None, spec)
        _attach_lora(pipeline, path, name)
    brain_data = load_brain_data(args.brain_data_path)
    captions = load_captions(args.caption_path)
    if brain_data and not (
        "encoders" in pipeline.params and "dgf" in pipeline.params
    ):
        parser.error(
            "--brain_data_path given but the checkpoint has no 'encoders'/"
            "'dgf' components (and --components did not include them). "
            "Convert with --init-encoders, or train CS3/DGF and save them "
            "into the pipeline directory."
        )

    if args.single_image and args.prompt is not None:
        brain = brain_data.get(os.path.basename(args.single_image), {})
        img = edit_one(
            pipeline, args.single_image, args.prompt,
            condition_type=args.condition_type,
            target_size=args.target_size,
            position_delta=(args.position_delta_x, args.position_delta_y),
            brain=brain, seed=args.seed, fuse_flag=args.fuse,
            num_steps=args.steps, guidance=args.guidance,
            neural_only=args.neural_only,
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
