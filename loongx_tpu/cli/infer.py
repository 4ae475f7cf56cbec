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


def list_images(input_dir: str):
    return sorted(
        f for f in os.listdir(input_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )


def _effective_brain(brain: Dict) -> Dict:
    """Per-image effective signal set, reference semantics: signals are
    looked up independently per image (inference.py:99-115) and brain
    conditioning engages iff EEG or fNIRS is present
    (``use_brain_condition``, inference.py:97).  PPG only fuses alongside
    EEG and Motion only alongside fNIRS (pairwise DGF, generate.py:167-237),
    so a PPG/Motion without its partner is dropped here — exactly what the
    reference's fusion does with it."""
    eff = {}
    if brain.get("EEG") is not None:
        eff["EEG"] = brain["EEG"]
        if brain.get("PPG") is not None:
            eff["PPG"] = brain["PPG"]
    if brain.get("FNIRS") is not None:
        eff["FNIRS"] = brain["FNIRS"]
        if brain.get("Motion") is not None:
            eff["Motion"] = brain["Motion"]
    return eff


def staged_text_encode(checkpoint, files, captions, default_prompt,
                       int8=False, chunk=8, max_sequence_length=None):
    """Phase 1 of the staged fuse recipe (docs/WEIGHTS.md): load ONLY the
    text encoders + tokenizers, encode every file's prompt batched, return
    per-file float32 embeds, and drop the encoders — the caller then loads
    the DiT into the freed memory.  The reference's fuse path needs real
    text embeds (src/flux/generate.py:167-258), but at the 12B scale the
    int8 DiT and int8 T5-XXL cannot be co-resident on one ~16 GB chip.

    Per-row results are independent of chunk composition (fixed-length
    padding), so staged embeds equal what the resident path would encode
    per group (tested in tests/test_infer_cli.py)."""
    import gc

    from loongx_tpu.models.pipeline import LoongXPipeline

    tp = LoongXPipeline.from_pretrained(checkpoint, components=("t5", "clip"))
    if max_sequence_length is not None:
        tp.max_sequence_length = max_sequence_length
    if int8:
        tp.quantize(dit=False)
    prompts = [captions.get(f, default_prompt or "") for f in files]
    embeds: Dict[str, tuple] = {}
    for s in range(0, len(files), chunk):
        pe, pl, _ = tp.encode_text(prompts[s : s + chunk])
        pe = np.asarray(pe.astype(jnp.float32))
        pl = np.asarray(pl.astype(jnp.float32))
        for i, f in enumerate(files[s : s + chunk]):
            embeds[f] = (pe[i], pl[i])
    print(
        f"[infer] staged text encode: {len(embeds)} prompts embedded; "
        "freeing text encoders"
    )
    tp.free_text_encoders()
    del tp
    gc.collect()
    return embeds


def batch_edit(pipeline, args, brain_data, captions, text_embeds=None):
    """Directory batch mode: images are grouped into batches and edited in
    ONE sharded generate call per group over a ("data", "tensor") device
    mesh — the TPU-native replacement for the reference's mp.spawn + NCCL +
    per-rank image-chunking loop (inference.py:177-261).

    With more than one device the pipeline params are sharded ONCE
    (replicated under pure data parallelism; Megatron column/row split
    under ``--tensor N``), and per group the initial latents, condition
    tokens and biosignals are ``device_put`` with a batch-axis
    NamedSharding, so each chip denoises its slice of the group and the
    Pallas kernels run per shard (``mesh_context``).  The final group of a
    bucket is padded (by repeating its last image) to a multiple of the
    data axis; padded outputs are dropped.

    Reference-parity semantics (each image's result is independent of the
    directory around it and of ``--batch_size``):

      * every image gets the SAME config-seed initial noise — the reference
        reseeds a fresh generator per image (inference.py:83-84), so noise
        does not depend on position-in-group;
      * biosignals are looked up PER IMAGE (inference.py:99-115): files are
        bucketed by their effective signal coverage and each bucket runs
        with exactly its signals (a batched encode cannot mix coverage
        patterns); uncovered images are edited without brain conditioning,
        with a visible warning;
      * the named-adapter switch applies per generate call
        (``condition_type=args.condition_type``, reference generate.py:279).

    ``text_embeds``: optional {fname: (prompt_embed, pooled)} from
    ``staged_text_encode`` — groups then run on precomputed embeds so the
    text encoders need not be resident (the staged 12B fuse recipe)."""
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
    files = list_images(args.input_dir)
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
    if getattr(args, "decode_chunk", None) and n_data > 1:
        # ADVICE r4: the flag exists to cap VAE-decode memory; dropping it
        # silently under a sharded batch axis hides that the per-device
        # decode batch is still group/n_data
        print(
            f"[infer] notice: --decode_chunk is ignored under a sharded "
            f"data axis (chunking would serialize the shards); per-device "
            f"decode batch is {group // n_data} — lower --batch_size if "
            f"the batched VAE decode OOMs"
        )

    # ---- per-image brain lookup, bucketed by effective coverage ----
    buckets: Dict[tuple, list] = {}
    eff_of: Dict[str, Dict] = {}
    for fname in files:
        brain = brain_data.get(fname, {})
        eff = _effective_brain(brain)
        for k, partner in (("PPG", "EEG"), ("Motion", "FNIRS")):
            if brain.get(k) is not None and k not in eff:
                print(
                    f"[infer] warning: {fname}: {k} present without "
                    f"{partner} — {k} only fuses alongside {partner}; "
                    "it is ignored"
                )
        if brain_data and not eff:
            print(
                f"[infer] warning: {fname}: no EEG/fNIRS in brain data — "
                "edited WITHOUT brain conditioning"
            )
        eff_of[fname] = eff
        buckets.setdefault(tuple(sorted(eff)), []).append(fname)
    if getattr(args, "neural_only", False):
        # fail BEFORE any compute: under --neural_only there are no text
        # embeds to back a missing slot, so every image needs EEG+FNIRS —
        # an uncovered bucket would only crash after its group started
        bad = [f for f in files if not {"EEG", "FNIRS"} <= set(eff_of[f])]
        if bad:
            raise SystemExit(
                f"[infer] --neural_only requires EEG+FNIRS brain coverage "
                f"for every image (brain embeds replace the text embeds; "
                f"there is nothing to back a missing slot), but "
                f"{len(bad)}/{len(files)} images lack it: {bad[:5]}"
                + ("..." if len(bad) > 5 else "")
            )
    print(
        f"[infer] {len(files)} images, groups of {group} on mesh "
        f"{dict(mesh.shape)}"
        + (
            f", {len(buckets)} brain-coverage buckets "
            f"{sorted(buckets, key=lambda s: (len(s), s))}"
            if len(buckets) > 1 else ""
        )
    )
    size = args.target_size
    vae_scale = pipeline.vae_cfg.downscale
    lat_h = lat_w = size // vae_scale
    n_tok = (lat_h // 2) * (lat_w // 2)
    # initial noise: ONE config-seed draw shared by every image — the
    # reference reseeds per image (inference.py:83-84), so the same image
    # yields the same output at any --batch_size / directory composition
    # (and equals the --single_image path, which draws this same [1,...]
    # normal inside generate()).  k_enc likewise matches the single path's
    # condition-latent sampling key (generate() splits key(seed) the same
    # way), so batch and single editions of one image are bit-identical.
    k_lat, k_enc = jax.random.split(jax.random.key(args.seed))
    noise1 = jax.random.normal(
        k_lat, (1, lat_h // 2, lat_w // 2, pipeline.flux_cfg.in_channels),
        jnp.float32,
    ).reshape(1, n_tok, pipeline.flux_cfg.in_channels)
    done, times = 0, []
    for sig in sorted(buckets, key=lambda s: (len(s), s)):
        bucket = buckets[sig]
        for start in range(0, len(bucket), group):
            t0 = _time.time()
            chunk = bucket[start : start + group]
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
                toks, h, w = pipeline.encode_image_tokens(
                    jnp.asarray(arr), key=k_enc
                )
                conds.append(np.asarray(toks[0]))
                prompts.append(captions.get(fname, args.prompt or ""))
            b = len(proc)
            cond_tokens = put(jnp.asarray(np.stack(conds)))
            cond_ids = shift_ids(
                latent_image_ids(h, w),
                (args.position_delta_x, args.position_delta_y),
            )
            latents = put(
                jnp.tile(noise1, (b, 1, 1)).astype(pipeline.dtype)
            )
            # biosignals: the bucket guarantees every image carries exactly
            # the signals in ``sig``
            kw = {}
            for key, name in (("EEG", "eeg"), ("FNIRS", "fnirs"),
                              ("PPG", "ppg"), ("Motion", "motion")):
                if key in sig:
                    from loongx_tpu.models.encoders import canonicalise_signal

                    kw[name] = put(jnp.stack([
                        canonicalise_signal(
                            jnp.asarray(eff_of[f][key], jnp.float32), name
                        )[0]
                        for f in proc
                    ]))
            if text_embeds is not None:
                tkw = {
                    "prompt_embeds": put(jnp.asarray(
                        np.stack([text_embeds[f][0] for f in proc]),
                        pipeline.dtype,
                    )),
                    "pooled_prompt_embeds": put(jnp.asarray(
                        np.stack([text_embeds[f][1] for f in proc]),
                        pipeline.dtype,
                    )),
                }
            else:
                tkw = {"prompt": prompts}
            with mesh_context(mesh):
                out = sampling.generate(
                    pipeline,
                    condition_type=args.condition_type,
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
                    # chunked decode would serialize a SHARDED batch axis;
                    # under pure tensor parallelism (n_data == 1) the batch
                    # axis is unsharded and chunking stays valid (and is what
                    # caps the batched VAE-decode memory)
                    decode_chunk=(
                        None if n_data > 1
                        else getattr(args, "decode_chunk", None)
                    ),
                    **tkw,
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
    parser.add_argument("--staged_text", action="store_true",
                        help="batch mode: encode ALL prompts up front with "
                        "only T5/CLIP resident, free them, then load the "
                        "DiT and run the groups on precomputed embeds — "
                        "the 12B fuse-mode staging recipe (docs/WEIGHTS.md; "
                        "the int8 DiT and int8 T5-XXL cannot be co-resident "
                        "on one ~16 GB chip).  Combine with "
                        "--components flux,vae[,encoders,dgf] so the second "
                        "load stages the encoders out")
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
    captions = load_captions(args.caption_path)
    text_embeds = None
    if args.staged_text:
        # phase 1 BEFORE the DiT load: text encoders get the whole chip
        if not args.input_dir:
            parser.error("--staged_text applies to directory batch mode "
                         "(--input_dir)")
        text_embeds = staged_text_encode(
            args.checkpoint, list_images(args.input_dir), captions,
            args.prompt, int8=args.int8,
        )
    pipeline = LoongXPipeline.from_pretrained(
        args.checkpoint, components=components
    )
    if args.staged_text and components is None:
        # prompts are already embedded; keep the encoders off the device.
        # (At the 12B scale pass --components so they are never restored —
        # this fallback still pays their load-time peak.)
        pipeline.free_text_encoders()
    if args.tensor > 1 and _tree_has_key(
        pipeline.params.get("flux", {}), "to_qkv"
    ):
        parser.error(
            "--tensor > 1 on a checkpoint with baked serving transforms "
            "(fused qkv): the TP sharding rules address the unfused "
            "projection axes.  Re-convert without --serving for "
            "tensor-parallel serving."
        )
    if args.lora and _tree_has_key(pipeline.params.get("flux", {}), "to_qkv"):
        # ADVICE r4: attaching LoRA to a serving-baked (fused-qkv)
        # checkpoint would die later with a raw KeyError from
        # load_lora_state_dict — adapters address to_q/to_k/to_v
        # individually
        parser.error(
            "--lora on a checkpoint with baked serving transforms (fused "
            "qkv): LoRA adapters address the unfused q/k/v projections.  "
            "Re-convert without --serving to serve with LoRA."
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
        batch_edit(pipeline, args, brain_data, captions,
                   text_embeds=text_embeds)
    else:
        parser.error("provide --single_image + --prompt, or --input_dir")


if __name__ == "__main__":
    main()
