"""Checkpointing: orbax for full pipeline/train state, safetensors for LoRA.

Closes the gaps SURVEY §5 flags in the reference: it saves LoRA safetensors
and a final state_dict but has **no optimizer-state save and no mid-run
resume** (reference model.py:526-531, train.py:214-217,
enable_checkpointing=False at train.py:185).  Here: orbax checkpoints carry
params + optimizer state + step, so training resumes exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# LoRA safetensors (interop format, reference save_lora parity)
# ---------------------------------------------------------------------------


def save_lora_safetensors(flux_params, path: str) -> str:
    """Save LoRA factors as a flat safetensors file
    (equivalent of FluxPipeline.save_lora_weights, reference model.py:526-531)."""
    from safetensors.numpy import save_file

    from loongx_tpu.train.lora import lora_state_dict

    os.makedirs(path, exist_ok=True)
    sd = {
        k.replace("/", "."): np.asarray(v, np.float32)
        for k, v in lora_state_dict(flux_params).items()
    }
    out = os.path.join(path, "lora.safetensors")
    save_file(sd, out)
    return out


def load_lora_safetensors(flux_params, path: str):
    from safetensors import safe_open

    from loongx_tpu.train.lora import load_lora_state_dict

    fname = path if path.endswith(".safetensors") else os.path.join(
        path, "lora.safetensors"
    )
    sd = {}
    with safe_open(fname, framework="np") as f:
        for k in f.keys():
            sd[k.replace(".lora_", "/lora_")] = f.get_tensor(k)
    # keys were stored with "." separators; restore "/" path form
    sd = {k.replace(".", "/"): v for k, v in sd.items()}
    return load_lora_state_dict(flux_params, sd)


# ---------------------------------------------------------------------------
# Orbax full-state checkpoints
# ---------------------------------------------------------------------------


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _restore_tree(ckptr, path: str):
    """Restore an orbax tree onto the CURRENT default device.

    A bare ``restore(path)`` resolves the sharding saved in the checkpoint
    metadata by device NAME — which fails (or silently pins to the wrong
    backend) when the checkpoint was written on a different platform, e.g.
    converted on the CPU host and served from a TPU (the 12B staging flow,
    cli/convert.py --quantize).  Restoring against an abstract
    shape/dtype target sidesteps the saved-device lookup entirely."""
    meta = ckptr.metadata(path)
    meta = getattr(meta, "item_metadata", meta)
    sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    target = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta,
        is_leaf=lambda m: hasattr(m, "shape"),
    )
    return ckptr.restore(path, target)


def save_train_checkpoint(
    path: str, step: int, trainable, opt_state,
    fingerprint: Optional[Dict[str, Any]] = None,
) -> str:
    """Save trainable params + optimizer state + step for exact resume.

    ``fingerprint`` (config facts that must match across a resume: LoRA
    rank/alpha, dataset type, optimizer type, model geometry) is written
    beside the step dirs; ``train.loop`` refuses to restore a checkpoint
    whose fingerprint mismatches the current config — resuming a different
    experiment's optimizer state would fail deep inside orbax or, worse,
    silently corrupt the run."""
    root = os.path.abspath(path)
    if fingerprint is not None:
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "fingerprint.json"), "w") as f:
            json.dump(fingerprint, f, indent=2, sort_keys=True)
    path = os.path.join(root, f"step_{step}")
    ckptr = _ckptr()
    ckptr.save(path, {"trainable": trainable, "opt_state": opt_state,
                      "step": jnp.asarray(step)})
    ckptr.wait_until_finished()
    return path


def load_fingerprint(orbax_dir: str) -> Optional[Dict[str, Any]]:
    """The config fingerprint saved beside a run's checkpoints (None for
    runs predating fingerprinting)."""
    fp = os.path.join(orbax_dir, "fingerprint.json")
    if not os.path.isfile(fp):
        return None
    with open(fp) as f:
        return json.load(f)


def load_train_checkpoint(path: str, abstract_state):
    """Restore (trainable, opt_state, step); ``abstract_state`` is a matching
    pytree of jax.ShapeDtypeStruct or concrete arrays for layout."""
    ckptr = _ckptr()
    target = {
        "trainable": abstract_state["trainable"],
        "opt_state": abstract_state["opt_state"],
        "step": jnp.asarray(0),
    }
    restored = ckptr.restore(path, target)
    return restored["trainable"], restored["opt_state"], int(restored["step"])


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(path, f"step_{max(steps)}")


# ---------------------------------------------------------------------------
# Pipeline save/load (converted-weights directory layout)
# ---------------------------------------------------------------------------


def save_pipeline(pipe, path: str) -> str:
    """Save a full pipeline: configs as json + params via orbax.

    Each component ("flux", "vae", "t5", ...) is saved as its OWN orbax
    checkpoint under ``params/<name>`` so serving can stage loads — at the
    12B flux-dev scale the int8 DiT (~12 GB) and int8 T5-XXL (~4.8 GB)
    cannot be co-resident on a ~16 GB chip; the recipe is: load text
    encoders, encode prompts, free them, then load the DiT
    (`load_pipeline(components=...)`, docs/WEIGHTS.md)."""
    os.makedirs(path, exist_ok=True)
    cfgs = {
        "flux": dataclasses.asdict(pipe.flux_cfg),
        "vae": dataclasses.asdict(pipe.vae_cfg),
        "t5": dataclasses.asdict(pipe.t5_cfg),
        "clip": dataclasses.asdict(pipe.clip_cfg),
        "dtype": str(jnp.dtype(pipe.dtype).name),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfgs, f, indent=2)
    ckptr = _ckptr()
    for name, tree in pipe.params.items():
        ckptr.save(
            os.path.abspath(os.path.join(path, "params", name)), tree
        )
    ckptr.wait_until_finished()
    return path


def load_pipeline(path: str, dtype=None, components=None):
    """Load a pipeline directory.  ``components`` restricts which param
    trees are restored (e.g. ("flux", "vae") for the staged 12B serving
    recipe); None loads everything present."""
    from loongx_tpu.models.flux.model import FluxConfig
    from loongx_tpu.models.flux.vae import VAEConfig
    from loongx_tpu.models.pipeline import LoongXPipeline
    from loongx_tpu.models.text.clip import CLIPTextConfig
    from loongx_tpu.models.text.t5 import T5Config

    with open(os.path.join(path, "config.json")) as f:
        cfgs = json.load(f)

    def build(cls, d):
        for k, v in d.items():
            if isinstance(v, list):
                d[k] = tuple(v)
        return cls(**d)

    flux_cfg = build(FluxConfig, cfgs["flux"])
    vae_cfg = build(VAEConfig, cfgs["vae"])
    t5_cfg = build(T5Config, cfgs["t5"])
    clip_cfg = build(CLIPTextConfig, cfgs["clip"])
    ckptr = _ckptr()
    params_dir = os.path.abspath(os.path.join(path, "params"))
    sub = [
        d for d in (sorted(os.listdir(params_dir))
                    if os.path.isdir(params_dir) else [])
        if os.path.isdir(os.path.join(params_dir, d))
        and not d.startswith(("_", "."))
        and d not in ("ocdbt.process_0", "d")
    ]
    per_component = any(
        os.path.exists(os.path.join(params_dir, d, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(params_dir, d, "_METADATA"))
        for d in sub
    )
    if per_component:
        names = [d for d in sub if components is None or d in components]
        params = {
            name: _restore_tree(ckptr, os.path.join(params_dir, name))
            for name in names
        }
    else:
        # pre-round-3 layout: one orbax tree holding every component
        params = _restore_tree(ckptr, params_dir)
        if components is not None:
            params = {k: v for k, v in params.items() if k in components}

    def _tok(cls_name, sub):
        tok_dir = os.path.join(path, sub)
        if not os.path.isdir(tok_dir):
            return None
        try:
            import transformers

            return getattr(transformers, cls_name).from_pretrained(tok_dir)
        except Exception as exc:
            print(f"[checkpoint] tokenizer {sub} unavailable: {exc}")
            return None

    return LoongXPipeline(
        flux_cfg=flux_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg, clip_cfg=clip_cfg,
        params=params,
        dtype=dtype or jnp.dtype(cfgs.get("dtype", "bfloat16")),
        t5_tokenizer=_tok("T5TokenizerFast", "t5_tokenizer"),
        clip_tokenizer=_tok("CLIPTokenizer", "clip_tokenizer"),
    )
