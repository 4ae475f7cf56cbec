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
    """Save a full pipeline: configs as json + params via orbax."""
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
    ckptr.save(os.path.abspath(os.path.join(path, "params")), pipe.params)
    ckptr.wait_until_finished()
    return path


def load_pipeline(path: str, dtype=None):
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
    params = ckptr.restore(os.path.abspath(os.path.join(path, "params")))

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
