"""Periodic sample generation during training (visual regression probes).

Equivalent of the reference's ``TrainingCallback.generate_a_sample``
(/root/reference/src/train/callbacks.py:91-328): every ``sample_interval``
steps, render a fixed probe (fixed seed, fixed condition input per condition
type) with the current LoRA weights and save it for eyeballing drift.

The reference hardcodes test-image paths per condition type; here the probe
spec is injectable, with the same fixed-seed behaviour (seed 42 generator,
callbacks.py:105-106).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


class SampleProbe:
    """Callable for TrainingCallback.sample_fn."""

    def __init__(
        self,
        pipeline,
        condition_type: str = "subject",
        probe_image: Optional[np.ndarray] = None,  # [H,W,3] float [0,1]
        prompt: str = "",
        biosignals: Optional[Dict[str, np.ndarray]] = None,
        out_dir: str = "runs/samples",
        seed: int = 42,
        num_steps: int = 8,
        size: int = 512,
        trainable_view=None,
    ):
        self.pipeline = pipeline
        self.condition_type = condition_type
        self.probe_image = probe_image
        self.prompt = prompt
        self.biosignals = biosignals or {}
        self.out_dir = out_dir
        self.seed = seed
        self.num_steps = num_steps
        self.size = size
        # Optional callable returning the current trainable tree so probes
        # render with up-to-date LoRA weights.
        self.trainable_view = trainable_view

    def __call__(self, step: int):
        from PIL import Image

        from loongx_tpu.sampling import Condition, generate
        from loongx_tpu.train.step import combine

        pipeline = self.pipeline
        if self.trainable_view is not None:
            # the trainable tree is either the full pipeline partition (the
            # train loop's wiring — pair it with the full frozen params) or a
            # bare flux tree (pair with params['flux'] and re-wrap)
            trainable = self.trainable_view()
            if "flux" in trainable:
                merged = combine(trainable, pipeline.params)
            else:
                merged = {"flux": combine(trainable, pipeline.params["flux"])}
            pipeline = type(pipeline)(
                **{**pipeline.__dict__, "params": {**pipeline.params, **merged}}
            )

        conditions = None
        if self.probe_image is not None:
            img = (self.probe_image * 255).astype(np.uint8)
            conditions = [
                Condition(self.condition_type, condition=img)
            ]
        use_brain = bool(self.biosignals)
        out = generate(
            pipeline,
            prompt=self.prompt if pipeline.t5_tokenizer else None,
            prompt_embeds=None if pipeline.t5_tokenizer
            else _zero_embeds(pipeline, fuse=use_brain),
            pooled_prompt_embeds=None if pipeline.t5_tokenizer else _zero_pooled(pipeline),
            conditions=conditions,
            height=self.size,
            width=self.size,
            num_inference_steps=self.num_steps,
            seed=self.seed,
            eeg=self.biosignals.get("EEG"),
            fnirs=self.biosignals.get("FNIRS"),
            ppg=self.biosignals.get("PPG"),
            motion=self.biosignals.get("Motion"),
            use_brain_condition=use_brain,
            fuse_flag=True,
            # training-path DUAN wiring: the probe renders what the train
            # step optimizes, and (unlike the infer wiring) it supports the
            # L-Mind partial-signal samples (fNIRS optional, data.py:81)
            fuse_mode="train",
            output_type="uint8",
        )
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"step_{step}.jpg")
        Image.fromarray(out[0]).save(path)
        print(f"[probe] saved {path}")
        return path


def _zero_embeds(pipeline, fuse: bool = False):
    import jax.numpy as jnp

    # when the probe will DUAN-fuse brain embeds into these (fuse_flag),
    # the token count must equal the DGF's fixed channel count (512 —
    # generate() validates this at its boundary); otherwise 8 tokens keep
    # the tokenizer-less probes cheap
    dgf = pipeline.params.get("dgf")
    s = (
        dgf["duan_prompt"]["gate_in"]["kernel"].shape[0]
        if fuse and dgf is not None else 8
    )
    return jnp.zeros((1, s, pipeline.flux_cfg.joint_dim), pipeline.dtype)


def _zero_pooled(pipeline):
    import jax.numpy as jnp

    return jnp.zeros((1, pipeline.flux_cfg.pooled_dim), pipeline.dtype)
