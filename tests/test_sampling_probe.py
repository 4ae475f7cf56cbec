"""Sample-probe callback (reference generate_a_sample equivalent)."""

import os

import jax
import numpy as np
import pytest

from loongx_tpu.models.pipeline import LoongXPipeline
from loongx_tpu.train.sampling_probe import SampleProbe


def test_probe_renders_and_saves(tmp_path):
    pipe = LoongXPipeline.tiny(jax.random.key(0))
    probe_img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    probe = SampleProbe(
        pipe,
        condition_type="subject",
        probe_image=probe_img,
        out_dir=str(tmp_path),
        num_steps=1,
        size=16,
    )
    path = probe(step=100)
    assert os.path.exists(path)
    assert path.endswith("step_100.jpg")


def test_probe_fixed_seed_reproducible(tmp_path):
    from PIL import Image

    pipe = LoongXPipeline.tiny(jax.random.key(0))
    probe = SampleProbe(
        pipe, condition_type="subject",
        probe_image=np.zeros((16, 16, 3), np.float32),
        out_dir=str(tmp_path), num_steps=1, size=16, seed=42,
    )
    p1 = probe(step=1)
    p2 = probe(step=2)
    a = np.asarray(Image.open(p1))
    b = np.asarray(Image.open(p2))
    np.testing.assert_array_equal(a, b)


def test_probe_with_partitioned_trainable_view(tmp_path):
    """The train loop hands the probe the FULL pipeline partition (None
    leaves on frozen params); the probe must recombine it with the full
    frozen tree (regression: the branch was inverted and every in-training
    probe raised a dict-key mismatch, silently producing no images)."""
    import jax.numpy as jnp

    from loongx_tpu.train.lora import add_lora
    from loongx_tpu.train.step import partition, trainable_mask

    pipe = LoongXPipeline.tiny(jax.random.key(0))
    pipe.params["flux"] = add_lora(
        jax.random.key(1), pipe.params["flux"], r=2, dtype=jnp.float32
    )
    mask = trainable_mask(pipe.params)
    trainable, _frozen = partition(pipe.params, mask)
    probe = SampleProbe(
        pipe,
        condition_type="subject",
        probe_image=np.zeros((16, 16, 3), np.float32),
        out_dir=str(tmp_path),
        num_steps=1,
        size=16,
        trainable_view=lambda: trainable,
    )
    path = probe(step=7)
    assert os.path.exists(path)
