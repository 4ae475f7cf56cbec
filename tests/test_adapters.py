"""Multi-adapter LoRA registry (VERDICT r1 Missing #4).

The reference selects a named peft adapter per condition type at generate
time (/root/reference/src/flux/generate.py:279).  These tests prove two
registered adapters produce different outputs, switching is exact (activating
A, then B, then A reproduces A's output bit-for-bit), and generate() routes
the switch through the condition type.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loongx_tpu.models.pipeline import LoongXPipeline
from loongx_tpu.train.adapters import AdapterRegistry
from loongx_tpu.train.lora import add_lora, lora_state_dict


@pytest.fixture(scope="module")
def pipe():
    p = LoongXPipeline.tiny(jax.random.key(0))
    p.params["flux"] = add_lora(
        jax.random.key(1), p.params["flux"], r=2, dtype=jnp.float32
    )
    return p


def _random_adapter(pipe, seed):
    """A full-strength random adapter state (lora_b nonzero so the delta is
    visible in outputs)."""
    state = lora_state_dict(pipe.params["flux"])
    rng = np.random.default_rng(seed)
    return {
        k: jnp.asarray(
            0.1 * rng.standard_normal(v.shape).astype(np.float32)
        )
        for k, v in state.items()
    }


def _fwd(pipe):
    from loongx_tpu.models.flux.model import flux_forward
    from loongx_tpu.ops.latents import latent_image_ids

    cfg = pipe.flux_cfg
    rng = np.random.default_rng(0)
    return np.asarray(
        flux_forward(
            pipe.params["flux"], cfg,
            img=jnp.asarray(rng.standard_normal((1, 16, cfg.in_channels)),
                            jnp.float32),
            txt=jnp.asarray(rng.standard_normal((1, 8, cfg.joint_dim)),
                            jnp.float32),
            pooled=jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                               jnp.float32),
            timestep=jnp.full((1,), 0.5),
            guidance=jnp.full((1,), 3.5),
            img_ids=latent_image_ids(8, 8),
            txt_ids=jnp.zeros((8, 3)),
            flags={"latent_lora": True},
            attn_backend="xla",
        )
    )


def test_two_adapters_differ_and_switch_exactly(pipe):
    reg = AdapterRegistry()
    reg.add("canny", _random_adapter(pipe, 1))
    reg.add("depth", _random_adapter(pipe, 2))
    pipe.adapters = reg

    assert pipe.set_adapters("canny")
    out_canny = _fwd(pipe)
    assert pipe.set_adapters("depth")
    out_depth = _fwd(pipe)
    assert not np.allclose(out_canny, out_depth)

    # switching back is exact
    pipe.set_adapters("canny")
    np.testing.assert_array_equal(_fwd(pipe), out_canny)

    # unknown adapter raises with the available names
    with pytest.raises(KeyError, match="canny"):
        pipe.set_adapters("nope")

    # deactivate zeroes the delta without removing leaves
    base = pipe.adapters.deactivate(pipe.params["flux"])
    saved = pipe.params["flux"]
    pipe.params["flux"] = base
    out_base = _fwd(pipe)
    pipe.params["flux"] = saved
    assert not np.allclose(out_base, out_canny)


def test_generate_routes_adapter_by_condition_type(pipe):
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate

    reg = AdapterRegistry()
    reg.add("subject", _random_adapter(pipe, 3))
    reg.add("canny", _random_adapter(pipe, 4))
    pipe.adapters = reg
    pipe.active_adapter = None

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (16, 16, 3)).astype(np.uint8)
    )
    kw = dict(
        height=16, width=16, num_inference_steps=2, guidance_scale=3.5,
        seed=0, attn_backend="xla", output_type="np",
        prompt_embeds=jnp.zeros((1, 8, pipe.flux_cfg.joint_dim)),
        pooled_prompt_embeds=jnp.zeros((1, pipe.flux_cfg.pooled_dim)),
        model_config={"latent_lora": True},
    )
    out_subject = generate(
        pipe,
        conditions=[Condition("subject", raw_img=img)],
        **kw,
    )
    assert pipe.active_adapter == "subject"
    out_canny = generate(
        pipe,
        conditions=[Condition("canny", raw_img=img)],
        **kw,
    )
    assert pipe.active_adapter == "canny"
    assert not np.allclose(out_subject, out_canny)
