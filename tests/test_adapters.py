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


def test_adapter_switch_does_not_blend_disjoint_target_sets(pipe):
    """Activating B after A must zero A's contribution even when A and B
    target different module sets (code-review r2 finding)."""
    full = _random_adapter(pipe, 5)
    a_state = {k: v for k, v in full.items() if k.startswith("double_blocks")}
    b_state = {k: v for k, v in full.items() if k.startswith("single_blocks")}
    reg = AdapterRegistry()
    reg.add("a", a_state)
    reg.add("b", b_state)
    pipe.adapters = reg
    pipe.active_adapter = None

    pipe.params["flux"] = reg.deactivate(pipe.params["flux"])
    base = _fwd(pipe)
    pipe.set_adapters("a")
    out_a = _fwd(pipe)
    pipe.set_adapters("b")
    out_ab = _fwd(pipe)
    # B alone on a clean tree:
    pipe.params["flux"] = reg.deactivate(pipe.params["flux"])
    pipe.active_adapter = None
    pipe.set_adapters("b")
    out_b = _fwd(pipe)
    np.testing.assert_array_equal(out_ab, out_b)
    assert not np.allclose(out_a, out_b)
    assert not np.allclose(out_b, base)


def test_adapter_rank_switch(pipe):
    """Adapters of different ranks swap without shape errors."""
    from loongx_tpu.train.lora import lora_state_dict, add_lora

    r2_state = _random_adapter(pipe, 6)  # rank 2 (fixture tree)
    tree_r4 = add_lora(
        jax.random.key(9),
        jax.tree.map(lambda x: x, pipe.params["flux"]),
    )  # default r=4 over same targets — shapes differ
    # strip to fresh rank-4 factors with random b
    rng = np.random.default_rng(7)
    r4_state = {
        k: jnp.asarray(0.1 * rng.standard_normal(v.shape), jnp.float32)
        for k, v in lora_state_dict(tree_r4).items()
        if k.endswith("lora_a") or k.endswith("lora_b")
    }
    reg = AdapterRegistry()
    reg.add("r2", r2_state)
    reg.add("r4", r4_state)
    pipe.adapters = reg
    pipe.active_adapter = None
    pipe.set_adapters("r2")
    out2 = _fwd(pipe)
    pipe.set_adapters("r4")
    out4 = _fwd(pipe)
    assert not np.allclose(out2, out4)


def test_generate_falls_back_to_base_for_unregistered_type(pipe):
    from PIL import Image

    from loongx_tpu.sampling import Condition, generate

    reg = AdapterRegistry()
    reg.add("canny", _random_adapter(pipe, 8))
    pipe.adapters = reg
    pipe.active_adapter = None
    pipe.params["flux"] = reg.deactivate(pipe.params["flux"])

    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (16, 16, 3)).astype(np.uint8)
    )
    kw = dict(
        height=16, width=16, num_inference_steps=1, guidance_scale=3.5,
        seed=0, attn_backend="xla", output_type="latent",
        prompt_embeds=jnp.zeros((1, 8, pipe.flux_cfg.joint_dim)),
        pooled_prompt_embeds=jnp.zeros((1, pipe.flux_cfg.pooled_dim)),
        model_config={"latent_lora": True},
    )
    # no 'subject' adapter registered -> base weights, no KeyError
    out_subject = generate(
        pipe, conditions=[Condition("subject", raw_img=img)], **kw
    )
    assert pipe.active_adapter is None
    out_canny = generate(
        pipe, conditions=[Condition("canny", raw_img=img)], **kw
    )
    assert pipe.active_adapter == "canny"
    assert not np.allclose(np.asarray(out_subject), np.asarray(out_canny))


def test_add_from_params_preserves_trained_scale(pipe):
    """add_from_params must keep the trained alpha/r lora_scale (not 1.0)."""
    from loongx_tpu.train.lora import _walk_linears

    tree = jax.tree.map(lambda x: x, pipe.params["flux"])
    for _, leaf in _walk_linears(tree):
        if "lora_scale" in leaf:
            leaf["lora_scale"] = jnp.full_like(leaf["lora_scale"], 0.5)
            leaf["lora_b"] = jnp.ones_like(leaf["lora_b"])  # visible delta
    reg = AdapterRegistry()
    reg.add_from_params("trained", tree)
    out = reg.activate(pipe.params["flux"], "trained")
    scales = [
        float(leaf["lora_scale"].reshape(-1)[0])
        for _, leaf in _walk_linears(out)
        if "lora_scale" in leaf
    ]
    assert scales and all(s == 0.5 for s in scales), scales


def test_partitioned_trainable_tree_exports_clean_state(pipe):
    """lora_state_dict on a masked trainable tree (frozen leaves None, as in
    callbacks.save_checkpoint) must skip None leaves instead of serialising
    NaN lora_scale scalars (r2 review finding)."""
    from loongx_tpu.train.step import partition, trainable_mask

    params = {"flux": pipe.params["flux"]}
    trainable, _ = partition(params, trainable_mask(params))
    state = lora_state_dict(trainable["flux"])
    assert state, "expected lora leaves in the trainable tree"
    assert not any(k.endswith("/lora_scale") for k in state), (
        "frozen (None) lora_scale must not be exported from a masked tree"
    )
    for k, v in state.items():
        assert v is not None, k


def test_second_adapter_from_scaleless_state_is_not_zeroed(pipe):
    """Registering adapter #2 from a lora_a/lora_b-only file (the format of
    pre-scale checkpoints) after adapter #1 was deactivated must reset the
    zeroed lora_scale to 1.0, not capture the zeros (r2 review finding)."""
    from loongx_tpu.train.lora import load_lora_state_dict

    reg = AdapterRegistry()
    tree = pipe.params["flux"]

    first = _random_adapter(pipe, 11)
    reg.add("first", first)
    tree = reg.deactivate(tree)  # zero the live lora_scale leaves

    scaleless = {
        k: v for k, v in _random_adapter(pipe, 12).items()
        if not k.endswith("/lora_scale")
    }
    tree = load_lora_state_dict(tree, scaleless, strict_shapes=False)
    captured = lora_state_dict(tree)
    reg.add("second", captured)

    tree = reg.activate(tree, "second")
    scales = [
        np.asarray(v) for k, v in lora_state_dict(tree).items()
        if k.endswith("/lora_scale")
    ]
    assert scales and all((s == 1.0).all() for s in scales), (
        "second adapter inherited the deactivated zeros"
    )


def test_merge_lora_refuses_quantized_base(pipe):
    """merge_lora on an int8-quantized tree must fail loudly, not silently
    skip the fold (r2 review finding)."""
    from loongx_tpu.train.lora import merge_lora

    qtree = {
        "blk": {
            "kernel_q": jnp.zeros((8, 8), jnp.int8),
            "kernel_scale": jnp.ones((8,), jnp.float32),
            "lora_a": jnp.zeros((8, 2), jnp.float32),
            "lora_b": jnp.zeros((2, 8), jnp.float32),
            "lora_scale": jnp.ones((), jnp.float32),
        }
    }
    with pytest.raises(ValueError, match="quantized"):
        merge_lora(qtree)
