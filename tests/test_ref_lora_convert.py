"""Reference (peft-layout) LoRA checkpoint conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from loongx_tpu.models.flux import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.utils.convert import convert_reference_lora, _our_lora_path


def test_path_mapping():
    assert _our_lora_path("transformer.x_embedder") == ("x_embedder", None)
    assert _our_lora_path("transformer_blocks.3.attn.to_q") == (
        "double_blocks/attn/to_q", 3)
    assert _our_lora_path("single_transformer_blocks.12.proj_out") == (
        "single_blocks/proj_out", 12)
    assert _our_lora_path("transformer_blocks.0.attn.to_out.0") == (
        "double_blocks/attn/to_out", 0)
    assert _our_lora_path("transformer_blocks.0.ff.net.2") == (
        "double_blocks/ff/out", 0)
    assert _our_lora_path("unknown.module") == (None, None)


def test_convert_and_forward_effect():
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    h = cfg.hidden
    r = 2
    state = {}
    for i in range(cfg.num_double_blocks):
        for name, (din, dout) in {
            "attn.to_q": (h, h), "attn.to_k": (h, h), "attn.to_v": (h, h),
            "attn.to_out.0": (h, h), "norm1.linear": (h, 6 * h),
            "ff.net.2": (cfg.mlp_ratio * h, h),
        }.items():
            state[f"transformer.transformer_blocks.{i}.{name}.lora_A.weight"] = (
                rng.randn(r, din).astype(np.float32) * 0.1)
            state[f"transformer.transformer_blocks.{i}.{name}.lora_B.weight"] = (
                rng.randn(dout, r).astype(np.float32) * 0.1)
    state["transformer.x_embedder.lora_A.weight"] = (
        rng.randn(r, cfg.in_channels).astype(np.float32) * 0.1)
    state["transformer.x_embedder.lora_B.weight"] = (
        rng.randn(h, r).astype(np.float32) * 0.1)

    lp = convert_reference_lora(state, params, cfg, scale=1.0,
                                dtype=jnp.float32)
    blk = lp["double_blocks"]["attn"]["to_q"]
    assert blk["lora_a"].shape == (cfg.num_double_blocks, h, r)
    assert blk["lora_b"].shape == (cfg.num_double_blocks, r, h)
    # A/B transposed correctly
    np.testing.assert_allclose(
        np.asarray(blk["lora_a"][1]),
        state["transformer.transformer_blocks.1.attn.to_q.lora_A.weight"].T,
        atol=1e-6,
    )

    batch = dict(
        img=jnp.ones((1, 4, cfg.in_channels)),
        txt=jnp.ones((1, 2, cfg.joint_dim)),
        pooled=jnp.ones((1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]), guidance=jnp.array([3.5]),
        img_ids=latent_image_ids(4, 4), txt_ids=jnp.zeros((2, 3)),
        cond=jnp.ones((1, 4, cfg.in_channels)),
        cond_ids=latent_image_ids(4, 4),
    )
    out0 = flux_forward(params, cfg, **batch, attn_backend="xla")
    out1 = flux_forward(lp, cfg, **batch, attn_backend="xla")
    # nonzero B -> LoRA active on the condition stream -> output changes
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_convert_onto_split_proj_out(monkeypatch):
    """A reference LoRA targeting the fused single-block proj_out converts
    onto a quantize-time split tree (ops/quant.split_single_proj_out) by
    routing its rows; the forward matches converting onto the unsplit tree
    (the infer.py --int8 --lora ordering: quantize/split first, attach
    after)."""
    from loongx_tpu.ops.quant import quantize_tree, split_single_proj_out

    monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    params["single_blocks"] = quantize_tree(params["single_blocks"])
    rng = np.random.RandomState(1)
    h, r = cfg.hidden, 2
    k_fused = h + cfg.mlp_ratio * h
    state = {}
    for i in range(cfg.num_single_blocks):
        state[
            f"transformer.single_transformer_blocks.{i}.proj_out.lora_A.weight"
        ] = rng.randn(r, k_fused).astype(np.float32) * 0.1
        state[
            f"transformer.single_transformer_blocks.{i}.proj_out.lora_B.weight"
        ] = rng.randn(h, r).astype(np.float32) * 0.1

    ref_tree = convert_reference_lora(state, params, cfg, dtype=jnp.float32)
    split = split_single_proj_out(params, cfg.hidden)
    split_tree = convert_reference_lora(state, split, cfg, dtype=jnp.float32)
    sgl = split_tree["single_blocks"]
    assert sgl["proj_out"]["lora_a"].shape == (cfg.num_single_blocks, h, r)
    assert sgl["proj_out_mlp"]["lora_a"].shape == (
        cfg.num_single_blocks, cfg.mlp_ratio * h, r)

    batch = dict(
        img=jnp.ones((1, 4, cfg.in_channels)),
        txt=jnp.ones((1, 2, cfg.joint_dim)),
        pooled=jnp.ones((1, cfg.pooled_dim)),
        timestep=jnp.array([0.5]),
        guidance=jnp.array([3.5]),
        img_ids=latent_image_ids(4, 4),
        txt_ids=jnp.zeros((2, 3)),
        flags={"latent_lora": True},
    )
    ref = flux_forward(ref_tree, cfg, **batch, attn_backend="xla")
    got = flux_forward(split_tree, cfg, **batch, attn_backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5,
    )


def test_unrecognized_lora_layout_raises():
    """A checkpoint full of LoRA tensors that map onto no known flux module
    must raise instead of silently returning the base weights (serving an
    un-adapted model the user believes is adapted)."""
    import pytest

    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    state = {
        "some.unknown.layout.lora_A.weight": np.zeros((2, 4), np.float32),
        "some.unknown.layout.lora_B.weight": np.zeros((4, 2), np.float32),
    }
    with pytest.raises(ValueError, match="none map"):
        convert_reference_lora(state, params, cfg)


def test_peft_prefix_and_adapter_named_keys():
    """Raw peft layouts ('base_model.model.' prefix, 'lora_A.default.weight'
    adapter naming) load like the FluxPipeline.save_lora_weights layout."""
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    h, r = cfg.hidden, 2
    state = {
        "base_model.model.transformer_blocks.0.attn.to_q"
        ".lora_A.default.weight": rng.randn(r, h).astype(np.float32),
        "base_model.model.transformer_blocks.0.attn.to_q"
        ".lora_B.default.weight": rng.randn(h, r).astype(np.float32),
    }
    lp = convert_reference_lora(state, params, cfg, dtype=jnp.float32)
    blk = lp["double_blocks"]["attn"]["to_q"]
    assert blk["lora_a"].shape == (cfg.num_double_blocks, h, r)
    assert float(jnp.abs(blk["lora_a"][0]).sum()) > 0
    assert float(jnp.abs(blk["lora_a"][1]).sum()) == 0  # missing block -> 0
