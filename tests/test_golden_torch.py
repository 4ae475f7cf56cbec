"""Golden numerics tests against torch (VERDICT round-1 Missing #3 / Weak #4).

Every ``utils/convert.convert_*_state`` function is exercised end to end:
a tiny random torch model (HF transformers where available, or the local
``flux_torch_fixture`` transcription of the reference math) produces a
state dict, conversion maps it onto our pytrees, and the JAX forward must
match the torch forward in fp32 to tight tolerance.  A transpose, bucketing,
or ordering bug in conversion or in the JAX model fails these immediately.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

ATOL = 2e-4


def _sd(model):
    """torch module -> flat {key: np.float32} state dict."""
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in model.state_dict().items()}


def _close(ours, theirs, atol=ATOL, label=""):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs.detach().cpu().numpy(), np.float32)
    assert ours.shape == theirs.shape, (label, ours.shape, theirs.shape)
    err = np.max(np.abs(ours - theirs))
    assert err < atol, f"{label}: max abs err {err:.2e} >= {atol}"


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def test_rope_golden():
    from tests.flux_torch_fixture import rope_cos_sin, apply_rotary_emb
    from loongx_tpu.ops.rope import rope_embed, apply_rope

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 32, size=(24, 3)).astype(np.float32)
    axes = (8, 12, 12)
    cos_t, sin_t = rope_cos_sin(torch.from_numpy(ids), axes)
    cos_j, sin_j = rope_embed(jnp.asarray(ids), axes)
    _close(cos_j, cos_t, label="rope cos")
    _close(sin_j, sin_t, label="rope sin")

    x = rng.standard_normal((2, 4, 24, 32)).astype(np.float32)
    out_t = apply_rotary_emb(torch.from_numpy(x), (cos_t, sin_t))
    out_j = apply_rope(jnp.asarray(x), cos_j, sin_j)
    _close(out_j, out_t, label="apply rope")


# ---------------------------------------------------------------------------
# FLUX blocks + full transformer (covers convert_flux_state)
# ---------------------------------------------------------------------------


def _flux_pair(seed=0):
    """(torch fixture, our converted params, cfg) with identical weights."""
    from tests.flux_torch_fixture import TorchFlux
    from loongx_tpu.models.flux.model import FluxConfig
    from loongx_tpu.utils.convert import convert_flux_state

    torch.manual_seed(seed)
    fixture = TorchFlux().eval()
    cfg = FluxConfig.tiny()
    params = convert_flux_state(_sd(fixture), cfg, dtype=jnp.float32)
    return fixture, params, cfg


def _flux_inputs(cfg, b=2, s_img=16, s_txt=8, seed=1, cond=True):
    from loongx_tpu.ops.latents import latent_image_ids

    rng = np.random.default_rng(seed)
    d = {
        "img": rng.standard_normal((b, s_img, cfg.in_channels)).astype(np.float32),
        "txt": rng.standard_normal((b, s_txt, cfg.joint_dim)).astype(np.float32),
        "pooled": rng.standard_normal((b, cfg.pooled_dim)).astype(np.float32),
        "timestep": np.full((b,), 0.7, np.float32),
        "guidance": np.full((b,), 4.0, np.float32),
        "img_ids": np.asarray(latent_image_ids(8, 8), np.float32),
        "txt_ids": np.zeros((s_txt, 3), np.float32),
    }
    if cond:
        d["cond"] = rng.standard_normal((b, s_img, cfg.in_channels)).astype(
            np.float32
        )
        d["cond_ids"] = d["img_ids"] + np.asarray([0.0, 0.0, -2.0], np.float32)
    return d


def _run_both(fixture, params, cfg, d, flags=None, c_factor=None,
              cn_double=None, cn_single=None):
    from loongx_tpu.models.flux.model import flux_forward

    t = lambda x: torch.from_numpy(x)
    with torch.no_grad():
        out_t = fixture(
            t(d["img"]), t(d["txt"]), t(d["pooled"]), t(d["timestep"]),
            t(d["img_ids"]), t(d["txt_ids"]), guidance=t(d["guidance"]),
            condition_latents=t(d["cond"]) if "cond" in d else None,
            condition_ids=t(d["cond_ids"]) if "cond" in d else None,
            model_config=dict(flags or {}),
            c_factor=None if c_factor is None else torch.tensor(c_factor),
            controlnet_block_samples=(
                None if cn_double is None else [t(x) for x in cn_double]
            ),
            controlnet_single_block_samples=(
                None if cn_single is None else [t(x) for x in cn_single]
            ),
        )
    out_j = flux_forward(
        params, cfg,
        img=jnp.asarray(d["img"]), txt=jnp.asarray(d["txt"]),
        pooled=jnp.asarray(d["pooled"]), timestep=jnp.asarray(d["timestep"]),
        guidance=jnp.asarray(d["guidance"]),
        img_ids=jnp.asarray(d["img_ids"]), txt_ids=jnp.asarray(d["txt_ids"]),
        cond=jnp.asarray(d["cond"]) if "cond" in d else None,
        cond_ids=jnp.asarray(d["cond_ids"]) if "cond" in d else None,
        flags=dict(flags or {}),
        c_factor=None if c_factor is None else jnp.float32(c_factor),
        attn_backend="xla",
        controlnet_block_samples=(
            None if cn_double is None else jnp.asarray(np.stack(cn_double))
        ),
        controlnet_single_block_samples=(
            None if cn_single is None else jnp.asarray(np.stack(cn_single))
        ),
    )
    return out_j, out_t


def test_flux_forward_golden_cond_union():
    fixture, params, cfg = _flux_pair()
    d = _flux_inputs(cfg)
    out_j, out_t = _run_both(fixture, params, cfg, d)
    _close(out_j, out_t, label="flux fwd cond union")


def test_flux_forward_golden_no_cond():
    fixture, params, cfg = _flux_pair()
    d = _flux_inputs(cfg, cond=False)
    out_j, out_t = _run_both(fixture, params, cfg, d)
    _close(out_j, out_t, label="flux fwd no-cond")


@pytest.mark.parametrize(
    "flags",
    [
        {"union_cond_attn": False},
        {"independent_condition": True},
        {"add_cond_attn": True},
    ],
    ids=["no_union", "independent", "add_cond_attn"],
)
def test_flux_forward_golden_modes(flags):
    fixture, params, cfg = _flux_pair()
    d = _flux_inputs(cfg)
    out_j, out_t = _run_both(fixture, params, cfg, d, flags=flags)
    _close(out_j, out_t, label=f"flux fwd {flags}")


def test_flux_forward_golden_c_factor():
    fixture, params, cfg = _flux_pair()
    d = _flux_inputs(cfg)
    out_j, out_t = _run_both(fixture, params, cfg, d, c_factor=1.7)
    _close(out_j, out_t, label="flux fwd c_factor")


def test_flux_forward_golden_controlnet():
    """ControlNet residual hooks (reference transformer.py:172-181,230-239)."""
    fixture, params, cfg = _flux_pair()
    d = _flux_inputs(cfg)
    rng = np.random.default_rng(7)
    b, s_img, hidden = 2, 16, cfg.hidden
    # 1 double sample for 2 blocks + 2 single samples for 2 blocks —
    # exercises the ceil-interval index mapping
    cn_double = [0.1 * rng.standard_normal((b, s_img, hidden)).astype(np.float32)]
    cn_single = [
        0.1 * rng.standard_normal((b, s_img, hidden)).astype(np.float32)
        for _ in range(2)
    ]
    out_j, out_t = _run_both(
        fixture, params, cfg, d, cn_double=cn_double, cn_single=cn_single
    )
    _close(out_j, out_t, label="flux fwd controlnet")
    # and the residuals actually change the output
    base_j, _ = _run_both(fixture, params, cfg, d)
    assert np.max(np.abs(np.asarray(out_j) - np.asarray(base_j))) > 1e-3


def test_double_block_golden():
    """One dual-stream block in isolation (reference block.py:179-278)."""
    from tests.flux_torch_fixture import TorchDoubleBlock, rope_cos_sin
    from loongx_tpu.models.flux.model import FluxConfig, double_block_forward
    from loongx_tpu.utils.convert import convert_flux_state

    torch.manual_seed(3)
    cfg = FluxConfig.tiny(guidance=False)
    h = cfg.hidden
    blk_t = TorchDoubleBlock(h, cfg.num_heads, cfg.head_dim).eval()
    # route through convert_flux_state by prefixing as block 0 of a 1-block model
    state = {f"transformer_blocks.0.{k}": v for k, v in _sd(blk_t).items()}

    from loongx_tpu.utils.convert import _lin  # noqa: F401 (layout doc)

    sub = {}
    import dataclasses
    cfg1 = dataclasses.replace(cfg, num_double_blocks=1, num_single_blocks=0)
    # build the rest of the tree with zeros so convert runs
    rng = np.random.default_rng(0)
    filler_names = {
        "x_embedder": (cfg.in_channels, h),
        "context_embedder": (cfg.joint_dim, h),
        "time_text_embed.timestep_embedder.linear_1": (256, h),
        "time_text_embed.timestep_embedder.linear_2": (h, h),
        "time_text_embed.text_embedder.linear_1": (cfg.pooled_dim, h),
        "time_text_embed.text_embedder.linear_2": (h, h),
        "norm_out.linear": (h, 2 * h),
        "proj_out": (h, cfg.in_channels),
    }
    for name, (i, o) in filler_names.items():
        state[f"{name}.weight"] = np.zeros((o, i), np.float32)
        state[f"{name}.bias"] = np.zeros((o,), np.float32)
    params = convert_flux_state(state, cfg1, dtype=jnp.float32)
    block = jax.tree.map(lambda x: x[0], params["double_blocks"])

    b, s_img, s_txt, s_cond = 2, 16, 8, 16
    img = rng.standard_normal((b, s_img, h)).astype(np.float32)
    txt = rng.standard_normal((b, s_txt, h)).astype(np.float32)
    cond = rng.standard_normal((b, s_cond, h)).astype(np.float32)
    temb = rng.standard_normal((b, h)).astype(np.float32)
    cond_temb = rng.standard_normal((b, h)).astype(np.float32)
    ids = rng.integers(0, 16, (s_txt + s_img + s_cond, 3)).astype(np.float32)

    cos_t, sin_t = rope_cos_sin(torch.from_numpy(ids), cfg.axes_dims)
    with torch.no_grad():
        enc_t, hid_t, cond_t = blk_t(
            torch.from_numpy(img), torch.from_numpy(txt),
            torch.from_numpy(cond), torch.from_numpy(temb),
            torch.from_numpy(cond_temb),
            image_rotary_emb=(cos_t[: s_txt + s_img], sin_t[: s_txt + s_img]),
            cond_rotary_emb=(cos_t[s_txt + s_img :], sin_t[s_txt + s_img :]),
        )

    from loongx_tpu.ops.rope import rope_embed

    rope_full = rope_embed(jnp.asarray(ids), cfg.axes_dims)
    txt_j, img_j, cond_j = double_block_forward(
        block, cfg, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(cond),
        jnp.asarray(temb), jnp.asarray(cond_temb), rope_full, {}, None, "xla",
    )
    _close(txt_j, enc_t, label="double block txt")
    _close(img_j, hid_t, label="double block img")
    _close(cond_j, cond_t, label="double block cond")


def test_single_block_golden():
    from tests.flux_torch_fixture import TorchSingleBlock, rope_cos_sin
    from loongx_tpu.models.flux.model import FluxConfig, single_block_forward
    from loongx_tpu.utils.convert import convert_flux_state
    import dataclasses

    torch.manual_seed(4)
    cfg = FluxConfig.tiny(guidance=False)
    h = cfg.hidden
    blk_t = TorchSingleBlock(h, cfg.num_heads, cfg.head_dim).eval()
    state = {f"single_transformer_blocks.0.{k}": v for k, v in _sd(blk_t).items()}
    cfg1 = dataclasses.replace(cfg, num_double_blocks=0, num_single_blocks=1)
    for name, (i, o) in {
        "x_embedder": (cfg.in_channels, h),
        "context_embedder": (cfg.joint_dim, h),
        "time_text_embed.timestep_embedder.linear_1": (256, h),
        "time_text_embed.timestep_embedder.linear_2": (h, h),
        "time_text_embed.text_embedder.linear_1": (cfg.pooled_dim, h),
        "time_text_embed.text_embedder.linear_2": (h, h),
        "norm_out.linear": (h, 2 * h),
        "proj_out": (h, cfg.in_channels),
    }.items():
        state[f"{name}.weight"] = np.zeros((o, i), np.float32)
        state[f"{name}.bias"] = np.zeros((o,), np.float32)
    params = convert_flux_state(state, cfg1, dtype=jnp.float32)
    block = jax.tree.map(lambda x: x[0], params["single_blocks"])

    rng = np.random.default_rng(5)
    b, s_x, s_cond = 2, 24, 16
    x = rng.standard_normal((b, s_x, h)).astype(np.float32)
    cond = rng.standard_normal((b, s_cond, h)).astype(np.float32)
    temb = rng.standard_normal((b, h)).astype(np.float32)
    cond_temb = rng.standard_normal((b, h)).astype(np.float32)
    ids = rng.integers(0, 16, (s_x + s_cond, 3)).astype(np.float32)

    cos_t, sin_t = rope_cos_sin(torch.from_numpy(ids), cfg.axes_dims)
    with torch.no_grad():
        hid_t, cond_t = blk_t(
            torch.from_numpy(x), torch.from_numpy(temb),
            image_rotary_emb=(cos_t[:s_x], sin_t[:s_x]),
            condition_latents=torch.from_numpy(cond),
            cond_temb=torch.from_numpy(cond_temb),
            cond_rotary_emb=(cos_t[s_x:], sin_t[s_x:]),
        )

    from loongx_tpu.ops.rope import rope_embed

    rope_full = rope_embed(jnp.asarray(ids), cfg.axes_dims)
    x_j, cond_j = single_block_forward(
        block, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(temb),
        jnp.asarray(cond_temb), rope_full, {}, None, "xla",
    )
    _close(x_j, hid_t, label="single block x")
    _close(cond_j, cond_t, label="single block cond")


# ---------------------------------------------------------------------------
# T5 (covers convert_t5_state)
# ---------------------------------------------------------------------------


def test_t5_golden():
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from loongx_tpu.models.text.t5 import T5Config, t5_encode
    from loongx_tpu.utils.convert import convert_t5_state

    cfg = T5Config.tiny()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.rel_pos_buckets,
        relative_attention_max_distance=cfg.rel_pos_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    params = convert_t5_state(_sd(model), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 20)).astype(np.int64)
    with torch.no_grad():
        out_t = model(input_ids=torch.from_numpy(ids)).last_hidden_state
    out_j = t5_encode(params, cfg, jnp.asarray(ids))
    _close(out_j, out_t, label="t5 encode")


# ---------------------------------------------------------------------------
# CLIP text (covers convert_clip_state)
# ---------------------------------------------------------------------------


def test_clip_text_golden():
    from transformers import CLIPTextConfig as HFCLIPTextConfig, CLIPTextModel
    from loongx_tpu.models.text.clip import CLIPTextConfig, clip_encode
    from loongx_tpu.utils.convert import convert_clip_state

    cfg = CLIPTextConfig.tiny()
    hf_cfg = HFCLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.d_ff, max_position_embeddings=cfg.max_positions,
        eos_token_id=cfg.eos_token_id, bos_token_id=126, pad_token_id=125,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_state(_sd(model), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(3)
    b, s = 3, cfg.max_positions
    ids = rng.integers(0, 124, size=(b, s)).astype(np.int64)
    # EOS at a distinct position per row (pooled output indexes it)
    for row, pos in enumerate([5, s - 1, 9]):
        ids[row, pos] = cfg.eos_token_id
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids))
    hidden_j, pooled_j = clip_encode(params, cfg, jnp.asarray(ids))
    _close(hidden_j, out.last_hidden_state, label="clip hidden")
    _close(pooled_j, out.pooler_output, label="clip pooled")


# ---------------------------------------------------------------------------
# ViT / DINO (covers convert_vit_state)
# ---------------------------------------------------------------------------


def test_vit_golden():
    from transformers import ViTConfig as HFViTConfig, ViTModel
    from loongx_tpu.models.vision import ViTConfig, vit_encode
    from loongx_tpu.utils.convert import convert_vit_state

    cfg = ViTConfig.tiny()
    hf_cfg = HFViTConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.d_ff,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(2)
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    params = convert_vit_state(_sd(model), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    imgs = rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        out_t = model(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state[:, 0]
    out_j = vit_encode(params, cfg, jnp.asarray(imgs))
    _close(out_j, out_t, label="vit cls")


# ---------------------------------------------------------------------------
# CLIP vision (covers convert_clip_vision_state)
# ---------------------------------------------------------------------------


def test_clip_vision_golden():
    from transformers import (
        CLIPVisionConfig as HFCLIPVisionConfig,
        CLIPVisionModelWithProjection,
    )
    from loongx_tpu.models.text.clip_vision import (
        CLIPVisionConfig, clip_vision_encode,
    )
    from loongx_tpu.utils.convert import convert_clip_vision_state

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = HFCLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.d_ff,
        projection_dim=cfg.projection_dim, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(3)
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    params = convert_clip_vision_state(_sd(model), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    imgs = rng.standard_normal(
        (2, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    with torch.no_grad():
        out_t = model(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).image_embeds
    out_j = clip_vision_encode(params, cfg, jnp.asarray(imgs))
    _close(out_j, out_t, label="clip vision embeds")


# ---------------------------------------------------------------------------
# VAE (covers convert_vae_state)
# ---------------------------------------------------------------------------


def test_vae_golden():
    from tests.vae_torch_fixture import TorchVAE
    from loongx_tpu.models.flux.vae import VAEConfig, vae_encode, vae_decode
    from loongx_tpu.utils.convert import convert_vae_state

    cfg = VAEConfig.tiny()
    torch.manual_seed(5)
    model = TorchVAE(
        block_channels=cfg.block_channels,
        latent_channels=cfg.latent_channels,
        layers_per_block=cfg.layers_per_block,
        groups=cfg.norm_groups,
    ).eval()
    params = convert_vae_state(_sd(model), cfg, dtype=jnp.float32)

    rng = np.random.default_rng(6)
    imgs = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = model.encode_moments(
            torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        )
    mean_j, logvar_j = vae_encode(params, cfg, jnp.asarray(imgs))
    _close(mean_j.transpose(0, 3, 1, 2), mean_t, label="vae mean")
    _close(logvar_j.transpose(0, 3, 1, 2), logvar_t, label="vae logvar")

    lat = rng.standard_normal(
        (2, 8, 8, cfg.latent_channels)
    ).astype(np.float32)
    with torch.no_grad():
        img_t = model.decode(torch.from_numpy(lat.transpose(0, 3, 1, 2)))
    img_j = vae_decode(params, cfg, jnp.asarray(lat))
    _close(img_j.transpose(0, 3, 1, 2), img_t, label="vae decode")
