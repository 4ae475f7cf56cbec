"""Smoke + invariance tests for the FLUX DiT backbone (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.models.flux import FluxConfig, init_flux_params, flux_forward
from loongx_tpu.ops.latents import latent_image_ids


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = FluxConfig.tiny()
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
    b, s_txt, s_img, s_cond = 2, 6, 16, 8
    key = jax.random.key(1)
    ks = jax.random.split(key, 6)
    batch = dict(
        img=jax.random.normal(ks[0], (b, s_img, cfg.in_channels)),
        txt=jax.random.normal(ks[1], (b, s_txt, cfg.joint_dim)),
        pooled=jax.random.normal(ks[2], (b, cfg.pooled_dim)),
        timestep=jnp.array([0.5, 0.9]),
        guidance=jnp.array([3.5, 3.5]),
        img_ids=latent_image_ids(8, 8),
        txt_ids=jnp.zeros((s_txt, 3)),
        cond=jax.random.normal(ks[3], (b, s_cond, cfg.in_channels)),
        cond_ids=latent_image_ids(8, 4),
    )
    return cfg, params, batch


class TestFluxForward:
    def test_output_shape_with_cond(self, tiny_setup):
        cfg, params, batch = tiny_setup
        out = flux_forward(params, cfg, **batch, attn_backend="xla")
        assert out.shape == batch["img"].shape
        assert jnp.all(jnp.isfinite(out))

    def test_output_shape_no_cond(self, tiny_setup):
        cfg, params, batch = tiny_setup
        b2 = {k: v for k, v in batch.items() if k not in ("cond", "cond_ids")}
        out = flux_forward(params, cfg, **b2, attn_backend="xla")
        assert out.shape == batch["img"].shape

    def test_deterministic(self, tiny_setup):
        cfg, params, batch = tiny_setup
        a = flux_forward(params, cfg, **batch, attn_backend="xla")
        b = flux_forward(params, cfg, **batch, attn_backend="xla")
        np.testing.assert_array_equal(a, b)

    def test_remat_matches(self, tiny_setup):
        cfg, params, batch = tiny_setup
        a = flux_forward(params, cfg, **batch, attn_backend="xla", remat=False)
        b = flux_forward(params, cfg, **batch, attn_backend="xla", remat=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_jit_compiles(self, tiny_setup):
        cfg, params, batch = tiny_setup

        @jax.jit
        def f(params, batch):
            return flux_forward(params, cfg, **batch, attn_backend="xla")

        out = f(params, batch)
        assert out.shape == batch["img"].shape

    def test_condition_affects_output(self, tiny_setup):
        cfg, params, batch = tiny_setup
        out1 = flux_forward(params, cfg, **batch, attn_backend="xla")
        b2 = dict(batch)
        b2["cond"] = batch["cond"] + 1.0
        out2 = flux_forward(params, cfg, **b2, attn_backend="xla")
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_no_union_insulates_latents_from_cond(self, tiny_setup):
        """With union_cond_attn=False and add_cond_attn=False, changing the
        condition must NOT change the image output (fully blocked attention)."""
        cfg, params, batch = tiny_setup
        flags = {"union_cond_attn": False}
        out1 = flux_forward(params, cfg, **batch, flags=flags, attn_backend="xla")
        b2 = dict(batch)
        b2["cond"] = batch["cond"] * 2.0 + 3.0
        out2 = flux_forward(params, cfg, **b2, flags=flags, attn_backend="xla")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_timestep_affects_output(self, tiny_setup):
        cfg, params, batch = tiny_setup
        out1 = flux_forward(params, cfg, **batch, attn_backend="xla")
        b2 = dict(batch)
        b2["timestep"] = jnp.array([0.1, 0.2])
        out2 = flux_forward(params, cfg, **b2, attn_backend="xla")
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_schnell_no_guidance(self):
        cfg = FluxConfig.tiny(guidance=False)
        params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)
        out = flux_forward(
            params, cfg,
            img=jnp.ones((1, 4, cfg.in_channels)),
            txt=jnp.ones((1, 2, cfg.joint_dim)),
            pooled=jnp.ones((1, cfg.pooled_dim)),
            timestep=jnp.array([0.5]),
            img_ids=latent_image_ids(4, 4),
            txt_ids=jnp.zeros((2, 3)),
            attn_backend="xla",
        )
        assert out.shape == (1, 4, cfg.in_channels)

    def test_grad_flows(self, tiny_setup):
        cfg, params, batch = tiny_setup

        def loss_fn(p):
            out = flux_forward(p, cfg, **batch, attn_backend="xla", remat=True)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss_fn)(params)
        gnorm = jnp.sqrt(
            sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in jax.tree.leaves(g))
        )
        assert jnp.isfinite(gnorm) and gnorm > 0


def test_mixed_input_dtypes_stable(tiny_setup):
    """flux_forward canonicalizes float inputs to the latents' dtype: f32
    prompt/pooled embeddings over bf16 latents+cond must not promote the
    block-scan carries mid-scan (regression: lax.scan carry-type failure in
    quantized generate when user-supplied embeddings were f32)."""
    cfg, _params, batch = tiny_setup
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x,
        init_flux_params(jax.random.key(0), cfg, dtype=jnp.bfloat16),
    )
    mixed = dict(
        batch,
        img=batch["img"].astype(jnp.bfloat16),
        cond=batch["cond"].astype(jnp.bfloat16),
        txt=batch["txt"].astype(jnp.float32),
        pooled=batch["pooled"].astype(jnp.float32),
    )
    out = flux_forward(params, cfg, **mixed, attn_backend="xla")
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_f32_controlnet_residuals_over_bf16_latents(tiny_setup):
    """ControlNet residual stacks are canonicalized to the latents' dtype
    like every other float input (regression: an f32 [N, B, S, H] stack over
    bf16 latents promoted the img scan carry and crashed lax.scan's
    carry-type check)."""
    cfg, _params, batch = tiny_setup
    params = init_flux_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    b, s_img = batch["img"].shape[:2]
    s_txt = batch["txt"].shape[1]
    mixed = dict(
        batch,
        img=batch["img"].astype(jnp.bfloat16),
        cond=batch["cond"].astype(jnp.bfloat16),
    )
    out = flux_forward(
        params, cfg, **mixed, attn_backend="xla",
        controlnet_block_samples=jnp.ones(
            (2, b, s_img, cfg.hidden), jnp.float32
        ),
        controlnet_single_block_samples=jnp.ones(
            (1, b, s_img, cfg.hidden), jnp.float32
        ),
    )
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
