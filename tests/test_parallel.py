"""Mesh/sharding tests on the 8-device virtual CPU mesh (SURVEY §2d: the
TPU-native replacement for the reference's NCCL DDP + sharded inference)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from loongx_tpu.models.pipeline import LoongXPipeline
from loongx_tpu.ops.latents import latent_image_ids
from loongx_tpu.parallel import make_mesh, param_sharding_rules, shard_params, shard_batch
from loongx_tpu.train.lora import add_lora
from loongx_tpu.train.step import partition, trainable_mask, make_train_step


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _tiny_batch(cfg, b=8):
    return {
        "x0": jax.random.normal(jax.random.key(2), (b, 16, cfg.in_channels)),
        "img_ids": latent_image_ids(8, 8),
        "txt_ids": jnp.zeros((4, 3)),
        "prompt_embeds": jax.random.normal(
            jax.random.key(3), (b, 4, cfg.joint_dim)
        ),
        "pooled": jax.random.normal(jax.random.key(4), (b, cfg.pooled_dim)),
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=-1, tensor=2)
        assert mesh.shape == {"data": 4, "tensor": 2}
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "tensor": 1}

    def test_tp_rules_shard_qkv(self):
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        mesh = make_mesh(data=4, tensor=2)
        rules = param_sharding_rules(pipe.params["flux"], mesh)
        qkv = rules["double_blocks"]["attn"]["to_q"]["kernel"]
        assert qkv.spec == P(None, None, "tensor")
        out = rules["double_blocks"]["attn"]["to_out"]["kernel"]
        assert out.spec == P(None, "tensor", None)
        # non-TP leaves replicated
        assert rules["x_embedder"]["kernel"].spec == P()


class TestDataParallelTrainStep:
    def test_dp_step_matches_single_device(self):
        """The pjit'd step over a data mesh must give the same loss as an
        unsharded run (DDP equivalence)."""
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        pipe.params["flux"] = add_lora(
            jax.random.key(1), pipe.params["flux"], r=2, dtype=jnp.float32
        )
        mask = trainable_mask(pipe.params)
        trainable, frozen = partition(pipe.params, mask)
        batch = _tiny_batch(cfg)
        init_fn, step_fn = make_train_step(
            cfg, optax.sgd(0.1), flags={"latent_lora": True},
            attn_backend="xla", dtype=jnp.float32,
        )
        state = init_fn(trainable)

        # single-device
        _, m_single = jax.jit(step_fn)(state, frozen, batch, jax.random.key(9))

        # data-parallel over 8 devices
        mesh = make_mesh(data=8, tensor=1)
        frozen_sh = shard_params(frozen, mesh)
        state_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        batch_sh = shard_batch(batch, mesh)
        # ids are per-token (no batch dim) — re-replicate them
        for k in ("img_ids", "txt_ids"):
            batch_sh[k] = jax.device_put(batch[k], NamedSharding(mesh, P()))
        _, m_dp = jax.jit(step_fn)(state_sh, frozen_sh, batch_sh, jax.random.key(9))
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-4
        )

    def test_tensor_parallel_forward_matches(self):
        """2-way TP sharding of the DiT matmuls must not change numerics."""
        from loongx_tpu.models.flux.model import flux_forward

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        batch = dict(
            img=jnp.ones((2, 16, cfg.in_channels)),
            txt=jnp.ones((2, 4, cfg.joint_dim)),
            pooled=jnp.ones((2, cfg.pooled_dim)),
            timestep=jnp.array([0.5, 0.3]),
            guidance=jnp.array([3.5, 3.5]),
            img_ids=latent_image_ids(8, 8),
            txt_ids=jnp.zeros((4, 3)),
        )
        ref = flux_forward(pipe.params["flux"], cfg, **batch, attn_backend="xla")

        mesh = make_mesh(data=2, tensor=4)
        params_sh = shard_params(pipe.params["flux"], mesh)
        out = jax.jit(
            lambda p, b: flux_forward(p, cfg, **b, attn_backend="xla")
        )(params_sh, batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


class TestShardedInference:
    def test_batch_sharded_generate(self):
        """Data-sharded batch inference — the reference's multi-GPU
        image-chunking loop (inference.py:177-261) as one pjit'd call."""
        from loongx_tpu.sampling.generate import denoise_scan
        from loongx_tpu.ops.schedule import flux_sigmas

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        mesh = make_mesh(data=8, tensor=1)
        b = 8
        latents = jax.random.normal(
            jax.random.key(1), (b, 16, cfg.in_channels), jnp.float32
        )
        txt = jax.random.normal(jax.random.key(2), (b, 4, cfg.joint_dim))
        pooled = jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim))
        sigmas = jnp.asarray(flux_sigmas(2, 16))
        guidance = jnp.full((b,), 3.5)

        params_sh = shard_params(pipe.params["flux"], mesh)
        shard = NamedSharding(mesh, P("data"))
        out = denoise_scan(
            params_sh, cfg, (),
            jax.device_put(latents, shard), jax.device_put(txt, shard),
            jax.device_put(pooled, shard),
            latent_image_ids(8, 8), jnp.zeros((4, 3)),
            None, None, sigmas, jax.device_put(guidance, shard), None,
            attn_backend="xla",
        )
        assert out.shape == latents.shape
        # per-sample independence: row 0 equals a single-sample run
        out0 = denoise_scan(
            pipe.params["flux"], cfg, (), latents[:1], txt[:1], pooled[:1],
            latent_image_ids(8, 8), jnp.zeros((4, 3)), None, None, sigmas,
            guidance[:1], None, attn_backend="xla",
        )
        np.testing.assert_allclose(
            np.asarray(out[:1]), np.asarray(out0), atol=1e-4, rtol=1e-4
        )


class TestKernelGradeDP:
    """Round-4: under a data-axis mesh_context, multi-device training and
    batch-sharded serving keep the Pallas kernels (flash attention fwd+bwd,
    stacked int8 custom_vjp matmuls) per-shard via shard_map — the XLA
    fallback is no longer the only multi-device path (VERDICT r3 Missing #3;
    reference scope: train.py:181-182, DDP trains with full-speed kernels
    per rank)."""

    def test_dp_train_step_pallas_stacked_matches_single_device(
        self, monkeypatch
    ):
        from loongx_tpu.ops.quant import quantize_tree
        from loongx_tpu.parallel.mesh import mesh_context

        monkeypatch.setenv("LOONGX_STACKED_QMM", "1")  # interpret kernels
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        pipe.params["flux"] = add_lora(
            jax.random.key(1), quantize_tree(pipe.params["flux"]),
            r=2, dtype=jnp.float32,
        )
        mask = trainable_mask(pipe.params)
        trainable, frozen = partition(pipe.params, mask)
        batch = _tiny_batch(cfg)
        batch["cond_tokens"] = jax.random.normal(
            jax.random.key(5), (8, 16, cfg.in_channels)
        )
        batch["cond_ids"] = latent_image_ids(8, 8)
        init_fn, step_fn = make_train_step(
            cfg, optax.sgd(0.05), flags={"latent_lora": True},
            attn_backend="pallas", dtype=jnp.float32,
        )
        state = init_fn(trainable)

        # single device (QLoRA reference: stacked kernels + pallas attn)
        s1, m1 = jax.jit(step_fn)(state, frozen, batch, jax.random.key(9))

        mesh = make_mesh(data=8, tensor=1)
        frozen_sh = shard_params(frozen, mesh)
        state_sh = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), state
        )
        batch_sh = shard_batch(batch, mesh)
        for k in ("img_ids", "txt_ids", "cond_ids"):
            batch_sh[k] = jax.device_put(batch[k], NamedSharding(mesh, P()))
        with mesh_context(mesh):
            s2, m2 = jax.jit(step_fn)(
                state_sh, frozen_sh, batch_sh, jax.random.key(9)
            )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m2["grad_norm"]),
            rtol=1e-5, atol=1e-6,
        )
        for a, b in zip(
            jax.tree.leaves(s1.trainable), jax.tree.leaves(s2.trainable)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_dp_denoise_scan_pallas_stacked_matches(self, monkeypatch):
        """Batch-sharded serving (the CLI batch_edit path) with quantized
        stacked kernels + pallas flash attention under mesh_context matches
        the unsharded run."""
        from loongx_tpu.ops.quant import quantize_tree
        from loongx_tpu.ops.schedule import flux_sigmas
        from loongx_tpu.parallel.mesh import mesh_context
        from loongx_tpu.sampling.generate import denoise_scan

        monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        params_q = quantize_tree(pipe.params["flux"])
        b = 8
        latents = jax.random.normal(
            jax.random.key(1), (b, 16, cfg.in_channels), jnp.float32
        )
        txt = jax.random.normal(jax.random.key(2), (b, 4, cfg.joint_dim))
        pooled = jax.random.normal(jax.random.key(3), (b, cfg.pooled_dim))
        sigmas = jnp.asarray(flux_sigmas(2, 16))
        guidance = jnp.full((b,), 3.5)

        ref = denoise_scan(
            params_q, cfg, (), latents, txt, pooled,
            latent_image_ids(8, 8), jnp.zeros((4, 3)), None, None,
            sigmas, guidance, None, attn_backend="pallas",
        )

        mesh = make_mesh(data=8, tensor=1)
        shard = NamedSharding(mesh, P("data"))
        with mesh_context(mesh):
            out = denoise_scan(
                shard_params(params_q, mesh), cfg, (),
                jax.device_put(latents, shard), jax.device_put(txt, shard),
                jax.device_put(pooled, shard),
                latent_image_ids(8, 8), jnp.zeros((4, 3)), None, None,
                sigmas, jax.device_put(guidance, shard), None,
                attn_backend="pallas",
            )
        # per-shard M (16 vs 128) changes the quant kernels' tile sizes —
        # a different (equally valid) accumulation order, amplified across
        # the 2 denoise steps; identical math otherwise
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3
        )


class TestQuantizedTP:
    def test_tensor_parallel_quantized_forward_matches(self):
        """2-way TP sharding of an int8-quantized DiT (kernel_q/kernel_scale
        leaves shard with their kernels; the XLA dequant path partitions
        cleanly) must match the unsharded quantized forward."""
        from loongx_tpu.models.flux.model import flux_forward
        from loongx_tpu.ops.quant import quantize_tree

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        params_q = quantize_tree(pipe.params["flux"])
        batch = dict(
            img=jnp.ones((2, 16, cfg.in_channels)),
            txt=jnp.ones((2, 4, cfg.joint_dim)),
            pooled=jnp.ones((2, cfg.pooled_dim)),
            timestep=jnp.array([0.5, 0.3]),
            guidance=jnp.array([3.5, 3.5]),
            img_ids=latent_image_ids(8, 8),
            txt_ids=jnp.zeros((4, 3)),
        )
        ref = flux_forward(params_q, cfg, **batch, attn_backend="xla")

        mesh = make_mesh(data=2, tensor=4)
        rules = param_sharding_rules(params_q, mesh)
        specs = {
            str(k): v.spec
            for k, v in jax.tree_util.tree_flatten_with_path(rules)[0]
        }
        # quantized leaves actually picked up TP shardings
        assert any("kernel_q" in k and "tensor" in str(s)
                   for k, s in specs.items()), specs
        assert any("kernel_scale" in k and "tensor" in str(s)
                   for k, s in specs.items())

        params_sh = shard_params(params_q, mesh)
        out = jax.jit(
            lambda p, b: flux_forward(p, cfg, **b, attn_backend="xla")
        )(params_sh, batch)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


    def test_tp_stacked_quant_kernels_forward_match(self, monkeypatch):
        """Round-3: under an active tp_context the stacked Pallas quant
        kernels (incl. the TP-layout fused qkv and the fused LN/gate
        elementwise) run PER SHARD via shard_map (parallel/tp_quant.py)
        instead of falling back to the XLA dequant dot — and must match the
        unsharded quantized forward."""
        from loongx_tpu.models.flux.model import flux_forward
        from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree
        from loongx_tpu.parallel.mesh import tp_context

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        params_q = quantize_tree(pipe.params["flux"])
        batch = dict(
            img=jax.random.normal(jax.random.key(1), (1, 16, cfg.in_channels)),
            txt=jax.random.normal(jax.random.key(2), (1, 4, cfg.joint_dim)),
            pooled=jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim)),
            timestep=jnp.array([0.5]),
            guidance=jnp.array([3.5]),
            img_ids=latent_image_ids(8, 8),
            txt_ids=jnp.zeros((4, 3)),
            cond=jax.random.normal(jax.random.key(4), (1, 16, cfg.in_channels)),
            cond_ids=latent_image_ids(8, 8),
        )
        monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
        ref = flux_forward(params_q, cfg, **batch, attn_backend="xla")

        fused = dict(params_q)
        fused["double_blocks"] = fuse_qkv_projections(
            params_q["double_blocks"], tp_layout=True
        )
        fused["single_blocks"] = fuse_qkv_projections(
            params_q["single_blocks"], tp_layout=True
        )
        assert fused["double_blocks"]["attn"]["to_qkv"]["kernel_q"].ndim == 4

        mesh = make_mesh(data=4, tensor=2)
        rules = param_sharding_rules(fused, mesh)
        assert rules["double_blocks"]["attn"]["to_qkv"]["kernel_q"].spec == P(
            None, None, None, "tensor"
        )
        params_sh = shard_params(fused, mesh)
        monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
        with tp_context(mesh):
            out = jax.jit(
                lambda p, b: flux_forward(p, cfg, **b, attn_backend="xla")
            )(params_sh, batch)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )

    def test_2d_mesh_fused_elementwise_keeps_global_segments(
        self, monkeypatch
    ):
        """Regression: under a 2D (data x tensor) mesh_context at b=1 with a
        condition stream, the fused LN+adaLN prologue and gate+residual
        epilogue segment rows against the GLOBAL img|cond boundary — the TP
        wrappers must NOT shard the row axis over the data axis for those
        calls (a row shard restarts local indices at 0, so every shard past
        the first would apply the wrong segment's affine/gate).  Mirrors the
        deployed 2D fused serving mode (/root/reference/inference.py:177-261
        behavioral scope)."""
        from loongx_tpu.models.flux.model import flux_forward
        from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree
        from loongx_tpu.parallel.mesh import mesh_context

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        cfg = pipe.flux_cfg
        params_q = quantize_tree(pipe.params["flux"])
        # b=1 WITH cond: fused [img | cond] stream rows = 32, divisible by
        # data=4 — exactly the geometry where a row shard would misapply
        # the segment affine pre-fix
        batch = dict(
            img=jax.random.normal(jax.random.key(1), (1, 16, cfg.in_channels)),
            txt=jax.random.normal(jax.random.key(2), (1, 4, cfg.joint_dim)),
            pooled=jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim)),
            timestep=jnp.array([0.5]),
            guidance=jnp.array([3.5]),
            img_ids=latent_image_ids(8, 8),
            txt_ids=jnp.zeros((4, 3)),
            cond=jax.random.normal(jax.random.key(4), (1, 16, cfg.in_channels)),
            cond_ids=latent_image_ids(8, 8),
        )
        monkeypatch.setenv("LOONGX_STACKED_QMM", "0")
        ref = flux_forward(params_q, cfg, **batch, attn_backend="xla")

        fused = dict(params_q)
        fused["double_blocks"] = fuse_qkv_projections(
            params_q["double_blocks"], tp_layout=True
        )
        fused["single_blocks"] = fuse_qkv_projections(
            params_q["single_blocks"], tp_layout=True
        )
        mesh = make_mesh(data=4, tensor=2)
        params_sh = shard_params(fused, mesh)
        monkeypatch.setenv("LOONGX_STACKED_QMM", "1")
        monkeypatch.setenv("LOONGX_FUSE_LN", "1")
        monkeypatch.setenv("LOONGX_FUSE_GATE", "1")
        with mesh_context(mesh):
            out = jax.jit(
                lambda p, b: flux_forward(p, cfg, **b, attn_backend="xla")
            )(params_sh, batch)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )
