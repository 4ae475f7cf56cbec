"""Tests: datasets (synthetic fixtures), loaders, checkpoint conversion,
orbax round trips."""

import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.data import (
    SeedDataset, SubjectPairDataset, ImageConditionDataset, CartoonDataset,
    iterate_batches, prefetch_to_device,
)


@pytest.fixture()
def seed_corpus(tmp_path):
    """Synthetic L-Mind-style corpus: images + jsonl + data_final.pkl."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    bio = {}
    rng = np.random.RandomState(0)
    for i in range(4):
        for tag in (0, 1):
            name = f"sample{i}_{tag}.png"
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), np.uint8)
            ).save(img_dir / name)
        rows.append(
            {
                "source_image": f"imgs/sample{i}_0.png",
                "target_image": f"imgs/sample{i}_1.png",
                "instruction": f"edit {i}",
                "speech2text": f"spoken edit {i}",
            }
        )
        bio[f"sample{i}_0.png"] = {
            "EEG": rng.randn(4, 1000).astype(np.float32),
            "FNIRS": rng.randn(6, 300).astype(np.float32),
            "PPG": rng.randn(4, 200).astype(np.float32),
            "Motion": rng.randn(6, 100).astype(np.float32),
        }
    jsonl = tmp_path / "train.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(tmp_path / "data_final.pkl", "wb") as f:
        pickle.dump(bio, f)
    return str(jsonl), str(tmp_path)


class TestSeedDataset:
    def test_fields_and_shapes(self, seed_corpus):
        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=32)
        assert len(ds) == 4
        s = ds[0]
        assert s["image"].shape == (32, 32, 3)
        assert s["condition"].shape == (32, 32, 3)
        assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
        assert s["description"] == "spoken edit 0"  # speech preferred
        assert s["eeg"].shape == (4, 1000)
        assert s["motion"].shape == (6, 100)
        np.testing.assert_array_equal(s["position_delta"], [0, -32])

    def test_skips_rows_without_biosignals(self, seed_corpus, tmp_path):
        jsonl, root = seed_corpus
        with open(jsonl, "a") as f:
            f.write(json.dumps({
                "source_image": "imgs/missing.png",
                "target_image": "imgs/missing.png",
                "instruction": "x",
            }) + "\n")
        ds = SeedDataset(jsonl, image_dir=root)
        assert len(ds) == 4  # unmatched row dropped


class _FakePairBase:
    def __init__(self, n=4):
        from PIL import Image

        self.items = []
        rng = np.random.RandomState(1)
        for i in range(n):
            img = Image.fromarray(
                rng.randint(0, 255, (16, 32, 3), np.uint8)
            )
            self.items.append(
                {"image": img,
                 "description": {"description_0": f"left {i}",
                                 "description_1": f"right {i}"}}
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestSubjectPair:
    def test_alternating_sides(self):
        ds = SubjectPairDataset(
            _FakePairBase(), condition_size=16, target_size=16, image_size=16,
            drop_text_prob=0.0, drop_image_prob=0.0,
        )
        assert len(ds) == 8
        s0, s1 = ds[0], ds[1]
        assert s0["description"] == "left 0"
        assert s1["description"] == "right 0"
        assert s0["image"].shape == (16, 16, 3)

    def test_cfg_dropout_deterministic(self):
        ds = SubjectPairDataset(
            _FakePairBase(), condition_size=16, target_size=16, image_size=16,
            drop_text_prob=1.0, drop_image_prob=1.0,
        )
        s = ds[0]
        assert s["description"] == ""
        np.testing.assert_array_equal(s["condition"], 0.0)
        # per-index rng: same sample twice -> identical
        s2 = ds[0]
        np.testing.assert_array_equal(s["image"], s2["image"])


class _FakeImgBase:
    def __init__(self, n=3):
        from PIL import Image

        rng = np.random.RandomState(2)
        self.items = [
            {"jpg": Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)),
             "json": {"prompt": f"prompt {i}"}}
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestImageCondition:
    @pytest.mark.parametrize("ct", ["canny", "coloring", "deblurring", "fill", "sr"])
    def test_synthesis_types(self, ct):
        ds = ImageConditionDataset(
            _FakeImgBase(), condition_size=24, target_size=24,
            condition_type=ct, drop_text_prob=0.0, drop_image_prob=0.0,
        )
        s = ds[0]
        assert s["image"].shape == (24, 24, 3)
        assert s["condition"].shape == (24, 24, 3)
        assert s["condition_type"] == ct
        if ct == "sr":
            # python floor division: -24 // 16 == -2 (reference semantics)
            np.testing.assert_array_equal(s["position_delta"], [0, -2])

    def test_unknown_type(self):
        ds = ImageConditionDataset(_FakeImgBase(), condition_type="warp")
        with pytest.raises(ValueError):
            ds[0]


class TestLoader:
    def test_iterate_and_collate(self, seed_corpus):
        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=32)
        batches = list(
            iterate_batches(ds, batch_size=2, shuffle=True, seed=0, epochs=1)
        )
        assert len(batches) == 2
        b = batches[0]
        assert b["image"].shape == (2, 32, 32, 3)
        assert b["eeg"].shape == (2, 4, 1000)
        assert isinstance(b["description"], list) and len(b["description"]) == 2

    def test_prefetch_to_device(self, seed_corpus):
        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=32)
        it = prefetch_to_device(
            iterate_batches(ds, batch_size=2, epochs=1), size=2
        )
        batches = list(it)
        assert len(batches) == 2
        assert isinstance(batches[0]["image"], jax.Array)


class TestConvert:
    def test_flux_roundtrip_via_fake_torch_state(self):
        """Build a synthetic diffusers-style state dict for the tiny config,
        convert, and check the forward runs and uses the converted values."""
        from loongx_tpu.models.flux import FluxConfig, init_flux_params, flux_forward
        from loongx_tpu.utils.convert import convert_flux_state
        from loongx_tpu.ops.latents import latent_image_ids

        cfg = FluxConfig.tiny()
        ref = init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32)

        # emit a state dict in HF layout from our own params (transposed)
        state = {}

        def lin(prefix, p):
            state[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
            if "bias" in p:
                state[f"{prefix}.bias"] = np.asarray(p["bias"])

        lin("x_embedder", ref["x_embedder"])
        lin("context_embedder", ref["context_embedder"])
        lin("time_text_embed.timestep_embedder.linear_1", ref["time_in"]["in_layer"])
        lin("time_text_embed.timestep_embedder.linear_2", ref["time_in"]["out_layer"])
        lin("time_text_embed.text_embedder.linear_1", ref["vector_in"]["in_layer"])
        lin("time_text_embed.text_embedder.linear_2", ref["vector_in"]["out_layer"])
        lin("time_text_embed.guidance_embedder.linear_1", ref["guidance_in"]["in_layer"])
        lin("time_text_embed.guidance_embedder.linear_2", ref["guidance_in"]["out_layer"])
        lin("norm_out.linear", ref["norm_out"]["linear"])
        lin("proj_out", ref["proj_out"])
        for i in range(cfg.num_double_blocks):
            blk = jax.tree.map(lambda x: x[i], ref["double_blocks"])
            p = f"transformer_blocks.{i}"
            lin(f"{p}.norm1.linear", blk["norm1"]["linear"])
            lin(f"{p}.norm1_context.linear", blk["norm1_context"]["linear"])
            for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                       "add_v_proj", "to_add_out"):
                lin(f"{p}.attn.{nm}", blk["attn"][nm])
            lin(f"{p}.attn.to_out.0", blk["attn"]["to_out"])
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                state[f"{p}.attn.{nm}.weight"] = np.asarray(blk["attn"][nm]["weight"])
            lin(f"{p}.ff.net.0.proj", blk["ff"]["in"])
            lin(f"{p}.ff.net.2", blk["ff"]["out"])
            lin(f"{p}.ff_context.net.0.proj", blk["ff_context"]["in"])
            lin(f"{p}.ff_context.net.2", blk["ff_context"]["out"])
        for i in range(cfg.num_single_blocks):
            blk = jax.tree.map(lambda x: x[i], ref["single_blocks"])
            p = f"single_transformer_blocks.{i}"
            lin(f"{p}.norm.linear", blk["norm"]["linear"])
            for nm in ("to_q", "to_k", "to_v"):
                lin(f"{p}.attn.{nm}", blk["attn"][nm])
            for nm in ("norm_q", "norm_k"):
                state[f"{p}.attn.{nm}.weight"] = np.asarray(blk["attn"][nm]["weight"])
            lin(f"{p}.proj_mlp", blk["proj_mlp"])
            lin(f"{p}.proj_out", blk["proj_out"])

        converted = convert_flux_state(state, cfg, dtype=jnp.float32)
        batch = dict(
            img=jnp.ones((1, 4, cfg.in_channels)),
            txt=jnp.ones((1, 2, cfg.joint_dim)),
            pooled=jnp.ones((1, cfg.pooled_dim)),
            timestep=jnp.array([0.5]),
            guidance=jnp.array([3.5]),
            img_ids=latent_image_ids(4, 4),
            txt_ids=jnp.zeros((2, 3)),
        )
        out_ref = flux_forward(ref, cfg, **batch, attn_backend="xla")
        out_conv = flux_forward(converted, cfg, **batch, attn_backend="xla")
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_conv), atol=1e-5
        )


class TestCheckpoint:
    def test_lora_safetensors_roundtrip(self, tmp_path):
        from loongx_tpu.models.flux import FluxConfig, init_flux_params
        from loongx_tpu.train.lora import add_lora, lora_state_dict
        from loongx_tpu.utils.checkpoint import (
            save_lora_safetensors, load_lora_safetensors,
        )

        cfg = FluxConfig.tiny()
        params = add_lora(
            jax.random.key(1),
            init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32),
            r=2, dtype=jnp.float32,
        )
        out = save_lora_safetensors(params, str(tmp_path))
        assert os.path.exists(out)
        params2 = add_lora(
            jax.random.key(9),
            init_flux_params(jax.random.key(0), cfg, dtype=jnp.float32),
            r=2, dtype=jnp.float32,
        )
        params2 = load_lora_safetensors(params2, str(tmp_path))
        sd1, sd2 = lora_state_dict(params), lora_state_dict(params2)
        for k in sd1:
            np.testing.assert_allclose(
                np.asarray(sd1[k], np.float32), np.asarray(sd2[k], np.float32),
                atol=1e-6,
            )

    def test_orbax_train_state_roundtrip(self, tmp_path):
        import optax

        from loongx_tpu.utils.checkpoint import (
            save_train_checkpoint, load_train_checkpoint, latest_checkpoint,
        )

        trainable = {"w": jnp.arange(4, dtype=jnp.float32)}
        opt = optax.adam(1e-3)
        opt_state = opt.init(trainable)
        path = save_train_checkpoint(str(tmp_path), 7, trainable, opt_state)
        assert latest_checkpoint(str(tmp_path)) == path
        t2, o2, step = load_train_checkpoint(
            path, {"trainable": trainable, "opt_state": opt_state}
        )
        assert step == 7
        np.testing.assert_array_equal(np.asarray(t2["w"]), np.asarray(trainable["w"]))

    def test_pipeline_roundtrip(self, tmp_path):
        from loongx_tpu.models.pipeline import LoongXPipeline
        from loongx_tpu.utils.checkpoint import save_pipeline, load_pipeline

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        save_pipeline(pipe, str(tmp_path / "pipe"))
        pipe2 = load_pipeline(str(tmp_path / "pipe"), dtype=jnp.float32)
        assert pipe2.flux_cfg == pipe.flux_cfg
        a = jax.tree.leaves(pipe.params)
        b = jax.tree.leaves(pipe2.params)
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_pipeline_staged_component_load(self, tmp_path):
        """Per-component orbax layout (round 3): the 12B serving recipe
        loads ("t5","clip","vae") for prompt encode, then ("flux",) — the
        component trees restore independently and match the originals."""
        from loongx_tpu.models.pipeline import LoongXPipeline
        from loongx_tpu.utils.checkpoint import save_pipeline, load_pipeline

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        save_pipeline(pipe, str(tmp_path / "pipe"))
        text_stage = load_pipeline(
            str(tmp_path / "pipe"), components=("t5", "clip", "vae")
        )
        assert set(text_stage.params) == {"t5", "clip", "vae"}
        dit_stage = load_pipeline(str(tmp_path / "pipe"), components=("flux",))
        assert set(dit_stage.params) == {"flux"}
        for orig, got in zip(
            jax.tree.leaves(pipe.params["flux"]),
            jax.tree.leaves(dit_stage.params["flux"]),
        ):
            np.testing.assert_array_equal(np.asarray(orig), np.asarray(got))


class TestReferenceConfigParity:
    def test_reference_yaml_schema_loads(self, tmp_path):
        """Our config spine must accept the reference's own YAML schema
        (canny_512-style, incl. webdataset urls + lora target_modules)."""
        import textwrap

        from loongx_tpu.config import load_config

        yaml_text = textwrap.dedent("""
            flux_path: "black-forest-labs/FLUX.1-dev"
            dtype: "bfloat16"
            model:
              union_cond_attn: true
              add_cond_attn: false
              latent_lora: false
            train:
              batch_size: 1
              accumulate_grad_batches: 1
              dataloader_workers: 5
              save_interval: 1000
              sample_interval: 100
              max_steps: -1
              gradient_checkpointing: true
              save_path: "runs"
              condition_type: "canny"
              dataset:
                type: "img"
                urls:
                  - "https://example.com/data_000046.tar"
                condition_size: 512
                target_size: 512
                drop_text_prob: 0.1
                drop_image_prob: 0.1
              wandb:
                project: "OminiControl"
              lora_config:
                r: 4
                lora_alpha: 4
                init_lora_weights: "gaussian"
                target_modules: "(.*x_embedder|.*attn.to_k)"
              optimizer:
                type: "Prodigy"
                params:
                  lr: 1
                  use_bias_correction: true
                  safeguard_warmup: true
                  weight_decay: 0.01
        """)
        p = tmp_path / "ref_style.yaml"
        p.write_text(yaml_text)
        c = load_config(str(p))
        assert c.train.dataset.urls[0].endswith(".tar")
        assert c.train.optimizer.params["lr"] == 1


class TestMultiHostLoader:
    def test_hosts_partition_dataset(self, seed_corpus):
        from loongx_tpu.data import SeedDataset, iterate_batches

        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=32)
        seen = []
        for host in range(2):
            for b in iterate_batches(
                ds, batch_size=1, seed=3, epochs=1, host_id=host, num_hosts=2,
            ):
                seen.append(b["description"][0])
        # two hosts together cover all 4 samples exactly once
        assert sorted(seen) == sorted(
            ds[i]["description"] for i in range(4)
        )


class TestLoaderGuards:
    def test_tiny_dataset_raises_instead_of_hanging(self, seed_corpus):
        from loongx_tpu.data import SeedDataset
        from loongx_tpu.data.loader import iterate_batches

        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=16)
        with pytest.raises(ValueError, match="drop_last"):
            next(iterate_batches(ds, batch_size=len(ds) + 1, num_workers=1))

    def test_skip_batches_continues_order(self, seed_corpus):
        from loongx_tpu.data import SeedDataset
        from loongx_tpu.data.loader import iterate_batches

        jsonl, root = seed_corpus
        ds = SeedDataset(jsonl, image_dir=root, image_size=16)
        full = [
            b["description"]
            for b in iterate_batches(
                ds, batch_size=1, num_workers=1, epochs=2, seed=5
            )
        ]
        resumed = [
            b["description"]
            for b in iterate_batches(
                ds, batch_size=1, num_workers=1, epochs=2, seed=5,
                skip_batches=3,
            )
        ]
        assert resumed == full[3:]

    def test_background_iter_early_close_stops_producer(self):
        import threading
        import time as _time

        from loongx_tpu.data.loader import background_iter

        produced = []

        def gen():
            for i in range(10_000):
                produced.append(i)
                yield i

        it = background_iter(gen(), depth=1)
        for i, _ in enumerate(it):
            if i >= 2:
                break
        it.close()  # consumer stops early (train loop break)
        n_after_close = len(produced)
        deadline = _time.time() + 2.0
        # the producer must stop within the 0.1s put timeout, not run to
        # 10000 or block forever holding a prepared batch
        while _time.time() < deadline:
            _time.sleep(0.2)
            if len(produced) == n_after_close:
                break
            n_after_close = len(produced)
        assert len(produced) < 100
        assert threading.active_count() < 50
