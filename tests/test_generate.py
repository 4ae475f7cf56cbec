"""End-to-end generation tests on the tiny pipeline (SURVEY §7 stage 4:
the minimum end-to-end slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loongx_tpu.models.pipeline import LoongXPipeline
from loongx_tpu.sampling import Condition, generate
from loongx_tpu.sampling.condition import CONDITION_TYPE_IDS


@pytest.fixture(scope="module")
def pipe():
    return LoongXPipeline.tiny(jax.random.key(0))


def _embeds(pipe, b=1, s=8):
    k1, k2 = jax.random.split(jax.random.key(7))
    return (
        jax.random.normal(k1, (b, s, pipe.t5_cfg.d_model), jnp.float32),
        jax.random.normal(k2, (b, pipe.clip_cfg.hidden), jnp.float32),
    )


class TestGenerate:
    def test_text_only(self, pipe):
        pe, pool = _embeds(pipe)
        img = generate(
            pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
            height=16, width=16, num_inference_steps=2, attn_backend="xla",
        )
        assert img.shape == (1, 16, 16, 3)
        assert np.all(np.isfinite(img))

    def test_seed_determinism(self, pipe):
        pe, pool = _embeds(pipe)
        kw = dict(prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
                  width=16, num_inference_steps=2, attn_backend="xla")
        a = generate(pipe, seed=42, **kw)
        b = generate(pipe, seed=42, **kw)
        c = generate(pipe, seed=43, **kw)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_decode_chunk_matches_batched_decode(self, pipe):
        """decode_chunk only changes VAE-call granularity, not pixels:
        chunked decode (single-chip int8-12B serving recipe) must equal
        the batched decode bit-for-bit."""
        pe, pool = _embeds(pipe, b=3)
        kw = dict(prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
                  width=16, num_inference_steps=2, attn_backend="xla",
                  seed=5)
        full = generate(pipe, **kw)
        for chunk in (1, 2, 3, 99):
            chunked = generate(pipe, decode_chunk=chunk, **kw)
            np.testing.assert_array_equal(full, chunked)

    def test_latent_output_and_manual_decode(self, pipe):
        pe, pool = _embeds(pipe)
        lat = generate(
            pipe, prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
            width=16, num_inference_steps=2, attn_backend="xla",
            output_type="latent",
        )
        # 16px -> lat 8x8 -> packed 4*4 tokens
        assert lat.shape == (1, 16, pipe.flux_cfg.in_channels)

    def test_with_image_condition(self, pipe):
        pe, pool = _embeds(pipe)
        cond_img = np.random.RandomState(0).randint(
            0, 255, (16, 16, 3), np.uint8
        )
        cond = Condition("subject", condition=cond_img)
        img = generate(
            pipe, conditions=[cond], prompt_embeds=pe,
            pooled_prompt_embeds=pool, height=16, width=16,
            num_inference_steps=2, attn_backend="xla",
        )
        assert img.shape == (1, 16, 16, 3)
        assert np.all(np.isfinite(img))

    def test_condition_scale_changes_output(self, pipe):
        pe, pool = _embeds(pipe)
        cond_img = np.random.RandomState(0).randint(
            0, 255, (16, 16, 3), np.uint8
        )
        kw = dict(
            conditions=[Condition("subject", condition=cond_img)],
            prompt_embeds=pe, pooled_prompt_embeds=pool, height=16, width=16,
            num_inference_steps=2, attn_backend="xla", seed=0,
        )
        a = generate(pipe, **kw)
        b = generate(pipe, condition_scale=0.25, **kw)
        assert not np.allclose(a, b)

    def test_uint8_output(self, pipe):
        pe, pool = _embeds(pipe)
        img = generate(
            pipe, prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
            width=16, num_inference_steps=1, attn_backend="xla",
            output_type="uint8",
        )
        assert img.dtype == np.uint8


class TestCondition:
    def test_type_ids_match_reference(self):
        """Registry must match reference condition_dict (condition.py:10-21)."""
        assert CONDITION_TYPE_IDS["depth"] == 0
        assert CONDITION_TYPE_IDS["canny"] == 1
        assert CONDITION_TYPE_IDS["subject"] == 4
        assert CONDITION_TYPE_IDS["sr"] == 10
        assert CONDITION_TYPE_IDS["eeg+fnirs"] == 12
        assert Condition.get_type_id("fill") == 9

    def test_unknown_type_rejected(self):
        with pytest.raises(ValueError):
            Condition("wavelet", condition=np.zeros((8, 8, 3), np.uint8))

    def test_synthesis_coloring(self):
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        raw = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
        )
        c = Condition("coloring", raw_img=raw)
        arr = np.asarray(c.condition)
        # grayscale: all three channels equal
        assert (arr[..., 0] == arr[..., 1]).all()

    def test_synthesis_canny(self):
        pytest.importorskip("cv2")
        from PIL import Image

        raw = Image.fromarray(
            (np.indices((32, 32)).sum(0) % 16 * 16).astype(np.uint8)
        ).convert("RGB")
        c = Condition("canny", raw_img=raw)
        assert np.asarray(c.condition).shape == (32, 32, 3)

    def test_encode_produces_shifted_ids(self, pipe):
        cond_img = np.zeros((16, 16, 3), np.uint8)
        c = Condition("canny", condition=cond_img, position_delta=(0, 4))
        tokens, ids, type_ids = c.encode(pipe)
        assert tokens.shape[0] == 1 and tokens.shape[2] == pipe.flux_cfg.in_channels
        np.testing.assert_array_equal(np.asarray(ids[:, 2] >= 4), True)
        assert float(type_ids[0, 0]) == 1.0


class TestPartialBrainReplacement:
    """Replacement-mode (fuse_flag=False) semantics with partial signal sets
    (code-review r2 finding: missing slots must not silently zero)."""

    def _pipe(self):
        return LoongXPipeline.tiny(jax.random.key(0))

    def test_partial_brain_keeps_text_pooled(self, monkeypatch):
        import importlib

        from loongx_tpu.sampling import generate as gen_fn
        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")

        pipe = self._pipe()
        bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32) * 0.3
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, None)
        )
        pipe.params["encoders"] = {}  # satisfy the guard
        kw = dict(
            height=16, width=16, num_inference_steps=1, guidance_scale=3.5,
            seed=0, attn_backend="xla", output_type="latent",
            pooled_prompt_embeds=jnp.full(
                (1, pipe.flux_cfg.pooled_dim), 0.7, jnp.float32
            ),
            eeg=np.zeros((1, 4, 16), np.float32),
        )
        out_brain = gen_fn(
            pipe, prompt_embeds=jnp.zeros((1, 8, pipe.flux_cfg.joint_dim)),
            use_brain_condition=True, fuse_flag=False, **kw,
        )
        out_plain = gen_fn(
            pipe, prompt_embeds=jnp.zeros((1, 8, pipe.flux_cfg.joint_dim)),
            use_brain_condition=False, **kw,
        )
        # brain prompt replaced (outputs differ), pooled kept textual (run ok)
        assert not np.allclose(np.asarray(out_brain), np.asarray(out_plain))

    def test_neural_only_with_missing_slot_raises(self, monkeypatch):
        import importlib

        from loongx_tpu.sampling import generate as gen_fn
        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")

        pipe = self._pipe()  # no tokenizers
        bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32)
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, None)
        )
        pipe.params["encoders"] = {}
        with pytest.raises(RuntimeError, match="fNIRS"):
            gen_fn(
                pipe, prompt="edit", use_brain_condition=True,
                fuse_flag=False, neural_only=True,
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla", output_type="latent",
                eeg=np.zeros((1, 4, 16), np.float32),
            )


    def test_brain_batch_widens_singleton_text_embeds(self, monkeypatch):
        """prompt=None encodes ONE empty prompt; a batched brain signal in
        replacement mode must widen the batch (broadcasting the remaining
        singleton text-derived embeds), not crash in the denoise scan."""
        import importlib

        from loongx_tpu.sampling import generate as gen_fn
        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")

        pipe = self._pipe()
        bp = jnp.ones((3, 8, pipe.flux_cfg.joint_dim), jnp.float32) * 0.3
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, None)
        )
        pipe.params["encoders"] = {}
        out = gen_fn(
            pipe,
            prompt_embeds=jnp.zeros((1, 8, pipe.flux_cfg.joint_dim)),
            pooled_prompt_embeds=jnp.full(
                (1, pipe.flux_cfg.pooled_dim), 0.7, jnp.float32
            ),
            use_brain_condition=True, fuse_flag=False,
            height=16, width=16, num_inference_steps=1, seed=0,
            attn_backend="xla", output_type="latent",
            eeg=np.zeros((3, 4, 16), np.float32),
        )
        assert np.asarray(out).shape[0] == 3
        assert np.isfinite(np.asarray(out)).all()


class TestNeuralOnlyTokenizerBacked:
    def test_neural_only_with_tokenizers_and_missing_slot_runs(self, monkeypatch):
        """With tokenizers loaded, real text embeds back a missing brain slot
        — the neural_only guard must NOT fire (r2 review finding: it used to
        raise even though nothing was zeroed)."""
        import importlib

        import numpy as np

        from loongx_tpu.models.pipeline import LoongXPipeline
        from loongx_tpu.sampling import generate as gen_fn
        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")

        pipe = LoongXPipeline.tiny(jax.random.key(0))
        # fake tokenizers: loaded <=> not None; encode_text is stubbed so the
        # tokenizer objects are never actually called
        pipe.t5_tokenizer = object()
        pipe.clip_tokenizer = object()
        monkeypatch.setattr(
            type(pipe), "encode_text",
            lambda self, prompts, neural_only=False: (
                jnp.ones((1, 8, self.flux_cfg.joint_dim), self.dtype),
                jnp.ones((1, self.flux_cfg.pooled_dim), self.dtype),
                jnp.zeros((8, 3), jnp.float32),
            ),
        )
        bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32)
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, None)
        )
        pipe.params["encoders"] = {}
        out = gen_fn(
            pipe, prompt="edit", use_brain_condition=True,
            fuse_flag=False, neural_only=True,
            height=16, width=16, num_inference_steps=1,
            attn_backend="xla", output_type="latent",
            eeg=np.zeros((1, 4, 16), np.float32),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestLatentsValidation:
    def test_user_latents_correct_shape(self, pipe):
        pe, pool = _embeds(pipe)
        n_tok = (16 // pipe.vae_cfg.downscale // 2) ** 2
        lat = jnp.zeros((1, n_tok, pipe.flux_cfg.in_channels), jnp.float32)
        img = generate(
            pipe, prompt_embeds=pe, pooled_prompt_embeds=pool, latents=lat,
            height=16, width=16, num_inference_steps=1, attn_backend="xla",
        )
        assert img.shape == (1, 16, 16, 3)

    def test_user_latents_wrong_shape_clear_error(self, pipe):
        """Mis-shaped user latents must fail fast with an actionable message
        (regression: previously surfaced as an opaque RoPE broadcast error
        deep inside the denoise scan)."""
        pe, pool = _embeds(pipe)
        lat = jnp.zeros((1, 7, pipe.flux_cfg.in_channels), jnp.float32)
        with pytest.raises(ValueError, match="latents shape .* packed latent"):
            generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                latents=lat, height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )


class TestInputValidation:
    """Fail-fast API-boundary checks (round-3 review findings): each of
    these previously crashed deep inside the jit trace or after the full
    denoise scan."""

    def test_odd_height_raises_before_denoise(self, pipe):
        pe, pool = _embeds(pipe)
        ds = pipe.vae_cfg.downscale
        with pytest.raises(ValueError, match="multiples"):
            generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                height=3 * ds, width=4 * ds, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_prompt_embeds_without_pooled_raises(self, pipe):
        pe, _ = _embeds(pipe)
        with pytest.raises(ValueError, match="pooled_prompt_embeds"):
            generate(
                pipe, prompt_embeds=pe, height=16, width=16,
                num_inference_steps=1, attn_backend="xla",
            )

    def test_cond_tokens_without_ids_raises(self, pipe):
        pe, pool = _embeds(pipe)
        with pytest.raises(ValueError, match="cond_ids"):
            generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                cond_tokens=jnp.zeros((4, pipe.flux_cfg.in_channels)),
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_neural_only_without_replacement_raises(self, pipe):
        with pytest.raises(ValueError, match="neural_only"):
            generate(
                pipe, prompt="edit", neural_only=True,
                use_brain_condition=False,
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_biosignal_only_condition_lifts_signals(self, monkeypatch):
        """Condition('eeg+fnirs', eeg=..., fnirs=...) without an image must
        route the signals into the brain path instead of crashing in
        Condition.encode (NotImplementedError)."""
        import importlib

        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        seen = {}

        def fake_encode(pipeline, eeg=None, fnirs=None, ppg=None,
                        motion=None, s4_mode="conv"):
            seen.update(eeg=eeg, fnirs=fnirs)
            bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32)
            bpool = jnp.ones((1, pipe.flux_cfg.pooled_dim), jnp.float32)
            return bp, bpool

        monkeypatch.setattr(gen_mod, "encode_brain_conditions", fake_encode)
        pipe.params["encoders"] = {}
        cond = Condition(
            "eeg+fnirs",
            eeg=np.zeros((1, 4, 16), np.float32),
            fnirs=np.ones((1, 6, 16), np.float32),
        )
        out = gen_mod.generate(
            pipe, conditions=[cond], use_brain_condition=True,
            fuse_flag=False, neural_only=True,
            height=16, width=16, num_inference_steps=1,
            attn_backend="xla", output_type="latent",
        )
        assert seen["eeg"] is not None and seen["fnirs"] is not None
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_fuse_partial_infer_mode_raises(self, monkeypatch):
        import importlib

        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32)
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, None)
        )
        pipe.params["encoders"] = {}
        pe, pool = _embeds(pipe)
        with pytest.raises(ValueError, match="fuse_mode='train'"):
            gen_mod.generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                use_brain_condition=True, fuse_flag=True,
                eeg=np.zeros((1, 4, 16), np.float32),
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_invalid_fuse_mode_and_output_type_raise(self, pipe):
        pe, pool = _embeds(pipe)
        kw = dict(prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
                  width=16, num_inference_steps=1, attn_backend="xla")
        with pytest.raises(ValueError, match="fuse_mode"):
            generate(pipe, fuse_mode="inference", **kw)
        with pytest.raises(ValueError, match="output_type"):
            generate(pipe, output_type="pil", **kw)
        with pytest.raises(ValueError, match="condition_scale"):
            generate(pipe, condition_scale=0.0, **kw)

    def test_conditions_and_cond_tokens_conflict(self, pipe):
        from PIL import Image as PILImage

        pe, pool = _embeds(pipe)
        img = PILImage.fromarray(
            np.zeros((16, 16, 3), np.uint8)
        )
        with pytest.raises(ValueError, match="not\\s+both"):
            generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                conditions=[Condition("canny", raw_img=img)],
                cond_tokens=jnp.zeros((4, pipe.flux_cfg.in_channels)),
                cond_ids=jnp.zeros((4, 3)),
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_brain_flag_mismatches_raise(self, pipe):
        pe, pool = _embeds(pipe)
        kw = dict(prompt_embeds=pe, pooled_prompt_embeds=pool, height=16,
                  width=16, num_inference_steps=1, attn_backend="xla")
        # use_brain_condition=True with zero signals must not silently
        # degrade to text-only
        pipe2 = LoongXPipeline.tiny(jax.random.key(1))
        pipe2.params["encoders"] = {}
        with pytest.raises(ValueError, match="no biosignals"):
            generate(pipe2, use_brain_condition=True, **kw)
        # a biosignal-carrying Condition with use_brain_condition=False
        # would be entirely unused
        cond = Condition("eeg+fnirs", eeg=np.zeros((1, 4, 16), np.float32))
        with pytest.raises(ValueError, match="use_brain_condition"):
            generate(pipe, conditions=[cond], **kw)

    def test_imageless_spatial_condition_raises(self, pipe):
        pe, pool = _embeds(pipe)
        with pytest.raises(ValueError, match="no\\s+condition image"):
            generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                conditions=[Condition("subject")],
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_fuse_wrong_token_count_raises(self, monkeypatch):
        """DGF fusion needs prompt_embeds with exactly the DUAN channel
        count of tokens — a named error at the generate() boundary, not an
        opaque matmul shape mismatch inside the jit."""
        import importlib

        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")
        pipe = LoongXPipeline.tiny(jax.random.key(0))
        bp = jnp.ones((1, 8, pipe.flux_cfg.joint_dim), jnp.float32)
        bpool = jnp.ones((1, pipe.flux_cfg.pooled_dim), jnp.float32)
        monkeypatch.setattr(
            gen_mod, "encode_brain_conditions", lambda *a, **k: (bp, bpool)
        )
        pipe.params["encoders"] = {}
        pipe.params["dgf"] = {
            "duan_prompt": {"gate_in": {"kernel": jnp.zeros((512, 4))}}
        }
        pe, pool = _embeds(pipe)  # 8 tokens != 512
        with pytest.raises(ValueError, match="512 tokens"):
            gen_mod.generate(
                pipe, prompt_embeds=pe, pooled_prompt_embeds=pool,
                use_brain_condition=True, fuse_flag=True,
                eeg=np.zeros((1, 4, 16), np.float32),
                height=16, width=16, num_inference_steps=1,
                attn_backend="xla",
            )

    def test_partial_encoders_named_error(self, pipe):
        from loongx_tpu.sampling.generate import encode_brain_conditions

        pipe2 = LoongXPipeline.tiny(jax.random.key(2))
        pipe2.params["encoders"] = {"eeg": {}}
        with pytest.raises(RuntimeError, match="ppg"):
            encode_brain_conditions(
                pipe2, eeg=np.zeros((1, 4, 16), np.float32),
                ppg=np.zeros((1, 4, 16), np.float32),
            )


class TestNeuralEditFused:
    """neural_edit (the single-dispatch fused edit program) must reproduce
    generate()'s deployed replace-mode path exactly."""

    def _stub_brain(self, gen_mod, monkeypatch, joint_dim, pooled_dim):
        # the real CS3 encoders emit [B,512,4096]/[B,768] (reference
        # contract) — too big for the tiny flux; a deterministic stub that
        # depends on the signals exercises the full wiring on both paths
        def fake(enc, dgf, eeg, ppg, fnirs, motion, s4_mode):
            bp = jnp.mean(eeg, axis=(1, 2))[:, None, None] + jnp.arange(
                8 * joint_dim, dtype=jnp.float32
            ).reshape(1, 8, joint_dim) / (8 * joint_dim)
            pl = jnp.mean(fnirs, axis=(1, 2))[:, None] + jnp.arange(
                pooled_dim, dtype=jnp.float32
            )[None] / pooled_dim
            return bp, pl

        monkeypatch.setattr(gen_mod, "_brain_encode_jit", fake)

    def test_matches_generate_replace_mode(self, monkeypatch):
        import importlib

        from PIL import Image

        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")
        pipe = LoongXPipeline.tiny(jax.random.key(3))
        pipe.params["encoders"] = {"eeg": {}, "fnirs": {}}
        self._stub_brain(
            gen_mod, monkeypatch, pipe.flux_cfg.joint_dim,
            pipe.flux_cfg.pooled_dim,
        )
        rng = np.random.default_rng(11)
        img = Image.fromarray(
            (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        )
        eeg = rng.standard_normal((1, 4, 16)).astype(np.float32)
        fnirs = rng.standard_normal((1, 6, 16)).astype(np.float32)
        kw = dict(
            height=16, width=16, num_inference_steps=2, guidance_scale=3.5,
            key=jax.random.key(7), attn_backend="xla",
        )

        want = gen_mod.generate(
            pipe,
            conditions=[
                Condition("eeg+fnirs", condition=img, eeg=eeg, fnirs=fnirs)
            ],
            use_brain_condition=True, fuse_flag=False, neural_only=True,
            **kw,
        )
        got = gen_mod.neural_edit(pipe, img, eeg=eeg, fnirs=fnirs, **kw)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_condition_scale_and_uint8(self, monkeypatch):
        import importlib

        from PIL import Image

        gen_mod = importlib.import_module("loongx_tpu.sampling.generate")
        pipe = LoongXPipeline.tiny(jax.random.key(4))
        pipe.params["encoders"] = {"eeg": {}, "fnirs": {}}
        self._stub_brain(
            gen_mod, monkeypatch, pipe.flux_cfg.joint_dim,
            pipe.flux_cfg.pooled_dim,
        )
        rng = np.random.default_rng(12)
        img = Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8))
        eeg = rng.standard_normal((1, 4, 16)).astype(np.float32)
        fnirs = rng.standard_normal((1, 6, 16)).astype(np.float32)
        kw = dict(height=16, width=16, num_inference_steps=1, seed=1,
                  attn_backend="xla")
        base = gen_mod.neural_edit(pipe, img, eeg=eeg, fnirs=fnirs, **kw)
        scaled = gen_mod.neural_edit(
            pipe, img, eeg=eeg, fnirs=fnirs, condition_scale=2.0, **kw
        )
        assert not np.allclose(base, scaled)
        u8 = gen_mod.neural_edit(
            pipe, img, eeg=eeg, fnirs=fnirs, output_type="uint8", **kw
        )
        assert u8.dtype == np.uint8

    def test_missing_slot_rejected(self):
        pipe = LoongXPipeline.tiny(jax.random.key(5))
        pipe.params["encoders"] = {"eeg": {}}
        from loongx_tpu.sampling import neural_edit

        with pytest.raises(ValueError, match="fnirs"):
            neural_edit(
                pipe, np.zeros((16, 16, 3), np.float32),
                eeg=np.zeros((1, 4, 16), np.float32),
                height=16, width=16, num_inference_steps=1,
            )
