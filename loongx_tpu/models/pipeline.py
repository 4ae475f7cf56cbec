"""LoongXPipeline: the full model bundle (DiT + VAE + text encoders + CS3
encoders + DGF fusion) as one pytree-of-params container.

Replaces the reference's diffusers ``FluxPipeline`` + ``OminiModel`` pairing
(/root/reference/src/train/model.py:376-462) with a plain dataclass of configs
and param pytrees — no module objects, no device state; everything jit/pjit
ready.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from loongx_tpu.models.flux.model import FluxConfig, init_flux_params
from loongx_tpu.models.flux.vae import (
    VAEConfig,
    init_vae_params,
    vae_encode,
    vae_sample,
    scale_latents,
)
from loongx_tpu.models.text.t5 import T5Config, init_t5_params, t5_encode
from loongx_tpu.models.text.clip import (
    CLIPTextConfig,
    init_clip_params,
    clip_encode,
)
from loongx_tpu.models.encoders import (
    init_eeg_encoder,
    init_ppg_encoder,
    init_fnirs_encoder,
    init_motion_encoder,
)
from loongx_tpu.models.fusion import init_dgf
from loongx_tpu.ops.latents import pack_latents


@dataclasses.dataclass
class LoongXPipeline:
    flux_cfg: FluxConfig
    vae_cfg: VAEConfig
    t5_cfg: T5Config
    clip_cfg: CLIPTextConfig
    params: Dict[str, Any]  # {"flux", "vae", "t5", "clip", "encoders", "dgf"}
    dtype: Any = jnp.bfloat16
    t5_tokenizer: Any = None
    clip_tokenizer: Any = None
    max_sequence_length: int = 512
    # named LoRA adapters (train.adapters.AdapterRegistry) — the peft
    # multi-adapter model (reference generate.py:279 set_adapters)
    adapters: Any = None
    active_adapter: Optional[str] = None

    def set_adapters(self, name: str) -> bool:
        """Activate the named LoRA adapter on the DiT (reference
        pipeline.set_adapters, generate.py:279).  No-op (returns False) when
        no registry is attached; KeyError on an unknown name."""
        if self.adapters is None:
            return False
        if name == self.active_adapter:
            return True
        self.params["flux"] = self.adapters.activate(self.params["flux"], name)
        self.active_adapter = name
        return True

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @staticmethod
    def init_random(
        key: jax.Array,
        flux_cfg: Optional[FluxConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        t5_cfg: Optional[T5Config] = None,
        clip_cfg: Optional[CLIPTextConfig] = None,
        dtype=jnp.bfloat16,
        with_biosignal: bool = True,
    ) -> "LoongXPipeline":
        flux_cfg = flux_cfg or FluxConfig.flux_dev()
        vae_cfg = vae_cfg or VAEConfig.flux()
        t5_cfg = t5_cfg or T5Config.xxl()
        clip_cfg = clip_cfg or CLIPTextConfig.large()
        ks = jax.random.split(key, 9)
        params: Dict[str, Any] = {
            "flux": init_flux_params(ks[0], flux_cfg, dtype),
            "vae": init_vae_params(ks[1], vae_cfg, dtype),
            "t5": init_t5_params(ks[2], t5_cfg, dtype),
            "clip": init_clip_params(ks[3], clip_cfg, dtype),
        }
        if with_biosignal:
            params["encoders"] = {
                "eeg": init_eeg_encoder(ks[4], dtype),
                "ppg": init_ppg_encoder(ks[5], dtype),
                "fnirs": init_fnirs_encoder(ks[6], dtype),
                "motion": init_motion_encoder(ks[7], dtype),
            }
            params["dgf"] = init_dgf(ks[8], dtype)
        return LoongXPipeline(
            flux_cfg=flux_cfg, vae_cfg=vae_cfg, t5_cfg=t5_cfg, clip_cfg=clip_cfg,
            params=params, dtype=dtype,
        )

    @staticmethod
    def tiny(key: jax.Array, dtype=jnp.float32, with_biosignal: bool = False,
             ) -> "LoongXPipeline":
        """Miniature pipeline for tests: consistent tiny dims end to end."""
        vae_cfg = VAEConfig.tiny()
        t5_cfg = T5Config.tiny()
        clip_cfg = CLIPTextConfig.tiny()
        flux_cfg = FluxConfig(
            in_channels=4 * vae_cfg.latent_channels,
            num_heads=2, head_dim=32, num_double_blocks=2, num_single_blocks=2,
            joint_dim=t5_cfg.d_model, pooled_dim=clip_cfg.hidden,
            axes_dims=(8, 12, 12),
        )
        pipe = LoongXPipeline.init_random(
            key, flux_cfg, vae_cfg, t5_cfg, clip_cfg, dtype,
            with_biosignal=False,
        )
        if with_biosignal:
            # Full-size CS3/DGF stacks (their dims are fixed by the reference
            # contract: [B,512,4096] / [B,768]) don't fit a tiny flux; tests
            # use them standalone.
            ks = jax.random.split(jax.random.fold_in(key, 1), 5)
            pipe.params["encoders"] = {
                "eeg": init_eeg_encoder(ks[0], dtype),
                "ppg": init_ppg_encoder(ks[1], dtype),
                "fnirs": init_fnirs_encoder(ks[2], dtype),
                "motion": init_motion_encoder(ks[3], dtype),
            }
            pipe.params["dgf"] = init_dgf(ks[4], dtype)
        return pipe

    @staticmethod
    def from_pretrained(
        path: str, dtype=jnp.bfloat16, quantize: bool = False,
        components=None,
    ) -> "LoongXPipeline":
        """Load a converted checkpoint directory (see utils/convert.py).

        quantize=True int8-quantizes the DiT and text encoders at load —
        the single-chip serving mode for models that FIT in bf16 first.
        At the 12B flux-dev scale that's impossible (23.8 GB bf16 > HBM):
        convert with ``cli/convert.py --quantize`` so the checkpoint is
        already int8, and stage loads with ``components``
        (e.g. ("t5", "clip", "vae") -> encode -> free -> ("flux",)); see
        docs/WEIGHTS.md and benchmarks/convert_rehearsal.py."""
        from loongx_tpu.utils.checkpoint import load_pipeline

        pipe = load_pipeline(path, dtype=dtype, components=components)
        if quantize:
            pipe.quantize()
        return pipe

    def quantize(
        self, dit: bool = True, text: bool = True, fuse_qkv: bool = True,
        split_proj_out: bool = True,
    ) -> "LoongXPipeline":
        """Int8-quantize weights in place (per-out-channel, ops/quant.py).

        The DiT runs its Pallas tile-dequant / W8A8 kernels; the text
        encoders use the transparent qdot dequant (one-shot per prompt,
        off the denoise hot path).  fuse_qkv concatenates each attention's
        q/k/v projections into one matmul (exact; skipped automatically on
        LoRA-carrying projections) — pass False when serving under tensor
        parallelism (whose sharding rules address the unfused axes) or when
        a LoRA will be attached afterwards (adapters address q/k/v
        individually).  split_proj_out K-splits the single-block proj_out
        (exact; LoRA-COMPATIBLE — later attaches route their factor rows,
        train/lora.load_lora_state_dict) — pass False only under TP."""
        from loongx_tpu.ops.quant import fuse_qkv_projections, quantize_tree

        if dit and "flux" in self.params:
            from loongx_tpu.ops.quant import split_single_proj_out

            self.params["flux"] = quantize_tree(self.params["flux"])
            if fuse_qkv:
                # consume=True: the transform's peak HBM is one fused stack,
                # not fused+unfused — matters on the ~14 GiB serving target
                self.params["flux"] = fuse_qkv_projections(
                    self.params["flux"], consume=True
                )
            if split_proj_out:
                self.params["flux"] = split_single_proj_out(
                    self.params["flux"], self.flux_cfg.hidden, consume=True
                )
        if text:
            for name in ("t5", "clip"):
                if name in self.params:
                    self.params[name] = quantize_tree(self.params[name])
        return self

    def free_text_encoders(self) -> None:
        """Release T5/CLIP params (device memory drops by their footprint).

        Single-chip staging recipe for the FULL pipeline in ~14 GiB: encode
        all prompts first (batched), call this, then run the denoise loop —
        the functional design makes the encoders a plain pytree to drop.
        ``encode_text`` raises afterwards; re-load to encode again."""
        for name in ("t5", "clip"):
            self.params.pop(name, None)
        self.t5_tokenizer = None
        self.clip_tokenizer = None

    # ------------------------------------------------------------------
    # Encoding helpers (the reference's pipeline_tools equivalents)
    # ------------------------------------------------------------------

    def encode_image_tokens(
        self, images: jnp.ndarray, key: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, int, int]:
        """images [B,H,W,3] in [-1,1] -> (packed latent tokens, lat_h, lat_w)
        (reference pipeline_tools.encode_images:7-30).  Deterministic (mean)
        unless a sampling key is given."""
        images = images.astype(self.dtype)
        mean, logvar = vae_encode(self.params["vae"], self.vae_cfg, images)
        lat = vae_sample(mean, logvar, key) if key is not None else mean
        lat = scale_latents(self.vae_cfg, lat)
        tokens = pack_latents(lat)
        return tokens, lat.shape[1], lat.shape[2]

    def encode_text(
        self, prompts, neural_only: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """prompts (list[str]) -> (prompt_embeds [B,S,4096], pooled [B,768],
        txt_ids [S,3]) (reference pipeline_tools.prepare_text_input:33-52).

        Missing tokenizers are a hard error unless ``neural_only=True`` is
        passed explicitly: in the deployed neural-only mode brain embeddings
        replace the text embeddings anyway (reference inference.py:115), so
        zero text embeds are safe there — but silently zeroing them in
        fuse mode would destroy text conditioning."""
        if prompts is None:
            # deployed neural-only mode passes no prompt (brain embeds
            # replace text); one empty prompt keeps batch semantics intact
            prompts = [""]
        elif isinstance(prompts, str):
            prompts = [prompts]
        if self.t5_tokenizer is None or self.clip_tokenizer is None:
            if not neural_only:
                raise RuntimeError(
                    "encode_text: no tokenizers loaded in this pipeline. "
                    "Add t5_tokenizer/clip_tokenizer directories to the "
                    "checkpoint for text conditioning, or pass "
                    "neural_only=True (CLI: --neural_only) if brain "
                    "embeddings replace text embeddings (fuse_flag=False)."
                )
            b = len(prompts)
            return (
                jnp.zeros(
                    (b, self.max_sequence_length, self.t5_cfg.d_model),
                    self.dtype,
                ),
                jnp.zeros((b, self.clip_cfg.hidden), self.dtype),
                jnp.zeros((self.max_sequence_length, 3), jnp.float32),
            )
        t5_ids = self.t5_tokenizer(
            prompts, padding="max_length", max_length=self.max_sequence_length,
            truncation=True, return_tensors="np",
        ).input_ids
        prompt_embeds = t5_encode(self.params["t5"], self.t5_cfg, jnp.asarray(t5_ids))
        clip_ids = self.clip_tokenizer(
            prompts, padding="max_length",
            max_length=min(77, self.clip_cfg.max_positions),
            truncation=True, return_tensors="np",
        ).input_ids
        _, pooled = clip_encode(
            self.params["clip"], self.clip_cfg, jnp.asarray(clip_ids)
        )
        txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.float32)
        return prompt_embeds.astype(self.dtype), pooled.astype(self.dtype), txt_ids
