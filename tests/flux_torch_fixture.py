"""Torch golden fixture for the FLUX transformer math.

A from-first-principles torch transcription of the reference's conditioned
FLUX forward — /root/reference/src/flux/block.py:7-339 (attn_forward,
block_forward, single_block_forward) and
/root/reference/src/flux/transformer.py:47-252 (orchestration) — together
with the diffusers building blocks those functions call into (AdaLayerNorm*,
RMS q/k norms, FluxPosEmbed rotary embeddings, sinusoidal time embeddings,
gelu-tanh FeedForward, SDPA).

Parameter names follow the diffusers FluxTransformer2DModel state-dict layout
exactly, so ``TorchFlux.state_dict()`` feeds ``utils/convert.convert_flux_state``
directly: the golden tests cover the weight conversion AND the JAX model math
in one comparison.

Used only by tests; torch (CPU) is a test dependency, never a runtime one.
"""

from __future__ import annotations

import math
from typing import Optional

import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------------------
# Rotary embeddings (diffusers FluxPosEmbed / apply_rotary_emb conventions)
# ---------------------------------------------------------------------------


def rope_cos_sin(ids: torch.Tensor, axes_dim=(16, 56, 56), theta: float = 10000.0):
    """ids [S, A] -> (cos, sin) [S, sum(axes_dim)] with interleaved-pair
    repetition (diffusers get_1d_rotary_pos_embed with
    repeat_interleave_real=True, use_real=True)."""
    cos_parts, sin_parts = [], []
    pos = ids.double()
    for axis, dim in enumerate(axes_dim):
        freqs = 1.0 / (
            theta ** (torch.arange(0, dim, 2, dtype=torch.float64) / dim)
        )
        angles = torch.outer(pos[:, axis], freqs)  # [S, dim/2]
        cos_parts.append(angles.cos().repeat_interleave(2, dim=1).float())
        sin_parts.append(angles.sin().repeat_interleave(2, dim=1).float())
    return torch.cat(cos_parts, dim=-1), torch.cat(sin_parts, dim=-1)


def apply_rotary_emb(x: torch.Tensor, freqs):
    """x [B, H, S, D]; freqs = (cos, sin) each [S, D].  Interleaved-pair
    rotation (diffusers apply_rotary_emb, use_real_unbind_dim=-1)."""
    cos, sin = freqs
    cos = cos[None, None]
    sin = sin[None, None]
    x_real, x_imag = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rotated * sin).to(x.dtype)


# ---------------------------------------------------------------------------
# Norm / embedding building blocks (diffusers semantics)
# ---------------------------------------------------------------------------


class RMSNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        xf = x.float()
        y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


class AdaLayerNormZero(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        e = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = e.chunk(
            6, dim=1
        )
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 3 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        e = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa = e.chunk(3, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        e = self.linear(F.silu(emb))
        scale, shift = e.chunk(2, dim=1)  # diffusers order: scale first
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


def sinusoidal_embedding(t: torch.Tensor, dim: int = 256) -> torch.Tensor:
    """diffusers get_timestep_embedding(flip_sin_to_cos=True,
    downscale_freq_shift=0): cat([cos, sin])."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([args.cos(), args.sin()], dim=-1)


class MLPEmbedder(nn.Module):
    """TimestepEmbedding / PixArtAlphaTextProjection: linear-silu-linear."""

    def __init__(self, in_dim: int, hidden: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, hidden)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class CombinedTimestepEmbed(nn.Module):
    """CombinedTimestepGuidanceTextProjEmbeddings (diffusers key names)."""

    def __init__(self, hidden: int, pooled_dim: int, guidance: bool = True):
        super().__init__()
        self.timestep_embedder = MLPEmbedder(256, hidden)
        self.text_embedder = MLPEmbedder(pooled_dim, hidden)
        if guidance:
            self.guidance_embedder = MLPEmbedder(256, hidden)
        self.guidance = guidance

    def forward(self, timestep, guidance, pooled):
        emb = self.timestep_embedder(sinusoidal_embedding(timestep))
        if self.guidance:
            emb = emb + self.guidance_embedder(sinusoidal_embedding(guidance))
        return emb + self.text_embedder(pooled)


class FeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='gelu-approximate') key layout:
    net.0.proj, net.2."""

    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.net = nn.ModuleList(
            [nn.Identity(), nn.Identity(), nn.Linear(inner, dim)]
        )
        self.net[0] = nn.Module()
        self.net[0].proj = nn.Linear(dim, inner)

    def forward(self, x):
        return self.net[2](F.gelu(self.net[0].proj(x), approximate="tanh"))


class FluxAttention(nn.Module):
    """Projection container mirroring diffusers Attention key names."""

    def __init__(self, dim: int, heads: int, head_dim: int, dual: bool):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(head_dim)
        self.norm_k = RMSNorm(head_dim)
        if dual:
            self.add_q_proj = nn.Linear(dim, dim)
            self.add_k_proj = nn.Linear(dim, dim)
            self.add_v_proj = nn.Linear(dim, dim)
            self.norm_added_q = RMSNorm(head_dim)
            self.norm_added_k = RMSNorm(head_dim)
            self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
            self.to_add_out = nn.Linear(dim, dim)


# ---------------------------------------------------------------------------
# attn_forward — transcription of reference block.py:7-176
# ---------------------------------------------------------------------------


def attn_forward(
    attn: FluxAttention,
    hidden_states: torch.Tensor,
    encoder_hidden_states: Optional[torch.Tensor] = None,
    condition_latents: Optional[torch.Tensor] = None,
    image_rotary_emb=None,
    cond_rotary_emb=None,
    model_config: Optional[dict] = None,
    c_factor: Optional[torch.Tensor] = None,
):
    model_config = model_config or {}
    batch_size = (
        hidden_states.shape[0]
        if encoder_hidden_states is None
        else encoder_hidden_states.shape[0]
    )
    heads = attn.heads
    attention_mask = None

    def split(t):
        return t.view(batch_size, -1, heads, t.shape[-1] // heads).transpose(1, 2)

    query = split(attn.to_q(hidden_states))
    key = split(attn.to_k(hidden_states))
    value = split(attn.to_v(hidden_states))
    query = attn.norm_q(query)
    key = attn.norm_k(key)

    if encoder_hidden_states is not None:
        eq = attn.norm_added_q(split(attn.add_q_proj(encoder_hidden_states)))
        ek = attn.norm_added_k(split(attn.add_k_proj(encoder_hidden_states)))
        ev = split(attn.add_v_proj(encoder_hidden_states))
        query = torch.cat([eq, query], dim=2)
        key = torch.cat([ek, key], dim=2)
        value = torch.cat([ev, value], dim=2)

    if image_rotary_emb is not None:
        query = apply_rotary_emb(query, image_rotary_emb)
        key = apply_rotary_emb(key, image_rotary_emb)

    if condition_latents is not None:
        cond_query = attn.norm_q(split(attn.to_q(condition_latents)))
        cond_key = attn.norm_k(split(attn.to_k(condition_latents)))
        cond_value = split(attn.to_v(condition_latents))
        if cond_rotary_emb is not None:
            cond_query = apply_rotary_emb(cond_query, cond_rotary_emb)
            cond_key = apply_rotary_emb(cond_key, cond_rotary_emb)
        query = torch.cat([query, cond_query], dim=2)
        key = torch.cat([key, cond_key], dim=2)
        value = torch.cat([value, cond_value], dim=2)

    # mask modes (reference block.py:106-128; c_factor replaces masks)
    if condition_latents is not None:
        condition_n = condition_latents.shape[1]
        if not model_config.get("union_cond_attn", True):
            attention_mask = torch.ones(
                query.shape[2], key.shape[2], dtype=torch.bool
            )
            attention_mask[-condition_n:, :-condition_n] = False
            attention_mask[:-condition_n, -condition_n:] = False
        elif model_config.get("independent_condition", False):
            attention_mask = torch.ones(
                query.shape[2], key.shape[2], dtype=torch.bool
            )
            attention_mask[-condition_n:, :-condition_n] = False
        if c_factor is not None:
            attention_mask = torch.zeros(
                query.shape[2], key.shape[2], dtype=query.dtype
            )
            bias = torch.log(c_factor)
            attention_mask[-condition_n:, :-condition_n] = bias
            attention_mask[:-condition_n, -condition_n:] = bias

    hidden_states = F.scaled_dot_product_attention(
        query, key, value, dropout_p=0.0, is_causal=False,
        attn_mask=attention_mask,
    )
    hidden_states = hidden_states.transpose(1, 2).reshape(
        batch_size, -1, query.shape[1] * query.shape[-1]
    ).to(query.dtype)

    if encoder_hidden_states is not None:
        s_txt = encoder_hidden_states.shape[1]
        if condition_latents is not None:
            s_cond = condition_latents.shape[1]
            enc, hid, cond = (
                hidden_states[:, :s_txt],
                hidden_states[:, s_txt:-s_cond],
                hidden_states[:, -s_cond:],
            )
        else:
            enc, hid = hidden_states[:, :s_txt], hidden_states[:, s_txt:]
            cond = None
        hid = attn.to_out[1](attn.to_out[0](hid))
        enc = attn.to_add_out(enc)
        if cond is not None:
            cond = attn.to_out[1](attn.to_out[0](cond))
            return hid, enc, cond
        return hid, enc
    elif condition_latents is not None:
        s_cond = condition_latents.shape[1]
        return hidden_states[:, :-s_cond], hidden_states[:, -s_cond:]
    return hidden_states


# ---------------------------------------------------------------------------
# Blocks — transcriptions of reference block.py:179-339
# ---------------------------------------------------------------------------


class TorchDoubleBlock(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, mlp_ratio: int = 4):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = FluxAttention(dim, heads, head_dim, dual=True)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim, mlp_ratio * dim)
        self.ff_context = FeedForward(dim, mlp_ratio * dim)

    def forward(
        self, hidden_states, encoder_hidden_states, condition_latents,
        temb, cond_temb, image_rotary_emb=None, cond_rotary_emb=None,
        model_config=None, c_factor=None,
    ):
        model_config = model_config or {}
        use_cond = condition_latents is not None
        norm_hidden, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
            hidden_states, emb=temb
        )
        norm_enc, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
            self.norm1_context(encoder_hidden_states, emb=temb)
        )
        if use_cond:
            norm_cond, cond_gate_msa, cond_shift_mlp, cond_scale_mlp, cond_gate_mlp = (
                self.norm1(condition_latents, emb=cond_temb)
            )

        result = attn_forward(
            self.attn, model_config=model_config, hidden_states=norm_hidden,
            encoder_hidden_states=norm_enc,
            condition_latents=norm_cond if use_cond else None,
            image_rotary_emb=image_rotary_emb,
            cond_rotary_emb=cond_rotary_emb if use_cond else None,
            c_factor=c_factor,
        )
        attn_output, context_attn_output = result[:2]
        cond_attn_output = result[2] if use_cond else None

        hidden_states = hidden_states + gate_msa.unsqueeze(1) * attn_output
        encoder_hidden_states = (
            encoder_hidden_states + c_gate_msa.unsqueeze(1) * context_attn_output
        )
        if use_cond:
            cond_attn_output = cond_gate_msa.unsqueeze(1) * cond_attn_output
            condition_latents = condition_latents + cond_attn_output
            if model_config.get("add_cond_attn", False):
                hidden_states = hidden_states + cond_attn_output

        norm_hidden = (
            self.norm2(hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        )
        norm_enc = (
            self.norm2_context(encoder_hidden_states) * (1 + c_scale_mlp[:, None])
            + c_shift_mlp[:, None]
        )
        hidden_states = hidden_states + gate_mlp.unsqueeze(1) * self.ff(norm_hidden)
        encoder_hidden_states = (
            encoder_hidden_states
            + c_gate_mlp.unsqueeze(1) * self.ff_context(norm_enc)
        )
        if use_cond:
            norm_cond = (
                self.norm2(condition_latents) * (1 + cond_scale_mlp[:, None])
                + cond_shift_mlp[:, None]
            )
            condition_latents = (
                condition_latents + cond_gate_mlp.unsqueeze(1) * self.ff(norm_cond)
            )
        return (
            encoder_hidden_states, hidden_states,
            condition_latents if use_cond else None,
        )


class TorchSingleBlock(nn.Module):
    def __init__(self, dim: int, heads: int, head_dim: int, mlp_ratio: int = 4):
        super().__init__()
        self.norm = AdaLayerNormZeroSingle(dim)
        self.attn = FluxAttention(dim, heads, head_dim, dual=False)
        self.proj_mlp = nn.Linear(dim, mlp_ratio * dim)
        self.proj_out = nn.Linear(dim + mlp_ratio * dim, dim)

    def forward(
        self, hidden_states, temb, image_rotary_emb=None,
        condition_latents=None, cond_temb=None, cond_rotary_emb=None,
        model_config=None, c_factor=None,
    ):
        model_config = model_config or {}
        using_cond = condition_latents is not None
        residual = hidden_states
        norm_hidden, gate = self.norm(hidden_states, emb=temb)
        mlp_hidden = F.gelu(self.proj_mlp(norm_hidden), approximate="tanh")
        if using_cond:
            residual_cond = condition_latents
            norm_cond, cond_gate = self.norm(condition_latents, emb=cond_temb)
            mlp_cond = F.gelu(self.proj_mlp(norm_cond), approximate="tanh")

        attn_output = attn_forward(
            self.attn, model_config=model_config, hidden_states=norm_hidden,
            image_rotary_emb=image_rotary_emb,
            **(
                {"condition_latents": norm_cond, "cond_rotary_emb": cond_rotary_emb}
                if using_cond
                else {}
            ),
            c_factor=c_factor,
        )
        if using_cond:
            attn_output, cond_attn_output = attn_output

        hidden_states = torch.cat([attn_output, mlp_hidden], dim=2)
        hidden_states = residual + gate.unsqueeze(1) * self.proj_out(hidden_states)
        if using_cond:
            condition_latents = torch.cat([cond_attn_output, mlp_cond], dim=2)
            condition_latents = (
                residual_cond + cond_gate.unsqueeze(1) * self.proj_out(condition_latents)
            )
            return hidden_states, condition_latents
        return hidden_states


# ---------------------------------------------------------------------------
# Full transformer — transcription of reference transformer.py:47-252
# ---------------------------------------------------------------------------


class TorchFlux(nn.Module):
    """Tiny FluxTransformer2DModel-compatible fixture (diffusers state-dict
    key layout; forward per reference tranformer_forward)."""

    def __init__(
        self, in_channels=16, heads=2, head_dim=32, num_double=2, num_single=2,
        joint_dim=32, pooled_dim=16, guidance=True, axes_dim=(8, 12, 12),
    ):
        super().__init__()
        dim = heads * head_dim
        self.axes_dim = axes_dim
        self.guidance_embeds = guidance
        self.x_embedder = nn.Linear(in_channels, dim)
        self.context_embedder = nn.Linear(joint_dim, dim)
        self.time_text_embed = CombinedTimestepEmbed(dim, pooled_dim, guidance)
        self.transformer_blocks = nn.ModuleList(
            [TorchDoubleBlock(dim, heads, head_dim) for _ in range(num_double)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [TorchSingleBlock(dim, heads, head_dim) for _ in range(num_single)]
        )
        self.norm_out = AdaLayerNormContinuous(dim)
        self.proj_out = nn.Linear(dim, in_channels)

    def forward(
        self, hidden_states, encoder_hidden_states, pooled, timestep,
        img_ids, txt_ids, guidance=None, condition_latents=None,
        condition_ids=None, model_config=None, c_t=0.0, c_factor=None,
        controlnet_block_samples=None, controlnet_single_block_samples=None,
    ):
        model_config = model_config or {}
        use_condition = condition_latents is not None
        hidden_states = self.x_embedder(hidden_states)
        condition_latents = (
            self.x_embedder(condition_latents) if use_condition else None
        )
        timestep = timestep.float() * 1000
        if guidance is not None:
            guidance = guidance.float() * 1000
        temb = self.time_text_embed(timestep, guidance, pooled)
        cond_temb = self.time_text_embed(
            torch.ones_like(timestep) * c_t * 1000, guidance, pooled
        )
        encoder_hidden_states = self.context_embedder(encoder_hidden_states)

        ids = torch.cat((txt_ids, img_ids), dim=0)
        image_rotary_emb = rope_cos_sin(ids, self.axes_dim)
        cond_rotary_emb = (
            rope_cos_sin(condition_ids, self.axes_dim) if use_condition else None
        )

        for index_block, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states, condition_latents = block(
                hidden_states=hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                condition_latents=condition_latents if use_condition else None,
                temb=temb,
                cond_temb=cond_temb if use_condition else None,
                image_rotary_emb=image_rotary_emb,
                cond_rotary_emb=cond_rotary_emb if use_condition else None,
                model_config=model_config,
                c_factor=c_factor,
            )
            # controlnet residual (reference transformer.py:172-181)
            if controlnet_block_samples is not None:
                interval = int(
                    math.ceil(
                        len(self.transformer_blocks)
                        / len(controlnet_block_samples)
                    )
                )
                hidden_states = (
                    hidden_states
                    + controlnet_block_samples[index_block // interval]
                )

        s_txt = encoder_hidden_states.shape[1]
        hidden_states = torch.cat([encoder_hidden_states, hidden_states], dim=1)
        for index_block, block in enumerate(self.single_transformer_blocks):
            result = block(
                hidden_states=hidden_states,
                temb=temb,
                image_rotary_emb=image_rotary_emb,
                **(
                    {
                        "condition_latents": condition_latents,
                        "cond_temb": cond_temb,
                        "cond_rotary_emb": cond_rotary_emb,
                    }
                    if use_condition
                    else {}
                ),
                model_config=model_config,
                c_factor=c_factor,
            )
            if use_condition:
                hidden_states, condition_latents = result
            else:
                hidden_states = result
            # controlnet residual (reference transformer.py:230-239)
            if controlnet_single_block_samples is not None:
                interval = int(
                    math.ceil(
                        len(self.single_transformer_blocks)
                        / len(controlnet_single_block_samples)
                    )
                )
                hidden_states = torch.cat(
                    [
                        hidden_states[:, :s_txt],
                        hidden_states[:, s_txt:]
                        + controlnet_single_block_samples[index_block // interval],
                    ],
                    dim=1,
                )

        hidden_states = hidden_states[:, s_txt:]
        hidden_states = self.norm_out(hidden_states, temb)
        return self.proj_out(hidden_states)
