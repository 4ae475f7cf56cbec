"""Torch golden fixture for the FLUX VAE (AutoencoderKL) math.

A transcription of the diffusers AutoencoderKL forward as configured for
FLUX.1 (the model the reference drives via ``pipeline.vae.encode/decode``,
/root/reference/src/flux/pipeline_tools.py:10-13 and generate.py:375-379):
ResnetBlock2D (GroupNorm-silu-conv ×2 + optional 1×1 shortcut), asymmetric
(0,1,0,1)-pad stride-2 downsample, nearest-2× upsample + conv, and the
single-head mid-block spatial attention with Linear q/k/v projections.

Parameter names follow the diffusers state-dict layout exactly, so
``state_dict()`` feeds ``utils/convert.convert_vae_state`` directly.
Used only by tests (torch CPU).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class ResnetBlock(nn.Module):
    def __init__(self, cin: int, cout: int, groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class MidAttention(nn.Module):
    """diffusers Attention as used in the VAE mid block: single head,
    Linear projections over channels, residual."""

    def __init__(self, c: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x)
        y = y.view(b, c, h * w).transpose(1, 2)  # [B, HW, C]
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        out = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        out = self.to_out[1](self.to_out[0](out))
        return x + out.transpose(1, 2).view(b, c, h, w)


class _Down(nn.Module):
    def __init__(self, cin, cout, layers, groups, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout, groups)
             for j in range(layers)]
        )
        if downsample:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = F.pad(x, (0, 1, 0, 1))  # diffusers asymmetric pad
            x = self.downsamplers[0].conv(x)
        return x


class _Up(nn.Module):
    def __init__(self, cin, cout, layers, groups, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout, groups)
             for j in range(layers + 1)]
        )
        if upsample:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _Mid(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(c, c, groups), ResnetBlock(c, c, groups)]
        )
        self.attentions = nn.ModuleList([MidAttention(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TorchVAE(nn.Module):
    """Tiny AutoencoderKL-compatible fixture (diffusers key layout)."""

    def __init__(self, block_channels=(8, 16), latent_channels=4,
                 layers_per_block=1, groups=4):
        super().__init__()
        ch = block_channels
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = ch[0]
        for i, cout in enumerate(ch):
            enc.down_blocks.append(
                _Down(cin, cout, layers_per_block, groups, i < len(ch) - 1)
            )
            cin = cout
        enc.mid_block = _Mid(cin, groups)
        enc.conv_norm_out = nn.GroupNorm(groups, cin, eps=1e-6)
        enc.conv_out = nn.Conv2d(cin, 2 * latent_channels, 3, padding=1)
        self.encoder = enc

        rch = tuple(reversed(ch))
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent_channels, rch[0], 3, padding=1)
        dec.mid_block = _Mid(rch[0], groups)
        dec.up_blocks = nn.ModuleList()
        cin = rch[0]
        for i, cout in enumerate(rch):
            dec.up_blocks.append(
                _Up(cin, cout, layers_per_block, groups, i < len(rch) - 1)
            )
            cin = cout
        dec.conv_norm_out = nn.GroupNorm(groups, cin, eps=1e-6)
        dec.conv_out = nn.Conv2d(cin, 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, images):
        e = self.encoder
        x = e.conv_in(images)
        for blk in e.down_blocks:
            x = blk(x)
        x = e.mid_block(x)
        x = e.conv_out(F.silu(e.conv_norm_out(x)))
        mean, logvar = x.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, latents):
        d = self.decoder
        x = d.conv_in(latents)
        x = d.mid_block(x)
        for blk in d.up_blocks:
            x = blk(x)
        return d.conv_out(F.silu(d.conv_norm_out(x)))
