"""Torch-oracle parity for the diffusers AutoencoderKL port.

The oracle re-states diffusers' VAE blocks (models/autoencoders/vae.py:
Encoder/Decoder, resnet.py: ResnetBlock2D, attention_processor.py: Attention
with heads=1) at tiny dims with the released state-dict naming, so
``convert_kl_vae`` is exercised on the real layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wmar_tpu.augmentations.diffusers_vae import (
    KLVAEConfig,
    convert_kl_vae,
    decode,
    encode,
)

GROUPS = 4


class ResnetBlock2D(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, i, eps=1e-6)
        self.conv1 = nn.Conv2d(i, o, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, o, eps=1e-6)
        self.conv2 = nn.Conv2d(o, o, 3, padding=1)
        if i != o:
            self.conv_shortcut = nn.Conv2d(i, o, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) / c**0.5, dim=-1)
        out = self.to_out[0](attn @ v)
        return out.transpose(1, 2).reshape(b, c, h, w) + residual


class MidBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock2D(c, c), ResnetBlock2D(c, c)])
        self.attentions = nn.ModuleList([Attention(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class DownBlock(nn.Module):
    def __init__(self, i, o, layers, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(i if j == 0 else o, o) for j in range(layers)]
        )
        if downsample:
            conv = nn.Conv2d(o, o, 3, stride=2)
            self.downsamplers = nn.ModuleList([nn.Module()])
            self.downsamplers[0].conv = conv

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = F.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class UpBlock(nn.Module):
    def __init__(self, i, o, layers, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(i if j == 0 else o, o) for j in range(layers + 1)]
        )
        if upsample:
            conv = nn.Conv2d(o, o, 3, padding=1)
            self.upsamplers = nn.ModuleList([nn.Module()])
            self.upsamplers[0].conv = conv

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TinyAutoencoderKL(nn.Module):
    def __init__(self, cfg: KLVAEConfig):
        super().__init__()
        ch = cfg.block_out_channels
        z = cfg.latent_channels
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        prev = ch[0]
        for i, c in enumerate(ch):
            enc.down_blocks.append(
                DownBlock(prev, c, cfg.layers_per_block, i != len(ch) - 1)
            )
            prev = c
        enc.mid_block = MidBlock(ch[-1])
        enc.conv_norm_out = nn.GroupNorm(GROUPS, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * z, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(z, ch[-1], 3, padding=1)
        dec.mid_block = MidBlock(ch[-1])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        prev = rev[0]
        for i, c in enumerate(rev):
            dec.up_blocks.append(UpBlock(prev, c, cfg.layers_per_block, i != len(ch) - 1))
            prev = c
        dec.conv_norm_out = nn.GroupNorm(GROUPS, ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], 3, 3, padding=1)
        self.decoder = dec
        if cfg.use_quant_conv:
            self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
            self.post_quant_conv = nn.Conv2d(z, z, 1)

    def enc_forward(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for b in e.down_blocks:
            h = b(h)
        h = e.mid_block(h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        if hasattr(self, "quant_conv"):
            h = self.quant_conv(h)
        return h

    def dec_forward(self, zz):
        d = self.decoder
        if hasattr(self, "post_quant_conv"):
            zz = self.post_quant_conv(zz)
        h = d.conv_in(zz)
        h = d.mid_block(h)
        for b in d.up_blocks:
            h = b(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


@pytest.mark.parametrize("use_quant", [True, False])
def test_kl_vae_parity(use_quant):
    cfg = KLVAEConfig(
        block_out_channels=(8, 16), layers_per_block=2, latent_channels=4,
        norm_num_groups=GROUPS, use_quant_conv=use_quant,
    )
    torch.manual_seed(0)
    model = TinyAutoencoderKL(cfg).eval()
    x_t = torch.rand(2, 3, 32, 32) * 2 - 1
    with torch.no_grad():
        moments_t = model.enc_forward(x_t)
        mean_t = moments_t.chunk(2, 1)[0]
        rec_t = model.dec_forward(mean_t)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_kl_vae(sd, cfg))
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    moments_j = encode(params, cfg, x_j)
    np.testing.assert_allclose(
        np.transpose(moments_j, (0, 3, 1, 2)), moments_t.numpy(), atol=2e-4
    )
    mean_j = jnp.split(moments_j, 2, axis=-1)[0]
    rec_j = decode(params, cfg, mean_j)
    np.testing.assert_allclose(
        np.transpose(rec_j, (0, 3, 1, 2)), rec_t.numpy(), atol=2e-4
    )
