"""Torch-oracle parity for the ADM (guided-diffusion) UNet converter.

The oracle re-states OpenAI guided-diffusion's UNetModel (unet.py: ResBlock
with scale-shift norm and resblock up/down, AttentionBlock with
QKVAttentionLegacy, TimestepEmbedSequential block numbering) at a tiny config
with the released state-dict naming (``256x256_diffusion_uncond.pt`` layout),
exercising ``convert_adm_unet`` end-to-end.
"""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wmar_tpu.augmentations.diffpure import ADMConfig, ADMUNet, convert_adm_unet

CFG = ADMConfig(
    image_size=16, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(8,), num_head_channels=16, diffusion_steps=50,
)


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedSequential(nn.Sequential):
    def forward(self, x, emb):
        for layer in self:
            x = layer(x, emb) if isinstance(layer, GDResBlock) else layer(x)
        return x


class GDResBlock(nn.Module):
    def __init__(self, ch, emb_ch, out_ch, up=False, down=False):
        super().__init__()
        self.up, self.down = up, down
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, ch, eps=1e-5), nn.SiLU(), nn.Conv2d(ch, out_ch, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_ch, 2 * out_ch))
        conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        nn.init.zeros_(conv2.weight), nn.init.zeros_(conv2.bias)
        with torch.no_grad():  # make the oracle nontrivial
            conv2.weight.add_(0.02 * torch.randn_like(conv2.weight))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, out_ch, eps=1e-5), nn.SiLU(), nn.Dropout(0.0), conv2
        )
        if ch != out_ch:
            self.skip_connection = nn.Conv2d(ch, out_ch, 1)

    def forward(self, x, emb):
        if self.up or self.down:
            h = self.in_layers[1](self.in_layers[0](x))
            resample = (
                (lambda z: F.interpolate(z, scale_factor=2.0, mode="nearest"))
                if self.up
                else (lambda z: F.avg_pool2d(z, 2))
            )
            h, x = resample(h), resample(x)
            h = self.in_layers[2](h)
        else:
            h = self.in_layers(x)
        emb_out = self.emb_layers(emb)[:, :, None, None]
        scale, shift = torch.chunk(emb_out, 2, dim=1)
        out_norm, out_rest = self.out_layers[0], self.out_layers[1:]
        h = out_rest(out_norm(h) * (1 + scale) + shift)
        skip = self.skip_connection(x) if hasattr(self, "skip_connection") else x
        return skip + h


class GDAttention(nn.Module):
    def __init__(self, ch, num_head_channels):
        super().__init__()
        self.n_heads = max(1, ch // num_head_channels)
        self.norm = nn.GroupNorm(32, ch, eps=1e-5)
        self.qkv = nn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)
        with torch.no_grad():
            nn.init.zeros_(self.proj_out.weight), nn.init.zeros_(self.proj_out.bias)
            self.proj_out.weight.add_(0.02 * torch.randn_like(self.proj_out.weight))

    def forward(self, x):
        b, c, hh, ww = x.shape
        xf = x.reshape(b, c, -1)
        qkv = self.qkv(self.norm(xf))
        # QKVAttentionLegacy
        ch = c // self.n_heads
        q, k, v = qkv.reshape(b * self.n_heads, ch * 3, -1).split(ch, dim=1)
        scale = 1 / math.sqrt(math.sqrt(ch))
        w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        w = torch.softmax(w, dim=-1)
        a = torch.einsum("bts,bcs->bct", w, v).reshape(b, c, -1)
        return (xf + self.proj_out(a)).reshape(b, c, hh, ww)


class GDUNet(nn.Module):
    def __init__(self, cfg: ADMConfig):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        emb_ch = 4 * mc
        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_ch), nn.SiLU(), nn.Linear(emb_ch, emb_ch)
        )
        attn_at = lambda ds: cfg.image_size // ds in cfg.attention_resolutions
        self.input_blocks = nn.ModuleList(
            [TimestepEmbedSequential(nn.Conv2d(cfg.in_channels, mc, 3, padding=1))]
        )
        ds, ch = 1, mc
        self.skip_chs = [ch]
        for li, mult in enumerate(cfg.channel_mult):
            out_ch = mc * mult
            for _ in range(cfg.num_res_blocks):
                layers = [GDResBlock(ch, emb_ch, out_ch)]
                ch = out_ch
                if attn_at(ds):
                    layers.append(GDAttention(ch, cfg.num_head_channels))
                self.input_blocks.append(TimestepEmbedSequential(*layers))
                self.skip_chs.append(ch)
            if li != len(cfg.channel_mult) - 1:
                self.input_blocks.append(
                    TimestepEmbedSequential(GDResBlock(ch, emb_ch, ch, down=True))
                )
                ds *= 2
                self.skip_chs.append(ch)
        self.middle_block = TimestepEmbedSequential(
            GDResBlock(ch, emb_ch, ch),
            GDAttention(ch, cfg.num_head_channels),
            GDResBlock(ch, emb_ch, ch),
        )
        self.output_blocks = nn.ModuleList()
        for li, mult in reversed(list(enumerate(cfg.channel_mult))):
            out_ch = mc * mult
            for bi in range(cfg.num_res_blocks + 1):
                ich = self.skip_chs.pop()
                layers = [GDResBlock(ch + ich, emb_ch, out_ch)]
                ch = out_ch
                if attn_at(ds):
                    layers.append(GDAttention(ch, cfg.num_head_channels))
                if li and bi == cfg.num_res_blocks:
                    layers.append(GDResBlock(ch, emb_ch, ch, up=True))
                    ds //= 2
                self.output_blocks.append(TimestepEmbedSequential(*layers))
        self.out = nn.Sequential(
            nn.GroupNorm(32, ch, eps=1e-5), nn.SiLU(),
            nn.Conv2d(ch, cfg.out_channels, 3, padding=1),
        )
        with torch.no_grad():
            nn.init.zeros_(self.out[2].weight), nn.init.zeros_(self.out[2].bias)
            self.out[2].weight.add_(0.02 * torch.randn_like(self.out[2].weight))

    def forward(self, x, t):
        emb = self.time_embed(timestep_embedding(t, self.cfg.model_channels))
        h, hs = x, []
        for block in self.input_blocks:
            h = block(h, emb)
            hs.append(h)
        h = self.middle_block(h, emb)
        for block in self.output_blocks:
            h = block(torch.cat([h, hs.pop()], dim=1), emb)
        return self.out(h)


def test_adm_unet_parity():
    torch.manual_seed(0)
    model = GDUNet(CFG).eval()
    x_t = torch.randn(2, 3, 16, 16)
    t_t = torch.tensor([3, 40])
    with torch.no_grad():
        y_t = model(x_t, t_t)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_adm_unet(sd, CFG))
    unet = ADMUNet(CFG)
    y_j = unet.apply(
        variables, jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)), jnp.asarray(t_t.numpy())
    )
    np.testing.assert_allclose(
        np.transpose(y_j, (0, 3, 1, 2)), y_t.numpy(), atol=3e-4,
        err_msg="ADM UNet conversion mismatch",
    )


def test_adm_converter_consumes_all_param_keys():
    """Every parameter tensor in the checkpoint layout must be mapped."""
    torch.manual_seed(1)
    model = GDUNet(CFG)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    converted = convert_adm_unet(sd, CFG)
    n_converted = len(jax.tree.leaves(converted))
    assert n_converted == len(sd), (n_converted, len(sd))
