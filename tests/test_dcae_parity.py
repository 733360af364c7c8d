"""Torch-oracle parity for the DC-AE (AutoencoderDC / EfficientViT) port.

The oracle re-states diffusers' ``models/autoencoders/autoencoder_dc.py``
blocks (ResBlock, GLUMBConv, EfficientViTBlock, DCDownBlock2d, DCUpBlock2d,
Encoder/Decoder shortcuts) and ``attention_processor.py``'s
SanaMultiscaleLinearAttention at tiny dims with the released state-dict
naming, so ``convert_dcae``'s shape-driven geometry inference is exercised
on the real layout — including both possible up_blocks storage orders and
both stem/head types (plain conv vs the f64 family's down/upsampling stem).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wmar_tpu.augmentations.dcae import convert_dcae, dcae_decode, dcae_encode

HEAD_DIM = 4
CH = [8, 16, 16]
TYPES = ["ResBlock", "ResBlock", "EfficientViTBlock"]
MS = [(), (), (5,)]


class RMSNormCL(nn.Module):
    """diffusers RMSNorm (channels-last), eps 1e-5, affine + bias."""

    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(dim).uniform_(0.5, 1.5))
        self.bias = nn.Parameter(torch.empty(dim).uniform_(-0.5, 0.5))

    def forward(self, x):
        dt = x.dtype
        v = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + 1e-5)).to(dt) * self.weight + self.bias


class ResBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.norm = RMSNormCL(c)

    def forward(self, x):
        h = self.conv1(x)
        h = F.silu(h)
        h = self.conv2(h)
        h = self.norm(h.movedim(1, -1)).movedim(-1, 1)
        return x + h


class GLUMBConv(nn.Module):
    def __init__(self, c, expand=4):
        super().__init__()
        hid = c * expand
        self.conv_inverted = nn.Conv2d(c, hid * 2, 1)
        self.conv_depth = nn.Conv2d(hid * 2, hid * 2, 3, 1, 1, groups=hid * 2)
        self.conv_point = nn.Conv2d(hid, c, 1, bias=False)
        self.norm = RMSNormCL(c)

    def forward(self, x):
        r = x
        x = self.conv_inverted(x)
        x = F.silu(x)
        x = self.conv_depth(x)
        x, gate = torch.chunk(x, 2, dim=1)
        x = x * F.silu(gate)
        x = self.conv_point(x)
        x = self.norm(x.movedim(1, -1)).movedim(-1, 1)
        return x + r


class SanaMultiscaleProjection(nn.Module):
    def __init__(self, inner, heads, k):
        super().__init__()
        ch = 3 * inner
        self.proj_in = nn.Conv2d(ch, ch, k, padding=k // 2, groups=ch, bias=False)
        self.proj_out = nn.Conv2d(ch, ch, 1, groups=3 * heads, bias=False)

    def forward(self, x):
        return self.proj_out(self.proj_in(x))


class SanaMultiscaleLinearAttention(nn.Module):
    def __init__(self, c, head_dim, kernel_sizes):
        super().__init__()
        heads = c // head_dim
        inner = heads * head_dim
        self.head_dim = head_dim
        self.eps = 1e-15
        self.to_q = nn.Linear(c, inner, bias=False)
        self.to_k = nn.Linear(c, inner, bias=False)
        self.to_v = nn.Linear(c, inner, bias=False)
        self.to_qkv_multiscale = nn.ModuleList(
            SanaMultiscaleProjection(inner, heads, k) for k in kernel_sizes
        )
        self.to_out = nn.Linear(inner * (1 + len(kernel_sizes)), c, bias=False)
        self.norm_out = RMSNormCL(c)

    def forward(self, x):
        b, _, hh, ww = x.shape
        residual = x
        h = x.movedim(1, -1)
        qkv = torch.cat([self.to_q(h), self.to_k(h), self.to_v(h)], dim=3).movedim(-1, 1)
        branches = [qkv]
        for block in self.to_qkv_multiscale:
            branches.append(block(qkv))
        h = torch.cat(branches, dim=1)
        n = hh * ww
        h = h.reshape(b, -1, 3 * self.head_dim, n)
        q, k, v = h.chunk(3, dim=2)
        q = F.relu(q)
        k = F.relu(k)
        if n > self.head_dim:  # linear attention
            q, k, v = q.float(), k.float(), v.float()
            v1 = F.pad(v, (0, 0, 0, 1), value=1.0)
            out = torch.matmul(torch.matmul(v1, k.transpose(-1, -2)), q)
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
        else:  # quadratic attention
            scores = torch.matmul(k.transpose(-1, -2), q).float()
            scores = scores / (scores.sum(dim=2, keepdim=True) + self.eps)
            out = torch.matmul(v.float(), scores)
        out = out.to(x.dtype).reshape(b, -1, hh, ww)
        out = self.to_out(out.movedim(1, -1))
        out = self.norm_out(out).movedim(-1, 1)
        return out + residual


class EfficientViTBlock(nn.Module):
    def __init__(self, c, head_dim, kernel_sizes):
        super().__init__()
        self.attn = SanaMultiscaleLinearAttention(c, head_dim, kernel_sizes)
        self.conv_out = GLUMBConv(c)

    def forward(self, x):
        return self.conv_out(self.attn(x))


class DCDownBlock2d(nn.Module):
    def __init__(self, cin, cout, pixel_unshuffle=False, shortcut=True):
        super().__init__()
        self.pixel_unshuffle = pixel_unshuffle
        self.shortcut = shortcut
        self.cout = cout
        self.group_size = cin * 4 // cout
        self.conv = nn.Conv2d(cin, cout // 4 if pixel_unshuffle else cout, 3,
                              1 if pixel_unshuffle else 2, 1)

    def forward(self, x):
        y = self.conv(x)
        if self.pixel_unshuffle:
            y = F.pixel_unshuffle(y, 2)
        if self.shortcut:
            s = F.pixel_unshuffle(x, 2)
            s = s.unflatten(1, (-1, self.group_size)).mean(dim=2)
            y = y + s
        return y


class DCUpBlock2d(nn.Module):
    def __init__(self, cin, cout, interpolate=True, shortcut=True):
        super().__init__()
        self.interpolate = interpolate
        self.shortcut = shortcut
        self.repeats = cout * 4 // cin
        self.conv = nn.Conv2d(cin, cout if interpolate else cout * 4, 3, 1, 1)

    def forward(self, x):
        if self.interpolate:
            return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))
        y = F.pixel_shuffle(self.conv(x), 2)
        if self.shortcut:
            y = y + F.pixel_shuffle(x.repeat_interleave(self.repeats, dim=1), 2)
        return y


def _block(t, c, ms):
    return ResBlock(c) if t == "ResBlock" else EfficientViTBlock(c, HEAD_DIM, ms)


class Encoder(nn.Module):
    def __init__(self, layers, down_type="conv"):
        super().__init__()
        punsh = down_type == "pixel_unshuffle"
        if layers[0] > 0:
            self.conv_in = nn.Conv2d(3, CH[0], 3, 1, 1)
        else:
            self.conv_in = DCDownBlock2d(3, CH[0], punsh, shortcut=False)
        stages = []
        for i, n in enumerate(layers):
            ops = [_block(TYPES[i], CH[i], MS[i]) for _ in range(n)]
            if i < len(layers) - 1:
                ops.append(DCDownBlock2d(CH[i], CH[i + 1], punsh, shortcut=True))
            stages.append(nn.Sequential(*ops))
        self.down_blocks = nn.ModuleList(stages)
        self.conv_out = nn.Conv2d(CH[-1], 4, 3, 1, 1)

    def forward(self, x):
        x = self.conv_in(x)
        for st in self.down_blocks:
            x = st(x)
        s = x.unflatten(1, (-1, CH[-1] // 4)).mean(dim=2)
        return self.conv_out(x) + s


class Decoder(nn.Module):
    def __init__(self, layers, up_type="interpolate", deep_first=False):
        super().__init__()
        interp = up_type == "interpolate"
        self.conv_in = nn.Conv2d(4, CH[-1], 3, 1, 1)
        stages = []
        for i, n in enumerate(layers):
            ops = []
            if i < len(layers) - 1:
                ops.append(DCUpBlock2d(CH[i + 1], CH[i], interp, shortcut=True))
            ops += [_block(TYPES[i], CH[i], MS[i]) for _ in range(n)]
            stages.append(nn.Sequential(*ops))
        self.deep_first = deep_first
        if deep_first:
            stages = stages[::-1]
        self.up_blocks = nn.ModuleList(stages)
        self.norm_out = RMSNormCL(CH[0])
        self.layers0 = layers[0]
        if layers[0] > 0:
            self.conv_out = nn.Conv2d(CH[0], 3, 3, 1, 1)
        else:
            self.conv_out = DCUpBlock2d(CH[0], 3, interp, shortcut=False)

    def forward(self, z):
        x = self.conv_in(z) + z.repeat_interleave(CH[-1] // 4, dim=1)
        order = self.up_blocks if self.deep_first else reversed(self.up_blocks)
        for st in order:
            x = st(x)
        x = self.norm_out(x.movedim(1, -1)).movedim(-1, 1)
        x = F.relu(x)
        return self.conv_out(x)


class AutoencoderDC(nn.Module):
    def __init__(self, layers, down_type="conv", up_type="interpolate", deep_first=False):
        super().__init__()
        self.encoder = Encoder(layers, down_type)
        self.decoder = Decoder(layers, up_type, deep_first)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).uniform_(-0.2, 0.2, generator=g))
    return model


@pytest.mark.parametrize("layers,down_type,up_type,deep_first,size", [
    ([1, 1, 1], "conv", "interpolate", False, 32),
    ([1, 1, 1], "conv", "interpolate", True, 32),
    ([1, 1, 1], "pixel_unshuffle", "pixel_shuffle", False, 32),
    ([0, 1, 1], "conv", "interpolate", False, 32),
    ([0, 1, 1], "pixel_unshuffle", "pixel_shuffle", True, 32),
    ([1, 1, 1], "conv", "interpolate", False, 8),  # quadratic attention branch
])
def test_dcae_roundtrip_parity(layers, down_type, up_type, deep_first, size):
    torch.manual_seed(0)
    model = _randomize(AutoencoderDC(layers, down_type, up_type, deep_first), 1).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, cfg = convert_dcae(sd, attention_head_dim=HEAD_DIM)
    params = jax.tree.map(jnp.asarray, params)

    x = torch.rand(2, 3, size, size, generator=torch.Generator().manual_seed(2)) * 2 - 1
    with torch.no_grad():
        z_t = model.encoder(x)
        y_t = model.decoder(z_t)

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    z_j = dcae_encode(params, cfg, xj)
    y_j = dcae_decode(params, cfg, z_j)

    np.testing.assert_allclose(
        np.transpose(np.asarray(z_j), (0, 3, 1, 2)), z_t.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(y_j), (0, 3, 1, 2)), y_t.numpy(), atol=3e-4
    )


def test_exec_order_detection():
    torch.manual_seed(0)
    for deep_first in (False, True):
        model = AutoencoderDC([1, 1, 1], deep_first=deep_first)
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        _, cfg = convert_dcae(sd, attention_head_dim=HEAD_DIM)
        assert cfg.exec_order() == ((0, 1, 2) if deep_first else (2, 1, 0))
