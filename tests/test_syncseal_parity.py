"""Torch-oracle parity for the exact SyncSeal backbones.

Oracles re-state syncseal's modules at tiny dims with the released naming:
UNet embedder (modules/unet.py + common.py Upsample), ConvNeXtV2 + Head
extractor (modules/convnext.py, head.py), NLayerDiscriminator
(modules/discriminator.py with GroupNorm(4) and use_bias=True).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wmar_tpu.sync import syncseal_models as sm


class ChannelsFirstLN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class ResnetBlock(nn.Module):
    def __init__(self, i, o, groups):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(i, o, 3, padding=1, bias=False), nn.GroupNorm(groups, o), nn.GELU(),
            nn.Conv2d(o, o, 3, padding=1, bias=False), nn.GroupNorm(groups, o), nn.GELU(),
        )
        self.res_conv = nn.Conv2d(i, o, 1)

    def forward(self, x):
        return self.double_conv(x) + self.res_conv(x)


class PDUp(nn.Module):
    """common.py Upsample('bilinear', ...)"""

    def __init__(self, i, o):
        super().__init__()
        self.upsample_block = nn.Sequential(
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            nn.ReflectionPad2d(1),
            nn.Conv2d(i, o, 3, bias=False),
            ChannelsFirstLN(o),
            nn.GELU(),
        )

    def forward(self, x):
        return self.upsample_block(x)


class TorchUNet(nn.Module):
    def __init__(self, cfg: sm.UNetConfig):
        super().__init__()
        g = cfg.norm_groups
        z = [cfg.z_channels * m for m in cfg.z_channels_mults]
        self.inc = ResnetBlock(cfg.in_channels, z[0], g)
        self.downs = nn.ModuleList()
        for i in range(len(z) - 1):
            d = nn.Module()
            d.down = nn.Conv2d(z[i], z[i + 1], 3, stride=2, padding=1)
            d.conv = ResnetBlock(z[i + 1], z[i + 1], g)
            self.downs.append(d)
        bn = nn.Module()
        bn.model = nn.Sequential(*[ResnetBlock(z[-1], z[-1], g) for _ in range(cfg.num_blocks)])
        self.bottleneck = bn
        self.ups = nn.ModuleList()
        for i in reversed(range(len(z) - 1)):
            u = nn.Module()
            u.up = PDUp(2 * z[i + 1], z[i])
            u.conv = ResnetBlock(z[i], z[i], g)
            self.ups.append(u)
        self.outc = nn.Conv2d(z[0], cfg.out_channels, 1)

    def forward(self, x):
        h = self.inc(x)
        hiddens = [h]
        for d in self.downs:
            hiddens.append(d.conv(d.down(hiddens[-1])))
        x = self.bottleneck.model(hiddens[-1])
        for u in self.ups:
            skip = hiddens.pop()
            x = torch.cat((x, skip * 2**-0.5), dim=1)
            x = u.conv(u.up(x))
        return torch.tanh(self.outc(x))


class GRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(1, 1, 1, dim))
        self.beta = nn.Parameter(torch.zeros(1, 1, 1, dim))

    def forward(self, x):
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class CNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.grn = GRN(4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        inp = x
        x = self.dwconv(x).permute(0, 2, 3, 1)
        x = self.pwconv2(self.grn(F.gelu(self.pwconv1(self.norm(x)))))
        return inp + x.permute(0, 3, 1, 2)


class TorchConvNeXt(nn.Module):
    def __init__(self, cfg: sm.ConvNeXtConfig):
        super().__init__()
        cn = nn.Module()
        cn.downsample_layers = nn.ModuleList()
        cn.downsample_layers.append(nn.Sequential(
            nn.Conv2d(3, cfg.dims[0], 4, stride=4), ChannelsFirstLN(cfg.dims[0])
        ))
        for i in range(len(cfg.dims) - 1):
            cn.downsample_layers.append(nn.Sequential(
                ChannelsFirstLN(cfg.dims[i]), nn.Conv2d(cfg.dims[i], cfg.dims[i + 1], 2, stride=2)
            ))
        cn.stages = nn.ModuleList(
            [nn.Sequential(*[CNBlock(cfg.dims[i]) for _ in range(cfg.depths[i])])
             for i in range(len(cfg.dims))]
        )
        self.convnext = cn
        hd = nn.Module()
        hd.linear = nn.Linear(cfg.dims[-1], 1 + cfg.out_dim)
        self.head = hd

    def forward(self, x):
        for down, stage in zip(self.convnext.downsample_layers, self.convnext.stages):
            x = stage(down(x))
        return self.head.linear(x.mean(dim=[-2, -1]))


class TorchDiscriminator(nn.Module):
    def __init__(self, input_nc=3, ndf=8, n_layers=3):
        super().__init__()
        norm = lambda c: nn.GroupNorm(4, c)
        seq = [nn.Conv2d(input_nc, ndf, 4, stride=2, padding=1), nn.LeakyReLU(0.2, True)]
        nf, nf_prev = 1, 1
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(2**n, 8)
            seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, stride=2, padding=1, bias=True),
                    norm(ndf * nf), nn.LeakyReLU(0.2, True)]
        nf_prev, nf = nf, min(2**n_layers, 8)
        seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, stride=1, padding=1, bias=True),
                norm(ndf * nf), nn.LeakyReLU(0.2, True)]
        seq += [nn.Conv2d(ndf * nf, 1, 4, stride=1, padding=1)]
        self.main = nn.Sequential(*seq)

    def forward(self, x):
        return self.main(x)


TINY_UNET = sm.UNetConfig(in_channels=1, out_channels=1, z_channels=8,
                          num_blocks=2, z_channels_mults=(1, 2), norm_groups=4)
TINY_CN = sm.ConvNeXtConfig(depths=(1, 1), dims=(8, 16), out_dim=8)


def test_unet_parity():
    torch.manual_seed(0)
    model = TorchUNet(TINY_UNET).eval()
    x = torch.randn(2, 1, 32, 32)
    with torch.no_grad():
        ref = model(x)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, sm.convert_unet(sd, TINY_UNET))
    out = sm.unet_forward(params, TINY_UNET, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref.numpy(), atol=2e-4)


def test_convnext_parity():
    torch.manual_seed(1)
    model = TorchConvNeXt(TINY_CN).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = model(x)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, sm.convert_convnext(sd, TINY_CN))
    out = sm.convnext_forward(params, TINY_CN, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-4)


def test_discriminator_parity():
    torch.manual_seed(2)
    model = TorchDiscriminator(ndf=8, n_layers=3).eval()
    x = torch.rand(2, 3, 32, 32)
    with torch.no_grad():
        ref = model(x)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(
        lambda a: a if isinstance(a, int) else jnp.asarray(a),
        sm.convert_discriminator(sd, n_layers=3),
    )
    out = sm.discriminator_forward(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref.numpy(), atol=1e-4)


def test_init_shapes_match_converted():
    torch.manual_seed(3)
    for ctor, conv, init in [
        (lambda: TorchUNet(TINY_UNET), lambda sd: sm.convert_unet(sd, TINY_UNET),
         lambda: sm.init_unet_params(0, TINY_UNET)),
        (lambda: TorchConvNeXt(TINY_CN), lambda sd: sm.convert_convnext(sd, TINY_CN),
         lambda: sm.init_convnext_params(0, TINY_CN)),
        (lambda: TorchDiscriminator(ndf=8),
         lambda sd: sm.convert_discriminator(sd),
         lambda: sm.init_discriminator_params(0, ndf=8)),
    ]:
        sd = {k: v.detach().numpy() for k, v in ctor().state_dict().items()}
        converted = conv(sd)
        inited = init()
        cs = jax.tree.map(lambda a: np.shape(a) if hasattr(a, "shape") else a, converted)
        is_ = jax.tree.map(lambda a: np.shape(a) if hasattr(a, "shape") else a, inited)
        assert cs == is_


def test_hinge_loss():
    real = jnp.asarray([2.0, 0.5])
    fake = jnp.asarray([-2.0, 0.5])
    # relu(1-2)+relu(1-0.5) = 0.5 avg 0.25 ; relu(1-2)+relu(1.5) = 1.5 avg 0.75
    assert float(sm.hinge_d_loss(real, fake)) == pytest.approx(0.5 * (0.25 + 0.75))
