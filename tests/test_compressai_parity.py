"""Torch-oracle parity tests for the compressai-exact JAX codecs.

The oracle below is a tiny-dimension torch re-statement of compressai's
inference math (entropy_models.py GDN/EntropyBottleneck/GaussianConditional,
models/google.py + waseda.py architectures, layers/layers.py blocks) with the
same state-dict naming as the zoo checkpoints — so these tests exercise both
the forward math and ``convert_compressai`` on the real layout.
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

from wmar_tpu.augmentations import compressai_jax as cj

# ---------------------------------------------------------------------------
# torch oracle (compressai semantics, tiny dims)
# ---------------------------------------------------------------------------


def conv(i, o, k=5, s=2):
    return nn.Conv2d(i, o, k, stride=s, padding=k // 2)


def deconv(i, o, k=5, s=2):
    return nn.ConvTranspose2d(i, o, k, stride=s, output_padding=s - 1, padding=k // 2)


def conv3x3(i, o, s=1):
    return nn.Conv2d(i, o, 3, stride=s, padding=1)


def conv1x1(i, o, s=1):
    return nn.Conv2d(i, o, 1, stride=s)


def subpel_conv3x3(i, o, r):
    return nn.Sequential(nn.Conv2d(i, o * r * r, 3, padding=1), nn.PixelShuffle(r))


PEDESTAL = float(2**-18) ** 2


class NonNegativeParametrizer(nn.Module):
    def __init__(self, minimum=0.0):
        super().__init__()
        self.bound = (minimum + PEDESTAL) ** 0.5

    def init(self, x):
        return torch.sqrt(torch.clamp(x + PEDESTAL, min=PEDESTAL))

    def forward(self, x):
        return torch.clamp(x, min=self.bound) ** 2 - PEDESTAL


class GDN(nn.Module):
    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta_reparam = NonNegativeParametrizer(minimum=1e-6)
        self.beta = nn.Parameter(self.beta_reparam.init(torch.ones(ch)))
        self.gamma_reparam = NonNegativeParametrizer()
        self.gamma = nn.Parameter(self.gamma_reparam.init(0.1 * torch.eye(ch)))

    def forward(self, x):
        c = x.size(1)
        beta = self.beta_reparam(self.beta)
        gamma = self.gamma_reparam(self.gamma).reshape(c, c, 1, 1)
        norm = F.conv2d(x**2, gamma, beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


class EntropyBottleneck(nn.Module):
    def __init__(self, channels, filters=(3, 3, 3, 3), init_scale=10.0):
        super().__init__()
        self.filters = tuple(filters)
        fs = (1,) + self.filters + (1,)
        scale = init_scale ** (1 / (len(self.filters) + 1))
        for i in range(len(self.filters) + 1):
            init = math.log(math.expm1(1 / scale / fs[i + 1]))
            m = torch.full((channels, fs[i + 1], fs[i]), init)
            self.register_parameter(f"_matrix{i}", nn.Parameter(m + 0.05 * torch.randn_like(m)))
            b = torch.empty(channels, fs[i + 1], 1).uniform_(-0.5, 0.5)
            self.register_parameter(f"_bias{i}", nn.Parameter(b))
            if i < len(self.filters):
                f_ = 0.05 * torch.randn(channels, fs[i + 1], 1)
                self.register_parameter(f"_factor{i}", nn.Parameter(f_))
        q = torch.tensor([[[-init_scale, 0.0, init_scale]]]).repeat(channels, 1, 1)
        self.quantiles = nn.Parameter(q + 0.1 * torch.randn_like(q))

    def _logits_cumulative(self, inputs):
        logits = inputs
        for i in range(len(self.filters) + 1):
            logits = torch.matmul(F.softplus(getattr(self, f"_matrix{i}")), logits)
            logits = logits + getattr(self, f"_bias{i}")
            if i < len(self.filters):
                logits = logits + torch.tanh(getattr(self, f"_factor{i}")) * torch.tanh(logits)
        return logits

    def forward(self, z):
        medians = self.quantiles[:, :, 1:2]  # [C,1,1]
        b, c, h, w = z.shape
        v = z.permute(1, 0, 2, 3).reshape(c, 1, -1)
        v_hat = torch.round(v - medians) + medians
        lower = self._logits_cumulative(v_hat - 0.5)
        upper = self._logits_cumulative(v_hat + 0.5)
        sign = -torch.sign(lower + upper).detach()
        lik = torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))
        lik = torch.clamp(lik, min=1e-9)
        z_hat = v_hat.reshape(c, b, h, w).permute(1, 0, 2, 3)
        return z_hat, lik.reshape(c, b, h, w).permute(1, 0, 2, 3)


class GaussianConditional(nn.Module):
    scale_bound = 0.11

    def forward(self, y, scales, means=None):
        y_hat = torch.round(y - means) + means if means is not None else torch.round(y)
        scales = torch.clamp(scales, min=self.scale_bound)
        values = torch.abs((y if means is None else y) - (means if means is not None else 0.0))
        # likelihood is evaluated on the *inputs* for joint models and on the
        # quantized values for the others; compressai passes `inputs` for
        # mbt2018/cheng and `y_hat` implicitly equals round there. For the
        # mean-scale models it quantizes first. We follow each model below.
        upper = self._cdf((0.5 - values) / scales)
        lower = self._cdf((-0.5 - values) / scales)
        return y_hat, torch.clamp(upper - lower, min=1e-9)

    @staticmethod
    def _cdf(x):
        return 0.5 * torch.erfc(-(2**-0.5) * x)


class MaskedConv2d(nn.Conv2d):
    def __init__(self, i, o, k, padding):
        super().__init__(i, o, k, padding=padding)
        self.register_buffer("mask", torch.ones_like(self.weight))
        _, _, kh, kw = self.weight.shape
        self.mask[:, :, kh // 2, kw // 2 :] = 0
        self.mask[:, :, kh // 2 + 1 :, :] = 0

    def forward(self, x):
        self.weight.data *= self.mask
        return super().forward(x)


def bpp_of(liks, num_pixels):
    return sum(torch.log(l).sum() / (-math.log(2) * num_pixels) for l in liks).item()


class FactorizedPrior(nn.Module):
    def __init__(self, N, M):
        super().__init__()
        self.g_a = nn.Sequential(
            conv(3, N), GDN(N), conv(N, N), GDN(N), conv(N, N), GDN(N), conv(N, M)
        )
        self.g_s = nn.Sequential(
            deconv(M, N), GDN(N, True), deconv(N, N), GDN(N, True),
            deconv(N, N), GDN(N, True), deconv(N, 3),
        )
        self.entropy_bottleneck = EntropyBottleneck(M)

    def forward(self, x):
        y = self.g_a(x)
        y_hat, y_lik = self.entropy_bottleneck(y)
        return self.g_s(y_hat), [y_lik]


class ScaleHyperprior(FactorizedPrior):
    def __init__(self, N, M):
        super().__init__(N, M)
        self.entropy_bottleneck = EntropyBottleneck(N)
        self.h_a = nn.Sequential(
            conv(M, N, 3, 1), nn.ReLU(), conv(N, N), nn.ReLU(), conv(N, N)
        )
        self.h_s = nn.Sequential(
            deconv(N, N), nn.ReLU(), deconv(N, N), nn.ReLU(), conv(N, M, 3, 1), nn.ReLU()
        )
        self.gaussian_conditional = GaussianConditional()

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(torch.abs(y))
        z_hat, z_lik = self.entropy_bottleneck(z)
        scales = self.h_s(z_hat)
        y_hat, y_lik = self.gaussian_conditional(y, scales)
        return self.g_s(y_hat), [y_lik, z_lik]


class MeanScaleHyperprior(ScaleHyperprior):
    def __init__(self, N, M):
        super().__init__(N, M)
        self.h_a = nn.Sequential(
            conv(M, N, 3, 1), nn.LeakyReLU(), conv(N, N), nn.LeakyReLU(), conv(N, N)
        )
        self.h_s = nn.Sequential(
            deconv(N, M), nn.LeakyReLU(), deconv(M, M * 3 // 2), nn.LeakyReLU(),
            conv(M * 3 // 2, 2 * M, 3, 1),
        )

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z)
        scales, means = self.h_s(z_hat).chunk(2, 1)
        y_hat, y_lik = self.gaussian_conditional(y, scales, means)
        return self.g_s(y_hat), [y_lik, z_lik]


class JointAutoregressive(MeanScaleHyperprior):
    def __init__(self, N, M):
        super().__init__(N, M)
        self.h_a = nn.Sequential(
            conv(M, N, 3, 1), nn.LeakyReLU(), conv(N, N), nn.LeakyReLU(), conv(N, N)
        )
        self.h_s = nn.Sequential(
            deconv(N, M), nn.LeakyReLU(), deconv(M, M * 3 // 2), nn.LeakyReLU(),
            conv(M * 3 // 2, 2 * M, 3, 1),
        )
        self.entropy_parameters = nn.Sequential(
            conv1x1(M * 4, M * 10 // 3), nn.LeakyReLU(),
            conv1x1(M * 10 // 3, M * 8 // 3), nn.LeakyReLU(),
            conv1x1(M * 8 // 3, M * 2),
        )
        self.context_prediction = MaskedConv2d(M, 2 * M, 5, padding=2)

    def forward(self, x):
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z)
        hyper = self.h_s(z_hat)
        y_hat = torch.round(y)
        ctx = self.context_prediction(y_hat)
        gp = self.entropy_parameters(torch.cat((hyper, ctx), dim=1))
        scales, means = gp.chunk(2, 1)
        _, y_lik = self.gaussian_conditional(y, scales, means)
        return self.g_s(y_hat), [y_lik, z_lik]


class ResidualBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.conv1, self.conv2 = conv3x3(i, o), conv3x3(o, o)
        if i != o:
            self.skip = conv1x1(i, o)

    def forward(self, x):
        out = F.leaky_relu(self.conv2(F.leaky_relu(self.conv1(x))))
        return out + (self.skip(x) if hasattr(self, "skip") else x)


class ResidualBlockWithStride(nn.Module):
    def __init__(self, i, o, stride=2):
        super().__init__()
        self.conv1, self.conv2 = conv3x3(i, o, stride), conv3x3(o, o)
        self.gdn = GDN(o)
        if stride != 1 or i != o:
            self.skip = conv1x1(i, o, stride)

    def forward(self, x):
        out = self.gdn(self.conv2(F.leaky_relu(self.conv1(x))))
        return out + (self.skip(x) if hasattr(self, "skip") else x)


class ResidualBlockUpsample(nn.Module):
    def __init__(self, i, o, r=2):
        super().__init__()
        self.subpel_conv = subpel_conv3x3(i, o, r)
        self.conv = conv3x3(o, o)
        self.igdn = GDN(o, inverse=True)
        self.upsample = subpel_conv3x3(i, o, r)

    def forward(self, x):
        out = self.igdn(self.conv(F.leaky_relu(self.subpel_conv(x))))
        return out + self.upsample(x)


class ResidualUnit(nn.Module):
    def __init__(self, N):
        super().__init__()
        self.conv = nn.Sequential(
            conv1x1(N, N // 2), nn.ReLU(), conv3x3(N // 2, N // 2), nn.ReLU(),
            conv1x1(N // 2, N),
        )

    def forward(self, x):
        return F.relu(x + self.conv(x))


class AttentionBlock(nn.Module):
    def __init__(self, N):
        super().__init__()
        self.conv_a = nn.Sequential(*[ResidualUnit(N) for _ in range(3)])
        self.conv_b = nn.Sequential(*([ResidualUnit(N) for _ in range(3)] + [conv1x1(N, N)]))

    def forward(self, x):
        return x + self.conv_a(x) * torch.sigmoid(self.conv_b(x))


class Cheng2020Anchor(JointAutoregressive):
    def __init__(self, N):
        super().__init__(N, N)
        self.g_a = nn.Sequential(
            ResidualBlockWithStride(3, N), ResidualBlock(N, N),
            ResidualBlockWithStride(N, N), ResidualBlock(N, N),
            ResidualBlockWithStride(N, N), ResidualBlock(N, N),
            conv3x3(N, N, 2),
        )
        self.g_s = nn.Sequential(
            ResidualBlock(N, N), ResidualBlockUpsample(N, N),
            ResidualBlock(N, N), ResidualBlockUpsample(N, N),
            ResidualBlock(N, N), ResidualBlockUpsample(N, N),
            ResidualBlock(N, N), subpel_conv3x3(N, 3, 2),
        )
        self.h_a = nn.Sequential(
            conv3x3(N, N), nn.LeakyReLU(), conv3x3(N, N), nn.LeakyReLU(),
            conv3x3(N, N, 2), nn.LeakyReLU(), conv3x3(N, N), nn.LeakyReLU(),
            conv3x3(N, N, 2),
        )
        self.h_s = nn.Sequential(
            conv3x3(N, N), nn.LeakyReLU(), subpel_conv3x3(N, N, 2), nn.LeakyReLU(),
            conv3x3(N, N * 3 // 2), nn.LeakyReLU(),
            subpel_conv3x3(N * 3 // 2, N * 3 // 2, 2), nn.LeakyReLU(),
            conv3x3(N * 3 // 2, N * 2),
        )


class Cheng2020Attention(Cheng2020Anchor):
    def __init__(self, N):
        super().__init__(N)
        self.g_a = nn.Sequential(
            ResidualBlockWithStride(3, N), ResidualBlock(N, N),
            ResidualBlockWithStride(N, N), AttentionBlock(N),
            ResidualBlock(N, N), ResidualBlockWithStride(N, N),
            ResidualBlock(N, N), conv3x3(N, N, 2), AttentionBlock(N),
        )
        self.g_s = nn.Sequential(
            AttentionBlock(N), ResidualBlock(N, N),
            ResidualBlockUpsample(N, N), ResidualBlock(N, N),
            ResidualBlockUpsample(N, N), AttentionBlock(N),
            ResidualBlock(N, N), ResidualBlockUpsample(N, N),
            ResidualBlock(N, N), subpel_conv3x3(N, 3, 2),
        )


# ---------------------------------------------------------------------------
# parity checks
# ---------------------------------------------------------------------------


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _run_both(model, arch, atol=2e-4):
    torch.manual_seed(0)
    x_t = torch.rand(2, 3, 64, 64)
    model.eval()
    with torch.no_grad():
        xh_t, liks_t = model(x_t)
        bpp_t = bpp_of(liks_t, 2 * 64 * 64)

    params = cj.convert_compressai(_state_dict_np(model), arch)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    xh_j, liks_j = jax.jit(cj.FORWARDS[arch])(jax.tree.map(jnp.asarray, params), x_j)
    bpp_j = float(cj.bpp_from_likelihoods(liks_j, 2 * 64 * 64))

    np.testing.assert_allclose(
        np.transpose(xh_j, (0, 3, 1, 2)), xh_t.numpy(), atol=atol,
        err_msg=f"{arch} reconstruction mismatch",
    )
    assert abs(bpp_j - bpp_t) < 1e-3 * max(1.0, abs(bpp_t)), (bpp_j, bpp_t)


@pytest.mark.parametrize(
    "arch,ctor",
    [
        ("bmshj2018-factorized", lambda: FactorizedPrior(8, 12)),
        ("bmshj2018-hyperprior", lambda: ScaleHyperprior(8, 12)),
        ("mbt2018-mean", lambda: MeanScaleHyperprior(8, 12)),
        ("mbt2018", lambda: JointAutoregressive(8, 12)),
        ("cheng2020-anchor", lambda: Cheng2020Anchor(8)),
        ("cheng2020-attn", lambda: Cheng2020Attention(8)),
    ],
)
def test_codec_parity(arch, ctor):
    torch.manual_seed(42)
    _run_both(ctor(), arch)


def test_deconv_geometry():
    """ConvTranspose2d(k5,s2,p2,op1) == lhs-dilated conv with flipped kernel."""
    torch.manual_seed(1)
    m = deconv(4, 6)
    x_t = torch.randn(1, 4, 8, 8)
    with torch.no_grad():
        y_t = m(x_t)
    sd = {"d.weight": m.weight.detach().numpy(), "d.bias": m.bias.detach().numpy()}
    p = cj._dcv(sd, "d")
    y_j = cj.tdeconv(jax.tree.map(jnp.asarray, p), jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(y_j, (0, 3, 1, 2)), y_t.numpy(), atol=1e-5)
    assert y_j.shape == (1, 16, 16, 6)


def test_gdn_reparam_roundtrip():
    torch.manual_seed(2)
    g = GDN(5)
    with torch.no_grad():
        g.beta.add_(0.3 * torch.rand(5))
        g.gamma.add_(0.05 * torch.rand(5, 5))
    x_t = torch.randn(1, 5, 4, 4)
    with torch.no_grad():
        y_t = g(x_t)
    sd = {"g.beta": g.beta.detach().numpy(), "g.gamma": g.gamma.detach().numpy()}
    p = cj._gdn(sd, "g")
    y_j = cj.gdn(jax.tree.map(jnp.asarray, p), jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(y_j, (0, 3, 1, 2)), y_t.numpy(), atol=1e-5)


def test_entropy_bottleneck_likelihood():
    torch.manual_seed(3)
    eb_t = EntropyBottleneck(6)
    z_t = torch.randn(2, 6, 4, 4) * 3
    with torch.no_grad():
        zh_t, lik_t = eb_t(z_t)
    sd = {k: v.detach().numpy() for k, v in eb_t.state_dict().items()}
    eb_j = cj._eb({f"entropy_bottleneck.{k}": v for k, v in sd.items()})
    zh_j, lik_j = cj.entropy_bottleneck(
        jax.tree.map(jnp.asarray, eb_j), jnp.asarray(z_t.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.transpose(zh_j, (0, 3, 1, 2)), zh_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.transpose(lik_j, (0, 3, 1, 2)), lik_t.numpy(), rtol=1e-4, atol=1e-7
    )
