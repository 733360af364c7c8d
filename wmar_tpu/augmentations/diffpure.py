"""DiffPure adversarial purification: ADM UNet + DDPM noise/denoise loop.

Counterpart of the reference's wrapper over ``deps/saberi_wmr``
(``wmar/augmentations/diffpure.py`` + ``utils.py:563-645``): forward-noise
the image to step ``t* = steps * T`` with the DDPM schedule, then run the
reverse ``p_sample`` chain back to 0 with OpenAI's 256x256 unconditional
ImageNet diffusion model (ADM UNet: scale-shift GroupNorm ResBlocks,
attention at 32/16/8, resblock up/down, learned-range variance).

The UNet is a Flax port (weights convertible from
``256x256_diffusion_uncond.pt``); the reverse chain is a single
`lax.fori_loop` — the reference instead runs a Python loop of CUDA kernels
per purification (``utils.py:591-645``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ADMConfig:
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 256
    out_channels: int = 6  # learn_sigma
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    num_head_channels: int = 64
    resblock_updown: bool = True
    use_scale_shift_norm: bool = True
    diffusion_steps: int = 1000


GUIDED_DIFFUSION_256_UNCOND = ADMConfig()


def _norm():
    return nn.GroupNorm(num_groups=32, epsilon=1e-5)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ADMResBlock(nn.Module):
    out_ch: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = nn.swish(_norm()(x))

        def resample(z):
            b, hh, ww, c = z.shape
            if self.up:
                return jax.image.resize(z, (b, hh * 2, ww * 2, c), "nearest")
            if self.down:
                return nn.avg_pool(z, (2, 2), strides=(2, 2))
            return z

        h = resample(h)
        x = resample(x)
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(h)
        emb_out = nn.Dense(2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
                           name="emb")(nn.swish(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = _norm()(h) * (1 + scale) + shift
            h = nn.swish(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = nn.swish(_norm()(h))
        h = nn.Conv(self.out_ch, (3, 3), kernel_init=nn.initializers.zeros, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class ADMAttention(nn.Module):
    num_head_channels: int

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = max(1, c // self.num_head_channels)
        hn = _norm()(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, name="qkv")(hn).reshape(b, hh * ww, 3, heads, c // heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (c // heads) ** -0.5
        a = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, hh * ww, c)
        out = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(b, hh, ww, c)


class ADMUNet(nn.Module):
    cfg: ADMConfig

    @nn.compact
    def __call__(self, x, t):
        cfg = self.cfg
        emb = timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(4 * cfg.model_channels, name="time1")(emb)
        emb = nn.Dense(4 * cfg.model_channels, name="time2")(nn.swish(emb))

        ds = 1
        h = nn.Conv(cfg.model_channels, (3, 3), name="conv_in")(x)
        skips = [h]
        # down
        for li, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for bi in range(cfg.num_res_blocks):
                h = ADMResBlock(ch, cfg.use_scale_shift_norm, name=f"down_{li}_{bi}")(h, emb)
                if cfg.image_size // ds in cfg.attention_resolutions:
                    h = ADMAttention(cfg.num_head_channels, name=f"down_attn_{li}_{bi}")(h)
                skips.append(h)
            if li != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = ADMResBlock(ch, cfg.use_scale_shift_norm, down=True, name=f"down_{li}_ds")(h, emb)
                else:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"down_{li}_ds")(h)
                ds *= 2
                skips.append(h)
        # middle
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ADMResBlock(ch, cfg.use_scale_shift_norm, name="mid_1")(h, emb)
        h = ADMAttention(cfg.num_head_channels, name="mid_attn")(h)
        h = ADMResBlock(ch, cfg.use_scale_shift_norm, name="mid_2")(h, emb)
        # up
        for li, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = cfg.model_channels * mult
            for bi in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ADMResBlock(ch, cfg.use_scale_shift_norm, name=f"up_{li}_{bi}")(h, emb)
                if cfg.image_size // ds in cfg.attention_resolutions:
                    h = ADMAttention(cfg.num_head_channels, name=f"up_attn_{li}_{bi}")(h)
            if li != 0:
                if cfg.resblock_updown:
                    h = ADMResBlock(ch, cfg.use_scale_shift_norm, up=True, name=f"up_{li}_us")(h, emb)
                else:
                    b, hh, ww, c = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                    h = nn.Conv(ch, (3, 3), name=f"up_{li}_us")(h)
                ds //= 2
        h = nn.swish(_norm()(h))
        return nn.Conv(cfg.out_channels, (3, 3), kernel_init=nn.initializers.zeros, name="conv_out")(h)


# ---------------------------------------------------------------------------
# DDPM schedule + purification
# ---------------------------------------------------------------------------


def linear_betas(n: int) -> np.ndarray:
    scale = 1000.0 / n
    return np.linspace(scale * 1e-4, scale * 0.02, n, dtype=np.float64)


class DiffPure:
    """steps in (0, 1]: noise to t* = steps * T, then denoise back.

    Input/output NHWC in [0, 1] (the reference converts to [-1, 1] around
    the purifier, ``diffpure.py:15-39``).
    """

    def __init__(self, unet: ADMUNet, params, steps: float = 0.1):
        self.unet = unet
        self.params = params
        self.cfg = unet.cfg
        betas = linear_betas(self.cfg.diffusion_steps)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(np.cumprod(alphas))
        self.betas = jnp.asarray(betas)
        self.alphas = jnp.asarray(alphas)
        self.default_steps = steps

    def _eps(self, params, x, t):
        out = self.unet.apply(params, x, t)
        return out[..., : self.cfg.in_channels]  # drop learned variance

    def __call__(self, imgs01: jnp.ndarray, steps_override: float = None, rng=None) -> jnp.ndarray:
        steps = steps_override if steps_override is not None else self.default_steps
        t_star = max(1, int(steps * self.cfg.diffusion_steps))
        rng = jax.random.PRNGKey(0) if rng is None else rng
        x = imgs01 * 2.0 - 1.0

        # forward noise to t*
        a_bar = self.alphas_cumprod[t_star - 1]
        k_noise, k_loop = jax.random.split(rng)
        x = jnp.sqrt(a_bar) * x + jnp.sqrt(1 - a_bar) * jax.random.normal(k_noise, x.shape)

        params = self.params

        def body(i, x):
            t = t_star - 1 - i
            tb = jnp.full((x.shape[0],), t, jnp.int32)
            eps = self._eps(params, x, tb)
            a_t = self.alphas[t]
            ab_t = self.alphas_cumprod[t]
            coef = (1 - a_t) / jnp.sqrt(1 - ab_t)
            mean = (x - coef * eps) / jnp.sqrt(a_t)
            noise = jax.random.normal(jax.random.fold_in(k_loop, i), x.shape)
            sigma = jnp.sqrt(self.betas[t])
            return mean + jnp.where(t > 0, sigma, 0.0) * noise

        x = jax.lax.fori_loop(0, t_star, body, x)
        return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Checkpoint conversion (guided-diffusion ``256x256_diffusion_uncond.pt``)
# ---------------------------------------------------------------------------


def _adm_lin(sd, p):
    return {"kernel": np.ascontiguousarray(sd[p + ".weight"].T), "bias": np.asarray(sd[p + ".bias"])}


def _adm_conv(sd, p):
    return {
        "kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0))),
        "bias": np.asarray(sd[p + ".bias"]),
    }


def _adm_gn(sd, p):
    return {"scale": np.asarray(sd[p + ".weight"]), "bias": np.asarray(sd[p + ".bias"])}


def _adm_resblock(sd, p):
    """guided-diffusion ResBlock: in_layers.[0 norm, 2 conv], emb_layers.1,
    out_layers.[0 norm, 3 conv], optional skip_connection (unet.py ResBlock)."""
    out = {
        "GroupNorm_0": _adm_gn(sd, p + ".in_layers.0"),
        "conv1": _adm_conv(sd, p + ".in_layers.2"),
        "emb": _adm_lin(sd, p + ".emb_layers.1"),
        "GroupNorm_1": _adm_gn(sd, p + ".out_layers.0"),
        "conv2": _adm_conv(sd, p + ".out_layers.3"),
    }
    if p + ".skip_connection.weight" in sd:
        out["skip"] = _adm_conv(sd, p + ".skip_connection")
    return out


def _adm_attention(sd, p, num_head_channels):
    """AttentionBlock with QKVAttentionLegacy head layout.

    Legacy qkv channels are [head-major][q,k,v][head_dim]; our Dense expects
    [q,k,v][head-major][head_dim] — permute rows accordingly. The 1x1 conv1d
    weights [3C, C, 1] become Dense kernels [C, 3C].
    """
    w = np.asarray(sd[p + ".qkv.weight"])[:, :, 0]  # [3C, C]
    b = np.asarray(sd[p + ".qkv.bias"])
    c = w.shape[1]
    heads = max(1, c // num_head_channels)
    hd = c // heads
    w = w.reshape(heads, 3, hd, c).transpose(1, 0, 2, 3).reshape(3 * c, c)
    b = b.reshape(heads, 3, hd).transpose(1, 0, 2).reshape(3 * c)
    proj = np.asarray(sd[p + ".proj_out.weight"])[:, :, 0]
    return {
        "GroupNorm_0": _adm_gn(sd, p + ".norm"),
        "qkv": {"kernel": np.ascontiguousarray(w.T), "bias": b},
        "proj": {"kernel": np.ascontiguousarray(proj.T), "bias": np.asarray(sd[p + ".proj_out.bias"])},
    }


def convert_adm_unet(sd, cfg: ADMConfig) -> dict:
    """``256x256_diffusion_uncond.pt`` layout -> ADMUNet flax variables.

    Mirrors guided_diffusion/unet.py UNetModel construction: input_blocks.0
    is conv_in; each level appends num_res_blocks TimestepEmbedSequentials
    (ResBlock [+ Attention]) and, except the last level, a downsample block;
    output_blocks hold ResBlock [+ Attention] [+ upsample ResBlock as the
    trailing submodule of the level's last block].
    """
    params = {
        "time1": _adm_lin(sd, "time_embed.0"),
        "time2": _adm_lin(sd, "time_embed.2"),
        "conv_in": _adm_conv(sd, "input_blocks.0.0"),
        "GroupNorm_0": _adm_gn(sd, "out.0"),
        "conv_out": _adm_conv(sd, "out.2"),
        "mid_1": _adm_resblock(sd, "middle_block.0"),
        "mid_attn": _adm_attention(sd, "middle_block.1", cfg.num_head_channels),
        "mid_2": _adm_resblock(sd, "middle_block.2"),
    }
    nlev = len(cfg.channel_mult)
    ds = 1
    n = 1
    for li in range(nlev):
        for bi in range(cfg.num_res_blocks):
            params[f"down_{li}_{bi}"] = _adm_resblock(sd, f"input_blocks.{n}.0")
            if cfg.image_size // ds in cfg.attention_resolutions:
                params[f"down_attn_{li}_{bi}"] = _adm_attention(
                    sd, f"input_blocks.{n}.1", cfg.num_head_channels
                )
            n += 1
        if li != nlev - 1:
            params[f"down_{li}_ds"] = _adm_resblock(sd, f"input_blocks.{n}.0")
            n += 1
            ds *= 2
    n = 0
    for li in reversed(range(nlev)):
        for bi in range(cfg.num_res_blocks + 1):
            params[f"up_{li}_{bi}"] = _adm_resblock(sd, f"output_blocks.{n}.0")
            j = 1
            if cfg.image_size // ds in cfg.attention_resolutions:
                params[f"up_attn_{li}_{bi}"] = _adm_attention(
                    sd, f"output_blocks.{n}.1", cfg.num_head_channels
                )
                j = 2
            if li != 0 and bi == cfg.num_res_blocks:
                params[f"up_{li}_us"] = _adm_resblock(sd, f"output_blocks.{n}.{j}")
                ds //= 2
            n += 1
    return {"params": params}
