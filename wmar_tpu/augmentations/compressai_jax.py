"""compressai-exact neural codecs in JAX.

Weight-compatible re-implementations of the six compressai model families the
reference's attack bank loads pretrained (``wmar/augmentations/
neuralcompression.py:93-116``): bmshj2018-factorized, bmshj2018-hyperprior,
mbt2018-mean, mbt2018, cheng2020-anchor, cheng2020-attn.

Everything is eval-mode inference math, bit-faithful to compressai:

* torch conv geometry (kernel k, stride s, padding k//2) via explicit-pad
  ``lax.conv_general_dilated``; ConvTranspose2d(output_padding=s-1) via an
  lhs-dilated conv with spatially flipped kernels (flip done at conversion).
* GDN with the NonNegativeParametrizer de-reparameterized at conversion
  (``beta = lb(beta_r)**2 - pedestal``), forward ``x * rsqrt(x² @ γᵀ + β)``.
* The factorized EntropyBottleneck likelihood evaluated from the checkpoint's
  ``_matrix{i}/_bias{i}/_factor{i}`` parameters and ``quantiles`` medians —
  so bpp is the reference's exact ``-log2(likelihood)/num_pixels`` rate, not
  an approximation.
* GaussianConditional likelihood with the 0.11 scale lower bound and
  ``0.5*erfc(-x/sqrt(2))`` standardized cumulative.
* mbt2018/cheng2020 context models as a single masked-conv pass over the
  already-quantized latents (sequentiality is only needed for actual range
  decoding, not for the forward likelihood).

Params are plain pytrees (converted host-side by ``convert_compressai``);
forward passes are pure functions, jittable end to end.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")

# quality -> (N, M) tables, compressai.zoo.image cfgs
_QUALITY_CFG = {
    "bmshj2018-factorized": lambda q: (128, 192) if q < 6 else (192, 320),
    "bmshj2018-hyperprior": lambda q: (128, 192) if q < 6 else (192, 320),
    "mbt2018-mean": lambda q: (128, 192) if q < 5 else (192, 320),
    "mbt2018": lambda q: (192, 192) if q < 5 else (192, 320),
    "cheng2020-anchor": lambda q: (128, 128) if q < 4 else (192, 192),
    "cheng2020-attn": lambda q: (128, 128) if q < 4 else (192, 192),
}


def quality_nm(arch: str, quality: int) -> Tuple[int, int]:
    return _QUALITY_CFG[arch](quality)


# ---------------------------------------------------------------------------
# torch-geometry primitives
# ---------------------------------------------------------------------------


def st_round(x):
    """Straight-through round (compressai eval quantization, grads kept)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def tconv(p: dict, x, stride: int = 1):
    """torch Conv2d(k, stride, padding=k//2). kernel: [kh,kw,I,O]."""
    k = p["kernel"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=DN
    )
    return y + p["bias"] if "bias" in p else y


def tdeconv(p: dict, x, stride: int = 2):
    """torch ConvTranspose2d(k, stride, padding=k//2, output_padding=stride-1).

    The converter stores the kernel spatially flipped with I/O transposed so
    this is a plain lhs-dilated conv: pad (k-1-p, k-1-p+op) per side.
    """
    k = p["kernel"].shape[0]
    pd = k // 2
    lo, hi = k - 1 - pd, k - 1 - pd + (stride - 1)
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), ((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride), dimension_numbers=DN,
    )
    return y + p["bias"] if "bias" in p else y


def gdn(p: dict, x, inverse: bool = False):
    """compressai GDN forward on de-reparameterized beta/gamma.

    norm = conv1x1(x², γ, β); out = x * (sqrt(norm) if inverse else rsqrt).
    ``gamma_t`` is γ transposed to [C_in, C_out] for NHWC matmul.
    """
    norm = (x * x) @ p["gamma_t"] + p["beta"]
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


def pixel_shuffle(x, r: int):
    """torch PixelShuffle channel ordering on NHWC input [B,H,W,C*r*r]."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def subpel_conv(p: dict, x, r: int = 2):
    """conv3x3(in, out*r^2) + PixelShuffle(r)."""
    return pixel_shuffle(tconv(p, x, 1), r)


def leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


# ---------------------------------------------------------------------------
# Entropy models (exact likelihoods)
# ---------------------------------------------------------------------------

LIKELIHOOD_BOUND = 1e-9
SCALE_BOUND = 0.11


def eb_medians(eb: dict) -> jnp.ndarray:
    """quantiles[:, 0, 1] — the per-channel medians used for quantization."""
    return eb["quantiles"][:, 0, 1]


def _eb_logits_cumulative(eb: dict, v: jnp.ndarray) -> jnp.ndarray:
    """v: [C, 1, L] -> logits [C, 1, L] (entropy_models.py _logits_cumulative)."""
    logits = v
    n = len(eb["matrices"])
    for i in range(n):
        m = jax.nn.softplus(eb["matrices"][i])  # [C, d_out, d_in]
        logits = jnp.einsum("cij,cjl->cil", m, logits) + eb["biases"][i]
        if i < n - 1:
            logits = logits + jnp.tanh(eb["factors"][i]) * jnp.tanh(logits)
    return logits


def entropy_bottleneck(eb: dict, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode EntropyBottleneck: z [B,H,W,C] -> (z_hat, likelihood)."""
    medians = eb_medians(eb)
    z_hat = st_round(z - medians) + medians
    b, h, w, c = z.shape
    v = z_hat.transpose(3, 0, 1, 2).reshape(c, 1, -1)
    lower = _eb_logits_cumulative(eb, v - 0.5)
    upper = _eb_logits_cumulative(eb, v + 0.5)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    lik = jnp.maximum(lik, LIKELIHOOD_BOUND)
    lik = lik.reshape(c, b, h, w).transpose(1, 2, 3, 0)
    return z_hat, lik


def _std_cumulative(x):
    return 0.5 * jax.scipy.special.erfc(-(2**-0.5) * x)


def gaussian_likelihood(y_hat, scales, means=None):
    """GaussianConditional likelihood of the quantized values."""
    scales = jnp.maximum(scales, SCALE_BOUND)
    values = y_hat - means if means is not None else y_hat
    values = jnp.abs(values)
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    return jnp.maximum(upper - lower, LIKELIHOOD_BOUND)


def bpp_from_likelihoods(liks: List[jnp.ndarray], num_pixels: int) -> jnp.ndarray:
    """Reference bpp (neuralcompression.py:66-71): batch-total bits/pixel."""
    return sum(-jnp.log2(l).sum() for l in liks) / num_pixels


# ---------------------------------------------------------------------------
# bmshj2018 / mbt2018 transforms (conv+GDN stacks)
# ---------------------------------------------------------------------------


def _g_a(p: List[dict], x):
    """conv5s2, GDN ×3, final conv5s2."""
    for i in range(3):
        x = gdn(p[2 * i + 1], tconv(p[2 * i], x, 2))
    return tconv(p[6], x, 2)


def _g_s(p: List[dict], y):
    """deconv5s2, IGDN ×3, final deconv5s2."""
    for i in range(3):
        y = gdn(p[2 * i + 1], tdeconv(p[2 * i], y, 2), inverse=True)
    return tdeconv(p[6], y, 2)


def factorized_forward(params: dict, x: jnp.ndarray):
    """bmshj2018-factorized: x_hat = g_s(round(g_a(x)))."""
    y = _g_a(params["g_a"], x)
    y_hat, y_lik = entropy_bottleneck(params["eb"], y)
    x_hat = _g_s(params["g_s"], y_hat)
    return x_hat, [y_lik]


def scale_hyperprior_forward(params: dict, x: jnp.ndarray):
    """bmshj2018-hyperprior: h_a on |y|, ReLU-terminated h_s predicts scales."""
    y = _g_a(params["g_a"], x)
    ha = params["h_a"]
    z = tconv(ha[2], jax.nn.relu(tconv(ha[1], jax.nn.relu(tconv(ha[0], jnp.abs(y), 1)), 2)), 2)
    z_hat, z_lik = entropy_bottleneck(params["eb"], z)
    hs = params["h_s"]
    s = jax.nn.relu(tdeconv(hs[0], z_hat, 2))
    s = jax.nn.relu(tdeconv(hs[1], s, 2))
    scales = jax.nn.relu(tconv(hs[2], s, 1))
    y_hat = st_round(y)
    y_lik = gaussian_likelihood(y_hat, scales)
    x_hat = _g_s(params["g_s"], y_hat)
    return x_hat, [y_lik, z_lik]


def _mean_scale_hyper(params: dict, y):
    """Shared mbt2018(-mean) hyper branch: y -> (z_hat, z_lik, params 2M)."""
    ha = params["h_a"]
    z = tconv(ha[0], y, 1)
    z = tconv(ha[1], leaky_relu(z), 2)
    z = tconv(ha[2], leaky_relu(z), 2)
    z_hat, z_lik = entropy_bottleneck(params["eb"], z)
    hs = params["h_s"]
    g = leaky_relu(tdeconv(hs[0], z_hat, 2))
    g = leaky_relu(tdeconv(hs[1], g, 2))
    return z_hat, z_lik, tconv(hs[2], g, 1)


def mean_scale_forward(params: dict, x: jnp.ndarray):
    """mbt2018-mean: quantize round(y-μ)+μ; likelihood N(μ, σ)."""
    y = _g_a(params["g_a"], x)
    _, z_lik, gparams = _mean_scale_hyper(params, y)
    scales, means = jnp.split(gparams, 2, axis=-1)
    y_hat = st_round(y - means) + means
    y_lik = gaussian_likelihood(y_hat, scales, means)
    x_hat = _g_s(params["g_s"], y_hat)
    return x_hat, [y_lik, z_lik]


def _context_params(params: dict, hyper: jnp.ndarray, y_hat: jnp.ndarray):
    """Masked-conv context + entropy_parameters 1x1 stack -> (scales, means)."""
    ctx = tconv(params["context_prediction"], y_hat, 1)
    ep = params["entropy_parameters"]
    g = jnp.concatenate([hyper, ctx], axis=-1)
    g = leaky_relu(tconv(ep[0], g, 1))
    g = leaky_relu(tconv(ep[1], g, 1))
    g = tconv(ep[2], g, 1)
    scales, means = jnp.split(g, 2, axis=-1)
    return scales, means


def joint_forward(params: dict, x: jnp.ndarray):
    """mbt2018: x_hat = g_s(round(y)); context model only shapes likelihoods."""
    y = _g_a(params["g_a"], x)
    _, z_lik, hyper = _mean_scale_hyper(params, y)
    y_hat = st_round(y)
    scales, means = _context_params(params, hyper, y_hat)
    y_lik = gaussian_likelihood(y, scales, means)
    x_hat = _g_s(params["g_s"], y_hat)
    return x_hat, [y_lik, z_lik]


# ---------------------------------------------------------------------------
# cheng2020 blocks
# ---------------------------------------------------------------------------


def res_block(p: dict, x):
    """conv3x3 lrelu conv3x3 lrelu (+1x1 skip if channels change)."""
    out = leaky_relu(tconv(p["conv2"], leaky_relu(tconv(p["conv1"], x, 1)), 1))
    identity = tconv(p["skip"], x, 1) if "skip" in p else x
    return out + identity


def res_block_stride(p: dict, x, stride: int = 2):
    """conv3x3(s) lrelu conv3x3 GDN (+1x1(s) skip)."""
    out = gdn(p["gdn"], tconv(p["conv2"], leaky_relu(tconv(p["conv1"], x, stride)), 1))
    identity = tconv(p["skip"], x, stride) if "skip" in p else x
    return out + identity


def res_block_upsample(p: dict, x, r: int = 2):
    """subpel lrelu conv3x3 IGDN + subpel skip."""
    out = gdn(p["igdn"], tconv(p["conv"], leaky_relu(subpel_conv(p["subpel"], x, r)), 1),
              inverse=True)
    return out + subpel_conv(p["upsample"], x, r)


def attention_block(p: dict, x):
    """cheng2020 AttentionBlock: a * sigmoid(b) + x, a/b = 3 residual units."""

    def unit(u, v):
        h = jax.nn.relu(tconv(u["conv1"], v, 1))
        h = jax.nn.relu(tconv(u["conv2"], h, 1))
        h = tconv(u["conv3"], h, 1)
        return jax.nn.relu(v + h)

    a = x
    for u in p["conv_a"]:
        a = unit(u, a)
    b = x
    for u in p["conv_b"][:3]:
        b = unit(u, b)
    b = tconv(p["conv_b"][3], b, 1)
    return x + a * jax.nn.sigmoid(b)


def _cheng_g_a(p: List[dict], x, attn: bool):
    x = res_block_stride(p[0], x)
    x = res_block(p[1], x)
    x = res_block_stride(p[2], x)
    i = 3
    if attn:
        x = attention_block(p[i], x)
        i += 1
    x = res_block(p[i], x)
    x = res_block_stride(p[i + 1], x)
    x = res_block(p[i + 2], x)
    x = tconv(p[i + 3], x, 2)
    if attn:
        x = attention_block(p[i + 4], x)
    return x


def _cheng_g_s(p: List[dict], y, attn: bool):
    i = 0
    if attn:
        y = attention_block(p[0], y)
        i = 1
    y = res_block(p[i], y)
    y = res_block_upsample(p[i + 1], y)
    y = res_block(p[i + 2], y)
    y = res_block_upsample(p[i + 3], y)
    i += 4
    if attn:
        y = attention_block(p[i], y)
        i += 1
    y = res_block(p[i], y)
    y = res_block_upsample(p[i + 1], y)
    y = res_block(p[i + 2], y)
    return subpel_conv(p[i + 3], y, 2)


def cheng_forward(params: dict, x: jnp.ndarray, attn: bool = False):
    """cheng2020-anchor/attn (JointAutoregressive family reconstruction)."""
    y = _cheng_g_a(params["g_a"], x, attn)
    ha = params["h_a"]
    z = tconv(ha[0], y, 1)
    z = tconv(ha[1], leaky_relu(z), 1)
    z = tconv(ha[2], leaky_relu(z), 2)
    z = tconv(ha[3], leaky_relu(z), 1)
    z = tconv(ha[4], leaky_relu(z), 2)
    z_hat, z_lik = entropy_bottleneck(params["eb"], z)
    hs = params["h_s"]
    g = leaky_relu(tconv(hs[0], z_hat, 1))
    g = leaky_relu(subpel_conv(hs[1], g, 2))
    g = leaky_relu(tconv(hs[2], g, 1))
    g = leaky_relu(subpel_conv(hs[3], g, 2))
    hyper = tconv(hs[4], g, 1)
    y_hat = st_round(y)
    scales, means = _context_params(params, hyper, y_hat)
    y_lik = gaussian_likelihood(y, scales, means)
    x_hat = _cheng_g_s(params["g_s"], y_hat, attn)
    return x_hat, [y_lik, z_lik]


FORWARDS = {
    "bmshj2018-factorized": factorized_forward,
    "bmshj2018-hyperprior": scale_hyperprior_forward,
    "mbt2018-mean": mean_scale_forward,
    "mbt2018": joint_forward,
    "cheng2020-anchor": lambda p, x: cheng_forward(p, x, attn=False),
    "cheng2020-attn": lambda p, x: cheng_forward(p, x, attn=True),
}


# ---------------------------------------------------------------------------
# State-dict conversion (host-side, numpy)
# ---------------------------------------------------------------------------

_PEDESTAL = float(2**-18) ** 2


def _nonneg(stored: np.ndarray, minimum: float) -> np.ndarray:
    """Invert compressai's NonNegativeParametrizer at load time."""
    bound = (minimum + _PEDESTAL) ** 0.5
    return np.maximum(stored, bound) ** 2 - _PEDESTAL


def _cv(sd, p):
    out = {"kernel": np.ascontiguousarray(np.transpose(sd[p + ".weight"], (2, 3, 1, 0)))}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _dcv(sd, p):
    """ConvTranspose2d weight [I, O, kh, kw] -> flipped [kh, kw, I, O]."""
    w = np.transpose(sd[p + ".weight"], (2, 3, 0, 1))[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if p + ".bias" in sd:
        out["bias"] = np.asarray(sd[p + ".bias"])
    return out


def _gdn(sd, p):
    beta = _nonneg(np.asarray(sd[p + ".beta"]), 1e-6)
    gamma = _nonneg(np.asarray(sd[p + ".gamma"]), 0.0)
    return {"beta": beta, "gamma_t": np.ascontiguousarray(gamma.T)}


def _masked_cv(sd, p):
    """MaskedConv2d type A: zero the center and everything after it."""
    w = np.array(sd[p + ".weight"])
    _, _, kh, kw = w.shape
    w[:, :, kh // 2, kw // 2 :] = 0.0
    w[:, :, kh // 2 + 1 :, :] = 0.0
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": np.asarray(sd[p + ".bias"])}


def _eb(sd, prefix="entropy_bottleneck"):
    mats, biases, factors = [], [], []
    i = 0
    while f"{prefix}._matrix{i}" in sd:
        mats.append(np.asarray(sd[f"{prefix}._matrix{i}"]))
        biases.append(np.asarray(sd[f"{prefix}._bias{i}"]))
        if f"{prefix}._factor{i}" in sd:
            factors.append(np.asarray(sd[f"{prefix}._factor{i}"]))
        i += 1
    if not mats:
        raise KeyError(f"no EntropyBottleneck params under '{prefix}.' — "
                       "is this a compressai checkpoint?")
    return {
        "matrices": mats,
        "biases": biases,
        "factors": factors,
        "quantiles": np.asarray(sd[f"{prefix}.quantiles"]),
    }


def _seq_convs(sd, prefix, layers):
    """Sequential of (index, kind) where kind in {conv, deconv, gdn, subpel}."""
    out = []
    for idx, kind in layers:
        p = f"{prefix}.{idx}"
        if kind == "conv":
            out.append(_cv(sd, p))
        elif kind == "deconv":
            out.append(_dcv(sd, p))
        elif kind == "gdn":
            out.append(_gdn(sd, p))
        elif kind == "subpel":
            out.append(_cv(sd, p + ".0"))
        else:
            raise ValueError(kind)
    return out


def _res_block(sd, p):
    out = {"conv1": _cv(sd, p + ".conv1"), "conv2": _cv(sd, p + ".conv2")}
    if p + ".skip.weight" in sd:
        out["skip"] = _cv(sd, p + ".skip")
    return out


def _res_block_stride(sd, p):
    out = {"conv1": _cv(sd, p + ".conv1"), "conv2": _cv(sd, p + ".conv2"),
           "gdn": _gdn(sd, p + ".gdn")}
    if p + ".skip.weight" in sd:
        out["skip"] = _cv(sd, p + ".skip")
    return out


def _res_block_up(sd, p):
    return {
        "subpel": _cv(sd, p + ".subpel_conv.0"),
        "conv": _cv(sd, p + ".conv"),
        "igdn": _gdn(sd, p + ".igdn"),
        "upsample": _cv(sd, p + ".upsample.0"),
    }


def _attn_block(sd, p):
    def units(branch, n):
        return [
            {
                "conv1": _cv(sd, f"{p}.{branch}.{j}.conv.0"),
                "conv2": _cv(sd, f"{p}.{branch}.{j}.conv.2"),
                "conv3": _cv(sd, f"{p}.{branch}.{j}.conv.4"),
            }
            for j in range(n)
        ]

    return {"conv_a": units("conv_a", 3), "conv_b": units("conv_b", 3) + [_cv(sd, p + ".conv_b.3")]}


_GA_LAYERS = [(0, "conv"), (1, "gdn"), (2, "conv"), (3, "gdn"),
              (4, "conv"), (5, "gdn"), (6, "conv")]
_GS_LAYERS = [(0, "deconv"), (1, "gdn"), (2, "deconv"), (3, "gdn"),
              (4, "deconv"), (5, "gdn"), (6, "deconv")]


def convert_compressai(sd: Dict[str, np.ndarray], arch: str) -> dict:
    """compressai zoo checkpoint state dict -> forward params for FORWARDS[arch].

    Layouts: compressai/models/google.py (FactorizedPrior, ScaleHyperprior,
    MeanScaleHyperprior, JointAutoregressiveHierarchicalPriors) and
    waseda.py (Cheng2020Anchor/Attention).
    """
    if arch == "bmshj2018-factorized":
        return {
            "g_a": _seq_convs(sd, "g_a", _GA_LAYERS),
            "g_s": _seq_convs(sd, "g_s", _GS_LAYERS),
            "eb": _eb(sd),
        }
    if arch == "bmshj2018-hyperprior":
        return {
            "g_a": _seq_convs(sd, "g_a", _GA_LAYERS),
            "g_s": _seq_convs(sd, "g_s", _GS_LAYERS),
            "h_a": _seq_convs(sd, "h_a", [(0, "conv"), (2, "conv"), (4, "conv")]),
            "h_s": _seq_convs(sd, "h_s", [(0, "deconv"), (2, "deconv"), (4, "conv")]),
            "eb": _eb(sd),
        }
    if arch in ("mbt2018-mean", "mbt2018"):
        params = {
            "g_a": _seq_convs(sd, "g_a", _GA_LAYERS),
            "g_s": _seq_convs(sd, "g_s", _GS_LAYERS),
            "h_a": _seq_convs(sd, "h_a", [(0, "conv"), (2, "conv"), (4, "conv")]),
            "h_s": _seq_convs(sd, "h_s", [(0, "deconv"), (2, "deconv"), (4, "conv")]),
            "eb": _eb(sd),
        }
        if arch == "mbt2018":
            params["context_prediction"] = _masked_cv(sd, "context_prediction")
            params["entropy_parameters"] = _seq_convs(
                sd, "entropy_parameters", [(0, "conv"), (2, "conv"), (4, "conv")]
            )
        return params
    if arch in ("cheng2020-anchor", "cheng2020-attn"):
        attn = arch == "cheng2020-attn"
        if attn:
            g_a = [
                _res_block_stride(sd, "g_a.0"), _res_block(sd, "g_a.1"),
                _res_block_stride(sd, "g_a.2"), _attn_block(sd, "g_a.3"),
                _res_block(sd, "g_a.4"), _res_block_stride(sd, "g_a.5"),
                _res_block(sd, "g_a.6"), _cv(sd, "g_a.7"), _attn_block(sd, "g_a.8"),
            ]
            g_s = [
                _attn_block(sd, "g_s.0"), _res_block(sd, "g_s.1"),
                _res_block_up(sd, "g_s.2"), _res_block(sd, "g_s.3"),
                _res_block_up(sd, "g_s.4"), _attn_block(sd, "g_s.5"),
                _res_block(sd, "g_s.6"), _res_block_up(sd, "g_s.7"),
                _res_block(sd, "g_s.8"), _cv(sd, "g_s.9.0"),
            ]
        else:
            g_a = [
                _res_block_stride(sd, "g_a.0"), _res_block(sd, "g_a.1"),
                _res_block_stride(sd, "g_a.2"), _res_block(sd, "g_a.3"),
                _res_block_stride(sd, "g_a.4"), _res_block(sd, "g_a.5"),
                _cv(sd, "g_a.6"),
            ]
            g_s = [
                _res_block(sd, "g_s.0"), _res_block_up(sd, "g_s.1"),
                _res_block(sd, "g_s.2"), _res_block_up(sd, "g_s.3"),
                _res_block(sd, "g_s.4"), _res_block_up(sd, "g_s.5"),
                _res_block(sd, "g_s.6"), _cv(sd, "g_s.7.0"),
            ]
        return {
            "g_a": g_a,
            "g_s": g_s,
            "h_a": _seq_convs(
                sd, "h_a", [(0, "conv"), (2, "conv"), (4, "conv"), (6, "conv"), (8, "conv")]
            ),
            "h_s": _seq_convs(
                sd, "h_s", [(0, "conv"), (2, "subpel"), (4, "conv"), (6, "subpel"), (8, "conv")]
            ),
            "context_prediction": _masked_cv(sd, "context_prediction"),
            "entropy_parameters": _seq_convs(
                sd, "entropy_parameters", [(0, "conv"), (2, "conv"), (4, "conv")]
            ),
            "eb": _eb(sd),
        }
    raise ValueError(f"unknown compressai arch: {arch}")


def parse_codec_name(name: str) -> Tuple[str, Optional[int]]:
    """``"cheng2020-anchor-q=3"`` -> ("cheng2020-anchor", 3)."""
    if "-q=" in name:
        arch, q = name.rsplit("-q=", 1)
        return arch, int(q)
    return name, None
