"""Torch-oracle parity for the EnCodec and DAC ports.

Oracles re-state the pip packages' module structure at tiny dims with the
released state-dict naming (encodec/modules/{seanet,conv}.py with
weight_norm + SLSTM; dac/model/dac.py + dac/nn/layers.py Snake1d/WN convs),
exercising convert_encodec / convert_dac end to end.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

torch = pytest.importorskip("torch")
import torch.nn as nn
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from wmar_tpu.audio import codecs as C

TINY_ENC = C.EncodecConfig(
    dimension=8, n_filters=4, ratios=(4, 2), n_residual_layers=1,
    kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
    lstm_layers=2, n_q=2, bins=16,
)
TINY_DAC = C.DACConfig(
    encoder_dim=4, encoder_rates=(2, 4), decoder_dim=16, decoder_rates=(4, 2),
    latent_dim=16, n_codebooks=2, codebook_size=8, codebook_dim=4, n_q=2,
)


# --- EnCodec oracle ---------------------------------------------------------


class SConv1d(nn.Module):
    def __init__(self, i, o, k, stride=1, dilation=1):
        super().__init__()
        conv = nn.Module()
        conv.conv = weight_norm(nn.Conv1d(i, o, k, stride=stride, dilation=dilation))
        self.conv = conv
        self.k, self.stride, self.dilation = k, stride, dilation

    def forward(self, x):
        # encodec package SConv1d: causal reflect left pad + extra right pad
        # to complete the last frame (conv.py pad1d / get_extra_padding).
        keff = (self.k - 1) * self.dilation + 1
        pad = keff - self.stride
        import math as _math

        n_frames = _math.ceil((x.shape[-1] - keff + pad) / self.stride)
        extra = n_frames * self.stride + keff - pad - x.shape[-1]
        x = nn.functional.pad(x, (max(pad, 0), max(extra, 0)), mode="reflect")
        return self.conv.conv(x)


class SConvTranspose1d(nn.Module):
    def __init__(self, i, o, k, stride):
        super().__init__()
        convtr = nn.Module()
        convtr.convtr = weight_norm(nn.ConvTranspose1d(i, o, k, stride=stride))
        self.convtr = convtr
        self.stride, self.k = stride, k

    def forward(self, x):
        y = self.convtr.convtr(x)
        trim = self.k - self.stride  # causal: trim right (trim_right_ratio=1)
        return y[..., :-trim] if trim > 0 else y


class SLSTM(nn.Module):
    def __init__(self, dim, layers):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, layers)

    def forward(self, x):  # [B, C, T]
        y = x.permute(2, 0, 1)
        y = self.lstm(y)[0] + y  # skip=True, as in encodec SLSTM / HF EncodecLSTM
        return y.permute(1, 2, 0)


class SEANetResnetBlock(nn.Module):
    def __init__(self, dim, res_k, dilation):
        super().__init__()
        self.block = nn.Sequential(
            nn.ELU(), SConv1d(dim, dim // 2, res_k, dilation=dilation),
            nn.ELU(), SConv1d(dim // 2, dim, 1),
        )
        self.shortcut = SConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class EncodecOracle(nn.Module):
    def __init__(self, cfg: C.EncodecConfig):
        super().__init__()
        f = cfg.n_filters
        enc = [SConv1d(cfg.channels, f, cfg.kernel_size)]
        mult = 1
        for ratio in reversed(cfg.ratios):
            for j in range(cfg.n_residual_layers):
                enc.append(SEANetResnetBlock(mult * f, cfg.residual_kernel_size,
                                             cfg.dilation_base**j))
            enc += [nn.ELU(), SConv1d(mult * f, mult * f * 2, 2 * ratio, stride=ratio)]
            mult *= 2
        enc += [SLSTM(mult * f, cfg.lstm_layers), nn.ELU(),
                SConv1d(mult * f, cfg.dimension, cfg.last_kernel_size)]
        self.encoder = nn.Module()
        self.encoder.model = nn.Sequential(*enc)

        dec = [SConv1d(cfg.dimension, mult * f, cfg.kernel_size),
               SLSTM(mult * f, cfg.lstm_layers)]
        for ratio in cfg.ratios:
            dec += [nn.ELU(), SConvTranspose1d(mult * f, mult * f // 2, 2 * ratio, ratio)]
            for j in range(cfg.n_residual_layers):
                dec.append(SEANetResnetBlock(mult * f // 2, cfg.residual_kernel_size,
                                             cfg.dilation_base**j))
            mult //= 2
        dec += [nn.ELU(), SConv1d(f, cfg.channels, cfg.last_kernel_size)]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*dec)

        q = nn.Module()
        vq = nn.Module()
        layers = []
        for _ in range(cfg.n_q):
            lay = nn.Module()
            cb = nn.Module()
            cb.register_buffer("embed", torch.randn(cfg.bins, cfg.dimension))
            lay._codebook = cb
            layers.append(lay)
        vq.layers = nn.ModuleList(layers)
        q.vq = vq
        self.quantizer = q

    def forward(self, x):  # full round trip, matching our jax path
        z = self.encoder.model(x)  # [B, D, T']
        residual = z
        z_hat = torch.zeros_like(z)
        for lay in self.quantizer.vq.layers:
            cb = lay._codebook.embed  # [bins, D]
            d = (cb.pow(2).sum(1)[None, :, None]
                 - 2 * torch.einsum("bdt,kd->bkt", residual, cb))
            idx = d.argmin(1)  # [B, T']
            quant = cb[idx].permute(0, 2, 1)
            residual = residual - quant
            z_hat = z_hat + quant
        return self.decoder.model(z_hat)


def test_encodec_parity():
    torch.manual_seed(0)
    model = EncodecOracle(TINY_ENC).eval()
    x = torch.rand(2, 1, 64) * 2 - 1
    with torch.no_grad():
        ref = model(x)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, C.convert_encodec(sd, TINY_ENC))
    out = C.encodec_roundtrip(params, TINY_ENC, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.transpose(out, (0, 2, 1)), ref.numpy(), atol=3e-4
    )


def _hf_encodec_parity(hf_cfg_kw, our_cfg, t, atol):
    """Round-trip parity vs the REAL HF EncodecModel (the implementation the
    reference's EncodecCompression loads, transformers modeling_encodec.py)
    with random weights."""
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(0)
    hf_cfg = transformers.EncodecConfig(**hf_cfg_kw)
    model = transformers.EncodecModel(hf_cfg).eval()
    x = torch.rand(2, 1, t) * 2 - 1
    with torch.no_grad():
        ref = model(x).audio_values
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, C.convert_encodec(sd, our_cfg))
    out = C.encodec_roundtrip(params, our_cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    out = np.transpose(out, (0, 2, 1))[..., : ref.shape[-1]]
    np.testing.assert_allclose(out, ref.numpy()[..., : out.shape[-1]], atol=atol)


def test_encodec_parity_hf_reduced():
    # bandwidth 4.0 kbps at frame_rate 200 & 10-bit codebooks -> n_q = 2,
    # matching TINY-style geometry.
    _hf_encodec_parity(
        dict(num_filters=4, hidden_size=8, codebook_dim=8, codebook_size=1024,
             upsampling_ratios=[4, 2], sampling_rate=1600,
             target_bandwidths=[4.0], normalize=False),
        C.EncodecConfig(dimension=8, n_filters=4, ratios=(4, 2), n_q=2, bins=1024),
        t=64, atol=3e-4,
    )


def test_encodec_parity_hf_full_geometry():
    """The published facebook/encodec_24khz geometry end-to-end (random
    weights): validates the converter at the real shapes (VERDICT r2 #2)."""
    _hf_encodec_parity(
        {},  # HF defaults == encodec_24khz geometry
        C.ENCODEC_24K,
        t=1600, atol=1e-3,
    )


# --- DAC oracle --------------------------------------------------------------


class Snake1d(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, c, 1) + 0.1 * torch.randn(1, c, 1))

    def forward(self, x):
        return x + (torch.sin(self.alpha * x) ** 2) / (self.alpha + 1e-9)


def WNConv1d(*a, **k):
    return weight_norm(nn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return weight_norm(nn.ConvTranspose1d(*a, **k))


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = (7 - 1) * dilation // 2
        self.block = nn.Sequential(
            Snake1d(dim), WNConv1d(dim, dim, 7, dilation=dilation, padding=pad),
            Snake1d(dim), WNConv1d(dim, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class EncoderBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            ResidualUnit(dim // 2, 1), ResidualUnit(dim // 2, 3), ResidualUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=(2 * stride - stride + 1) // 2),
        )

    def forward(self, x):
        return self.block(x)


class DecoderBlock(nn.Module):
    def __init__(self, i, o, stride):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(i),
            WNConvTranspose1d(i, o, 2 * stride, stride=stride, padding=-(-stride // 2)),
            ResidualUnit(o, 1), ResidualUnit(o, 3), ResidualUnit(o, 9),
        )

    def forward(self, x):
        return self.block(x)


class DACOracle(nn.Module):
    def __init__(self, cfg: C.DACConfig):
        super().__init__()
        d = cfg.encoder_dim
        enc = [WNConv1d(1, d, 7, padding=3)]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(EncoderBlock(d, s))
        enc += [Snake1d(d), WNConv1d(d, cfg.latent_dim, 3, padding=1)]
        self.encoder = nn.Module()
        self.encoder.block = nn.Sequential(*enc)

        quant = []
        for _ in range(cfg.n_q):
            vq = nn.Module()
            vq.in_proj = WNConv1d(cfg.latent_dim, cfg.codebook_dim, 1)
            vq.out_proj = WNConv1d(cfg.codebook_dim, cfg.latent_dim, 1)
            vq.codebook = nn.Embedding(cfg.codebook_size, cfg.codebook_dim)
            quant.append(vq)
        qwrap = nn.Module()
        qwrap.quantizers = nn.ModuleList(quant)
        self.quantizer = qwrap

        dd = cfg.decoder_dim
        dec = [WNConv1d(cfg.latent_dim, dd, 7, padding=3)]
        for s in cfg.decoder_rates:
            dec.append(DecoderBlock(dd, dd // 2, s))
            dd //= 2
        dec += [Snake1d(dd), WNConv1d(dd, 1, 7, padding=3), nn.Tanh()]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*dec)

    def forward(self, x):
        z = self.encoder.block(x)
        z_hat = torch.zeros_like(z)
        residual = z
        for vq in self.quantizer.quantizers:
            zp = vq.in_proj(residual).permute(0, 2, 1)  # [B,T,cb]
            zp_n = torch.nn.functional.normalize(zp, dim=-1)
            cb_n = torch.nn.functional.normalize(vq.codebook.weight, dim=-1)
            d = cb_n.pow(2).sum(1)[None, None] - 2 * zp_n @ cb_n.T
            idx = d.argmin(-1)
            zq = vq.out_proj(vq.codebook.weight[idx].permute(0, 2, 1))
            z_hat = z_hat + zq
            residual = residual - zq
        return self.decoder.model(z_hat)


def test_dac_parity():
    torch.manual_seed(1)
    model = DACOracle(TINY_DAC).eval()
    x = torch.rand(2, 1, 64) * 2 - 1
    with torch.no_grad():
        ref = model(x)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, C.convert_dac(sd, TINY_DAC))
    out = C.dac_roundtrip(params, TINY_DAC, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.transpose(out, (0, 2, 1)), ref.numpy(), atol=3e-4
    )


def test_codec_attack_wrapper():
    torch.manual_seed(2)
    model = EncodecOracle(TINY_ENC)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    codec = C.CodecCompression("encodec", C.convert_encodec(sd, TINY_ENC), TINY_ENC)
    audio = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (1, 100, 1)).astype(np.float32))
    out = codec(audio)
    assert out.shape == (1, 100, 1)  # odd length padded then trimmed
    assert np.isfinite(np.asarray(out)).all()
