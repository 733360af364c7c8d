"""AudioSeal port: torch-oracle parity + full-geometry converter checks.

The oracle mirrors the audioseal package architecture (facebookresearch/
audioseal models.py + vendored audiocraft SEANet, non-causal, constant pad,
weight_norm) at reduced width; the shape-driven converters must reproduce
its outputs exactly. The package itself is not installed here, so the
oracle re-states its structure with the real state-dict key names.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import math  # noqa: E402

import torch.nn as nn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wmar_tpu.audio import audioseal as A  # noqa: E402

TINY = A.AudioSealConfig(
    dimension=8, n_filters=4, ratios=(4, 2), n_residual_layers=1,
    kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
    lstm_layers=2, nbits=4, detector_output_dim=8, sample_rate=1600,
)


class NCConv1d(nn.Module):
    """audiocraft StreamableConv1d, causal=False, pad_mode='constant'."""

    def __init__(self, i, o, k, stride=1, dilation=1):
        super().__init__()
        conv = nn.Module()
        conv.conv = weight_norm(nn.Conv1d(i, o, k, stride=stride, dilation=dilation))
        self.conv = conv
        self.k, self.stride, self.dilation = k, stride, dilation

    def forward(self, x):
        keff = (self.k - 1) * self.dilation + 1
        pad_total = keff - self.stride
        n_frames = math.ceil((x.shape[-1] - keff + pad_total) / self.stride)
        extra = n_frames * self.stride + keff - pad_total - x.shape[-1]
        right = pad_total // 2
        left = pad_total - right
        x = nn.functional.pad(x, (max(left, 0), max(right + extra, 0)))
        return self.conv.conv(x)


class NCConvTr1d(nn.Module):
    def __init__(self, i, o, k, stride):
        super().__init__()
        convtr = nn.Module()
        convtr.convtr = weight_norm(nn.ConvTranspose1d(i, o, k, stride=stride))
        self.convtr = convtr
        self.k, self.stride = k, stride

    def forward(self, x):
        y = self.convtr.convtr(x)
        pad_total = self.k - self.stride
        right = pad_total // 2
        left = pad_total - right
        return y[..., left: y.shape[-1] - right]


class SLSTM(nn.Module):
    def __init__(self, dim, layers):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, layers)

    def forward(self, x):
        y = x.permute(2, 0, 1)
        y = self.lstm(y)[0] + y
        return y.permute(1, 2, 0)


class ResBlock(nn.Module):
    def __init__(self, dim, res_k, dilation):
        super().__init__()
        self.block = nn.Sequential(
            nn.ELU(), NCConv1d(dim, dim // 2, res_k, dilation=dilation),
            nn.ELU(), NCConv1d(dim // 2, dim, 1),
        )
        self.shortcut = NCConv1d(dim, dim, 1)

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


def seanet_encoder(cfg):
    f = cfg.n_filters
    enc = [NCConv1d(cfg.channels, f, cfg.kernel_size)]
    mult = 1
    for ratio in reversed(cfg.ratios):
        for j in range(cfg.n_residual_layers):
            enc.append(ResBlock(mult * f, cfg.residual_kernel_size, cfg.dilation_base**j))
        enc += [nn.ELU(), NCConv1d(mult * f, mult * f * 2, 2 * ratio, stride=ratio)]
        mult *= 2
    enc += [SLSTM(mult * f, cfg.lstm_layers), nn.ELU(),
            NCConv1d(mult * f, cfg.dimension, cfg.last_kernel_size)]
    return nn.Sequential(*enc), mult


def seanet_decoder(cfg, mult):
    f = cfg.n_filters
    dec = [NCConv1d(cfg.dimension, mult * f, cfg.kernel_size),
           SLSTM(mult * f, cfg.lstm_layers)]
    for ratio in cfg.ratios:
        dec += [nn.ELU(), NCConvTr1d(mult * f, mult * f // 2, 2 * ratio, ratio)]
        for j in range(cfg.n_residual_layers):
            dec.append(ResBlock(mult * f // 2, cfg.residual_kernel_size, cfg.dilation_base**j))
        mult //= 2
    dec += [nn.ELU(), NCConv1d(f, cfg.channels, cfg.last_kernel_size)]
    return nn.Sequential(*dec)


class GenOracle(nn.Module):
    """audioseal AudioSealWM with the real key names."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        model, mult = seanet_encoder(cfg)
        self.encoder = nn.Module()
        self.encoder.model = model
        self.decoder = nn.Module()
        self.decoder.model = seanet_decoder(cfg, mult)
        mp = nn.Module()
        mp.msg_processor = nn.Embedding(2 * cfg.nbits, cfg.dimension)
        self.msg_processor = mp

    def get_watermark(self, x, message):
        t = x.shape[-1]
        hidden = self.encoder.model(x)
        idx = 2 * torch.arange(self.cfg.nbits)[None] + message
        aux = self.msg_processor.msg_processor(idx).sum(dim=1)  # [B, dim]
        hidden = hidden + aux[:, :, None]
        return self.decoder.model(hidden)[..., :t]


class DetOracle(nn.Module):
    """audioseal AudioSealDetector: detector.0 = SEANetEncoderKeepDimension,
    detector.1 = 1x1 conv to 2 + nbits channels."""

    def __init__(self, cfg):
        super().__init__()
        keep = nn.Module()
        keep.model, _ = seanet_encoder(cfg)
        hop = cfg.hop_length
        keep.reverse_convolution = nn.ConvTranspose1d(
            cfg.dimension, cfg.detector_output_dim, hop, stride=hop)
        self.keep = keep
        self.head = nn.Conv1d(cfg.detector_output_dim, 2 + cfg.nbits, 1)
        self.detector = nn.ModuleList([keep, self.head])  # key names detector.{0,1}

    def forward(self, x):
        t = x.shape[-1]
        h = self.keep.model(x)
        h = self.keep.reverse_convolution(h)[..., :t]
        logits = self.head(h)
        probs = torch.softmax(logits[:, :2], dim=1)
        return probs[:, 1], logits[:, 2:]


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_generator_parity(rng):
    torch.manual_seed(0)
    oracle = GenOracle(TINY).eval()
    x = torch.rand(2, 1, 64) * 2 - 1
    msg = torch.tensor(rng.integers(0, 2, size=(2, TINY.nbits)))
    with torch.no_grad():
        ref = oracle.get_watermark(x, msg)
    sd = {k.replace("detector.", "DROP."): v for k, v in _sd(oracle).items()
          if not k.startswith("detector.")}
    params, cfg = A.convert_audioseal_generator(sd)
    assert cfg.ratios == TINY.ratios and cfg.nbits == TINY.nbits
    assert cfg.dimension == TINY.dimension and cfg.n_filters == TINY.n_filters
    out = A.audioseal_get_watermark(
        jax.tree.map(jnp.asarray, params), cfg,
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(msg.numpy()))
    np.testing.assert_allclose(
        np.transpose(out, (0, 2, 1)), ref.numpy(), atol=3e-4)


def test_detector_parity(rng):
    torch.manual_seed(1)
    oracle = DetOracle(TINY).eval()
    x = torch.rand(2, 1, 64) * 2 - 1
    with torch.no_grad():
        ref_p, ref_m = oracle(x)
    sd = _sd(oracle)
    # rename oracle-internal names to the package layout
    sd = {k.replace("keep.", "detector.0.").replace("head.", "detector.1."): v
          for k, v in sd.items() if not k.startswith("detector.")}
    params, cfg = A.convert_audioseal_detector(sd)
    assert cfg.detector_output_dim == TINY.detector_output_dim
    assert cfg.nbits == TINY.nbits
    presence, msg_logits = A.audioseal_detect(
        jax.tree.map(jnp.asarray, params), cfg,
        jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(presence), ref_p.numpy(), atol=3e-4)
    np.testing.assert_allclose(
        np.transpose(msg_logits, (0, 2, 1)), ref_m.numpy(), atol=3e-4)


def test_full_geometry_roundtrip():
    """Published audioseal_wm_16bits shapes through the shape-driven
    converters (synthetic weights, zero egress) — VERDICT r2 #2 pattern."""
    cfg = A.AUDIOSEAL_16B
    gp, gcfg = A.convert_audioseal_generator(A.synthetic_generator_sd(cfg))
    dp, dcfg = A.convert_audioseal_detector(A.synthetic_detector_sd(cfg))
    assert gcfg.ratios == cfg.ratios == dcfg.ratios
    assert gcfg.dimension == 128 and gcfg.n_filters == 32 and gcfg.nbits == 16
    assert dcfg.detector_output_dim == 32
    model = A.AudioSealModel(gp, dp, gcfg)
    audio = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (1, 2 * cfg.hop_length, 1)),
                        jnp.float32)
    delta = model.get_watermark(audio)
    assert delta.shape == audio.shape and bool(jnp.isfinite(delta).all())
    presence = model.detect(audio + delta)
    assert presence.shape == (1, audio.shape[1])
    assert bool(jnp.isfinite(presence).all())
    assert float(presence.min()) >= 0.0 and float(presence.max()) <= 1.0


def test_syncpattern_with_audioseal(rng):
    """SyncPattern end-to-end over the AudioSeal model (tiny): embed the
    square-gated watermark, detect, run the speed/shift search machinery."""
    from wmar_tpu.audio.sync import SyncPattern

    gp, gcfg = A.convert_audioseal_generator(A.synthetic_generator_sd(TINY, seed=3))
    dp, dcfg = A.convert_audioseal_detector(A.synthetic_detector_sd(TINY, seed=4))
    model = A.AudioSealModel(gp, dp, gcfg)
    sp = SyncPattern(model, frames_per_period=2, frame_size=8,
                     sample_rate=TINY.sample_rate)
    audio = jnp.asarray(rng.normal(0, 0.1, (1, 512, 1)), jnp.float32)
    wm = sp.get_sync_wm(audio, alpha=1.0)
    assert wm.shape == audio.shape
    sig = sp.detect_signal(wm)
    assert sig.shape == (1, 512)
    speedup, shift = sp.get_speedup_and_shift(sig[0], downsample_factor=2, step=2)
    assert 0.3 < speedup < 3.0


def test_eval_audioseal_cli(tmp_path, rng):
    """eval_audioseal end-to-end (tiny): wav dir -> CSV + TPR summary
    (reference evals/eval_audioseal.py surface)."""
    from scipy.io import wavfile

    from wmar_tpu.audio.eval_audioseal import main

    adir = tmp_path / "wavs"
    adir.mkdir()
    for i in range(3):
        wavfile.write(str(adir / f"c{i}.wav"), 24000,
                      (rng.normal(0, 0.1, 2400) * 32767).astype(np.int16))
    out = tmp_path / "out"
    results, summary = main([
        "--audio_dir", str(adir), "--output_dir", str(out),
        "--tiny", "--batch_size", "2", "--nsamples", "3",
        "--eval_aug", "false", "--save_audio", "1",
    ])
    assert len(results) == 3
    assert (out / "audioseal_eval_results.csv").exists()
    assert list(summary) == ["identity/0"]
    assert 0.0 <= summary["identity/0"] <= 1.0
    assert (out / "audio_samples").exists()
