"""HiDDeN baseline port: torch-oracle parity through the TorchScript path.

The oracle restates the public stable_signature ``hidden/models.py``
architecture (ConvBNRelu stacks; encoder tiles the message and concats
[msgs, features, image]; decoder pools to num_bits + linear), is scripted to
a real ``.pt`` archive, and loaded back through the SAME path the reference
blobs would take (``torch.jit.load -> state_dict -> converter``), mirroring
``syncseal/syncseal/evals/baselines.py:16-76``.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from wmar_tpu.sync import hidden as H  # noqa: E402
from wmar_tpu.sync.baselines import build_baseline  # noqa: E402


class ConvBNRelu(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, padding=1),
            nn.BatchNorm2d(cout),
            nn.GELU(),
        )

    def forward(self, x):
        return self.layers(x)


class HiddenEncoder(nn.Module):
    def __init__(self, num_blocks, num_bits, channels, last_tanh=True):
        super().__init__()
        layers = [ConvBNRelu(3, channels)]
        for _ in range(num_blocks - 1):
            layers.append(ConvBNRelu(channels, channels))
        self.conv_bns = nn.Sequential(*layers)
        self.after_concat_layer = ConvBNRelu(channels + 3 + num_bits, channels)
        self.final_layer = nn.Conv2d(channels, 3, 1)
        self.last_tanh = last_tanh

    def forward(self, imgs, msgs):
        msgs = msgs.unsqueeze(-1).unsqueeze(-1)
        msgs = msgs.expand(-1, -1, imgs.size(-2), imgs.size(-1))
        encoded = self.conv_bns(imgs)
        concat = torch.cat([msgs, encoded, imgs], dim=1)
        out = self.final_layer(self.after_concat_layer(concat))
        return torch.tanh(out) if self.last_tanh else out


class HiddenDecoder(nn.Module):
    def __init__(self, num_blocks, num_bits, channels):
        super().__init__()
        layers = [ConvBNRelu(3, channels)]
        for _ in range(num_blocks - 1):
            layers.append(ConvBNRelu(channels, channels))
        layers.append(ConvBNRelu(channels, num_bits))
        layers.append(nn.AdaptiveAvgPool2d(output_size=(1, 1)))
        self.layers = nn.Sequential(*layers)
        self.linear = nn.Linear(num_bits, num_bits)

    def forward(self, imgs):
        x = self.layers(imgs).squeeze(-1).squeeze(-1)
        return self.linear(x)


@pytest.fixture(scope="module")
def scripted_pair(tmp_path_factory):
    torch.manual_seed(3)
    enc = HiddenEncoder(num_blocks=2, num_bits=6, channels=8)
    dec = HiddenDecoder(num_blocks=3, num_bits=6, channels=8)
    # non-trivial BN running stats so the inference-stats path is exercised
    with torch.no_grad():
        for m in list(enc.modules()) + list(dec.modules()):
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    enc.eval(), dec.eval()
    d = tmp_path_factory.mktemp("hidden")
    ep, dp = str(d / "enc.pt"), str(d / "dec.pt")
    torch.jit.script(enc).save(ep)
    torch.jit.script(dec).save(dp)
    return enc, dec, ep, dp


def test_encoder_decoder_parity_via_torchscript(scripted_pair):
    enc, dec, ep, dp = scripted_pair
    enc_p, dec_p, enc_cfg, dec_cfg = H.load_hidden_torchscript(ep, dp)
    assert enc_cfg.num_bits == 6 and enc_cfg.channels == 8 and enc_cfg.enc_blocks == 2
    assert dec_cfg.num_bits == 6 and dec_cfg.dec_blocks == 4  # 3 + bits block

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    msgs = (rng.integers(0, 2, (2, 6)) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        out_ref = enc(torch.from_numpy(x), torch.from_numpy(msgs)).numpy()
        bits_ref = dec(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    out = H.hidden_encoder_forward(jax.tree.map(jnp.asarray, enc_p), enc_cfg,
                                   xj, jnp.asarray(msgs))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), out_ref, atol=2e-5)
    bits = H.hidden_decoder_forward(jax.tree.map(jnp.asarray, dec_p), dec_cfg, xj)
    np.testing.assert_allclose(np.asarray(bits), bits_ref, atol=2e-5)


def test_build_baseline_hidden_end_to_end(scripted_pair):
    """Full wrapper semantics (normalize, scaling_w=0.2, zero-col detect)
    through build_baseline with the scripted blobs."""
    _, _, ep, dp = scripted_pair
    bl = build_baseline("hidden", params_path=f"{ep},{dp}", img_size=16)
    assert bl.nbits == 6 and bl.scaling_w == 0.2
    rng = jax.random.PRNGKey(0)
    msgs = bl.get_random_msg(rng, 2)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    out = bl.embed(imgs, msgs)
    assert out["imgs_w"].shape == imgs.shape
    assert np.all(np.asarray(out["imgs_w"]) >= 0) and np.all(np.asarray(out["imgs_w"]) <= 1)
    det = bl.detect(out["imgs_w"])
    assert det["preds"].shape == (2, 7)  # 1 + nbits (zero detection column)
    np.testing.assert_array_equal(np.asarray(det["preds"][:, 0]), 0.0)


def test_hidden_random_weights_smoke():
    bl = build_baseline("hidden", allow_random=True, nbits=4, img_size=8)
    imgs = jnp.ones((1, 8, 8, 3)) * 0.5
    out = bl.embed(imgs, jnp.asarray([[1, 0, 1, 0]]))
    det = bl.detect(out["imgs_w"])
    assert det["preds"].shape == (1, 5)


def test_hidden_stub_requires_weights():
    with pytest.raises(ValueError, match="TorchScript blobs"):
        build_baseline("hidden")
