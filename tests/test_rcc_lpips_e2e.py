"""RCC with REAL LPIPS: converter parity + loss-composition e2e.

Closes the round-4 gap "perceptual loss runs on the fallback in practice":

* full-geometry LPIPS forward parity against a torch oracle restating the
  reference's ``deps/taming/modules/losses/lpips.py`` (VGG16 slices,
  scaling layer, unit-normalize, 1x1 lin heads, spatial average) with
  RANDOM weights pushed through ``tools/convert_lpips.convert_lpips_arrays``
  — validating the exact converter path the published ``vgg.pth`` takes;
* one real RCC train step whose reported ``perceptual`` metric equals the
  torch LPIPS value on the same decoded pair — the reference's
  ``VQLPIPSWithDiscriminator`` generator composition with GAN off
  (``vqperceptual.py:33``, ``finetune.py:288-291``);
* a weights-gated run with the PUBLISHED converted checkpoint
  (``WMAR_LPIPS_WEIGHTS`` or ``lpips_vgg.msgpack``), skipped in this
  zero-egress environment, for whoever has the artifact.

These are slow-tier (full VGG16 geometry on CPU).
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
sys.path.insert(0, os.path.join(REPO, "tools"))

pytestmark = pytest.mark.slow

from convert_lpips import _VGG_TORCH_IDX, convert_lpips_arrays  # noqa: E402
from wmar_tpu.finetune.perceptual import LPIPS, PerceptualLoss  # noqa: E402

# reference lpips.py ScalingLayer constants
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _build_torch_vgg(seed=0):
    """torchvision-style VGG16 features Sequential (convs at the LPIPS
    indices), random weights."""
    torch.manual_seed(seed)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    return nn.Sequential(*layers).eval()


class TorchLPIPS(nn.Module):
    """The reference LPIPS forward (lpips.py:22-45) over the Sequential."""

    def __init__(self, feats, lins):
        super().__init__()
        self.feats = feats
        self.lins = lins  # list of [1, C, 1, 1] tensors
        # tap AFTER the relu following each _VGG_TORCH_IDX conv
        self.tap_after = [idxs[-1] + 1 for idxs in _VGG_TORCH_IDX]

    def forward(self, a, b):
        def taps(x):
            x = (x - _SHIFT) / _SCALE
            out = []
            for i, layer in enumerate(self.feats):
                x = layer(x)
                if i in self.tap_after:
                    out.append(x)
            return out

        fa, fb = taps(a), taps(b)
        total = 0.0
        for (xa, xb), lin in zip(zip(fa, fb), self.lins):
            na = xa / torch.sqrt((xa ** 2).sum(1, keepdim=True) + 1e-10)
            nb = xb / torch.sqrt((xb ** 2).sum(1, keepdim=True) + 1e-10)
            d = (na - nb) ** 2
            w = (d * lin).sum(1, keepdim=True)  # 1x1 conv, no bias
            total = total + w.mean(dim=(2, 3)).squeeze(1)
        return total  # [B]


@pytest.fixture(scope="module")
def converted():
    feats = _build_torch_vgg(seed=0)
    rng = np.random.default_rng(1)
    lins = [torch.tensor(np.abs(rng.normal(0, 0.05, (1, c, 1, 1))).astype(np.float32))
            for c in (64, 128, 256, 512, 512)]
    vgg_sd = {f"features.{i}.{kind}": p.detach().numpy()
              for i, layer in enumerate(feats)
              if isinstance(layer, nn.Conv2d)
              for kind, p in (("weight", layer.weight), ("bias", layer.bias))}
    params = convert_lpips_arrays(vgg_sd, [l.numpy() for l in lins])
    oracle = TorchLPIPS(feats, lins)
    return oracle, {"params": jax.tree.map(jnp.asarray, params)}


def test_lpips_forward_parity_full_geometry(converted):
    oracle, variables = converted
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = LPIPS().apply(variables, jnp.asarray(a.transpose(0, 2, 3, 1)),
                        jnp.asarray(b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)
    assert float(np.abs(ref).max()) > 1e-4  # non-vacuous


def test_rcc_step_composition_with_real_lpips(converted):
    """One real RCC train step with the converted LPIPS: the reported
    ``perceptual`` metric must equal the torch-LPIPS distance between the
    frozen-original and trainable decoder outputs (= the reference's
    drift-loss composition rec_l1 + LPIPS + w*idem, GAN off)."""
    oracle, variables = converted
    from wmar_tpu.finetune.rcc import (
        RCCConfig, TamingRCCAdapter, init_state, make_optimizer,
        make_train_step,
    )
    from wmar_tpu.models import TamingVQGAN, VQGANConfig

    vq_cfg = VQGANConfig(resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(), z_channels=32, n_embed=64,
                         embed_dim=16)
    vq = TamingVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    adapter = TamingRCCAdapter(vq, vq_params)
    cfg = RCCConfig(lr=1e-4, idem_weight=1.0)
    opt = make_optimizer(cfg)
    perceptual = PerceptualLoss(lpips_params=variables)
    step = make_train_step(adapter, cfg, "warmup", opt, perceptual=perceptual)
    state = init_state(adapter, opt)
    # perturb the trainable decoder so the drift pair differs (at init it
    # equals the frozen decoder and every drift term would be a vacuous 0)
    leaves, treedef = jax.tree.flatten(state.trainable["decoder"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    perturbed = jax.tree.unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)])
    state = state.replace(trainable=dict(state.trainable, decoder=perturbed))
    codes = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, 64)
    state2, metrics = step(state, codes, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

    # recompute the drift pair exactly as loss_fn does (warmup: no augs,
    # trainable decoder == frozen at step 0) and cross-check vs torch
    z_q = adapter.lookup(codes)
    xrec = adapter.decode(state.trainable["decoder"], z_q)
    xrec_orig = adapter.decode_orig(z_q)
    with torch.no_grad():
        p_ref = oracle(
            torch.from_numpy(np.asarray(xrec_orig).transpose(0, 3, 1, 2)),
            torch.from_numpy(np.asarray(xrec).transpose(0, 3, 1, 2)),
        ).numpy().mean()
    np.testing.assert_allclose(float(metrics["perceptual"]), p_ref,
                               atol=5e-5, rtol=1e-3)
    rec_l1 = float(jnp.abs(xrec_orig - xrec).mean())
    idem = float(metrics["idem"])
    np.testing.assert_allclose(
        float(metrics["loss"]), rec_l1 + p_ref + cfg.idem_weight * idem,
        rtol=1e-3)


_PUBLISHED = os.environ.get("WMAR_LPIPS_WEIGHTS",
                            os.path.join(REPO, "lpips_vgg.msgpack"))


@pytest.mark.skipif(not os.path.exists(_PUBLISHED),
                    reason="published LPIPS weights not present (zero egress); "
                           "set WMAR_LPIPS_WEIGHTS after tools/convert_lpips.py")
def test_rcc_step_with_published_lpips_weights():
    import flax.serialization

    from wmar_tpu.finetune.rcc import (
        RCCConfig, TamingRCCAdapter, init_state, make_optimizer,
        make_train_step,
    )
    from wmar_tpu.models import TamingVQGAN, VQGANConfig

    with open(_PUBLISHED, "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())
    vq_cfg = VQGANConfig(resolution=64, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(), z_channels=32, n_embed=64,
                         embed_dim=16)
    vq = TamingVQGAN(vq_cfg)
    vq_params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    adapter = TamingRCCAdapter(vq, vq_params)
    cfg = RCCConfig(lr=1e-4)
    opt = make_optimizer(cfg)
    step = make_train_step(adapter, cfg, "warmup", opt,
                           perceptual=PerceptualLoss(lpips_params=variables))
    state = init_state(adapter, opt)
    codes = jax.random.randint(jax.random.PRNGKey(1), (2, 1024), 0, 64)
    _, metrics = step(state, codes, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["perceptual"]) >= 0.0
