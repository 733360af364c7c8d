"""RCC GAN branch: discriminator parity vs the reference PatchGAN, loss
wiring (adaptive weight, adopt_weight gating) in the train step.

Reference: deps/taming/modules/losses/vqperceptual.py:13-113,
deps/taming/modules/discriminator/model.py:17-67.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.finetune import RCCConfig, TamingRCCAdapter, init_state, make_optimizer, make_train_step
from wmar_tpu.finetune.gan import (
    GanConfig,
    adaptive_weight,
    adopt_weight,
    convert_taming_discriminator,
    discriminator_forward,
    hinge_d_loss,
    init_taming_discriminator,
    vanilla_d_loss,
)
from wmar_tpu.models import TamingVQGAN, VQGANConfig

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

TINY_VQ = VQGANConfig(
    resolution=32, ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
    z_channels=32, n_embed=64, embed_dim=16,
)


@pytest.fixture(scope="module")
def adapter():
    model = TamingVQGAN(TINY_VQ)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return TamingRCCAdapter(model, variables)


def test_discriminator_parity_vs_reference():
    torch = pytest.importorskip("torch")
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.append(ref)  # APPEND: never shadow repo modules
    from deps.taming.modules.discriminator.model import NLayerDiscriminator, weights_init

    torch.manual_seed(0)
    disc = NLayerDiscriminator(input_nc=3, ndf=16, n_layers=3).apply(weights_init)
    # Non-trivial running stats (a trained discriminator's BN is not
    # identity): one train-mode forward updates them.
    disc.train()
    with torch.no_grad():
        disc(torch.randn(4, 3, 64, 64))
    disc.eval()

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = disc(x).numpy()

    sd = {k: v.numpy() for k, v in disc.state_dict().items()}
    params = convert_taming_discriminator(sd, prefix="main.")
    got = np.asarray(discriminator_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=2e-4)


def test_d_losses_match_reference_formulas():
    torch = pytest.importorskip("torch")
    r = np.random.default_rng(0).normal(size=(2, 1, 6, 6)).astype(np.float32)
    f = np.random.default_rng(1).normal(size=(2, 1, 6, 6)).astype(np.float32)
    tr, tf = torch.tensor(r), torch.tensor(f)
    want_h = 0.5 * (torch.mean(torch.nn.functional.relu(1.0 - tr))
                    + torch.mean(torch.nn.functional.relu(1.0 + tf)))
    want_v = 0.5 * (torch.mean(torch.nn.functional.softplus(-tr))
                    + torch.mean(torch.nn.functional.softplus(tf)))
    assert np.isclose(float(hinge_d_loss(jnp.asarray(r), jnp.asarray(f))), float(want_h), atol=1e-6)
    assert np.isclose(float(vanilla_d_loss(jnp.asarray(r), jnp.asarray(f))), float(want_v), atol=1e-6)


def test_adopt_weight_gating():
    assert float(adopt_weight(1.0, 5, threshold=10)) == 0.0
    assert float(adopt_weight(1.0, 10, threshold=10)) == 1.0
    assert float(adopt_weight(0.5, 99, threshold=0)) == 0.5


def test_adaptive_weight_ratio():
    a = jnp.full((4, 4), 2.0)
    b = jnp.full((4, 4), 1.0)
    w = adaptive_weight(a, b, disc_weight=3.0)
    assert np.isclose(float(w), 3.0 * (8.0 / (4.0 + 1e-4)), rtol=1e-5)


def test_gan_train_step_runs_and_gates(adapter):
    cfg = RCCConfig(lr=1e-4, idem_weight=2.0)
    opt = make_optimizer(cfg)
    disc = init_taming_discriminator(jax.random.PRNGKey(7), ndf=8, n_layers=2)
    codes = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, TINY_VQ.n_embed)

    # disc_start far in the future: the GAN term must be gated to zero and
    # the loss must match the GAN-off step exactly.
    gated = make_train_step(adapter, cfg, "warmup", opt,
                            gan=GanConfig.create(disc, disc_start=10_000))
    plain = make_train_step(adapter, cfg, "warmup", opt)
    s0 = init_state(adapter, opt)
    _, m_gated = gated(s0, codes, jax.random.PRNGKey(2))
    _, m_plain = plain(s0, codes, jax.random.PRNGKey(2))
    assert float(m_gated["vqgan_gan_factor"]) == 0.0
    assert np.isclose(float(m_gated["loss"]), float(m_plain["loss"]), rtol=1e-6)

    # active GAN: loss includes d_weight * g_loss, all finite, step applies
    active = make_train_step(adapter, cfg, "warmup", opt,
                             gan=GanConfig.create(disc, disc_start=0))
    s1, m = active(s0, codes, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["vqgan_gan_weight"]))
    assert float(m["vqgan_gan_factor"]) == 1.0
    expected = (float(m_plain["loss"])
                + float(m["vqgan_gan_weight"]) * float(m["vqgan_gan_loss"]))
    assert np.isclose(float(m["loss"]), expected, rtol=1e-5)
    # params actually moved
    delta = jax.tree.reduce(
        lambda acc, t: acc + float(jnp.abs(t[0] - t[1]).sum()),
        jax.tree.map(lambda a, b: (a, b), s1.trainable, s0.trainable), 0.0)
    assert delta > 0.0


def test_finetune_cli_gan_smoke(tmp_path):
    import finetune

    finetune.main([
        "--tiny", "--synthetic", "16", "--nb_epochs", "1",
        "--batch_size_per_device", "2", "--augs", "none", "--no_validate",
        "--disc_init", "random", "--disc_start", "0",
        "--outdir", str(tmp_path),
    ])
    import json as _json

    with open(tmp_path / "history.json") as f:
        hist = _json.load(f)
    last = hist["epochs"][-1]["metrics"][-1]
    assert np.isfinite(last["loss"])
    assert "vqgan_gan_loss" in last
