"""Causality of the audio codec convs — the reference's ONLY unit tests
(``wmar_audio/moshi/modules/conv_test.py``, ``seanet_test.py``) check that
streaming chunked output equals full-sequence output. Our convs are
stateless causal (left-padded), so the equivalent property is: outputs at
time t do not depend on inputs after t."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.audio.mimi import CausalConv1d, CausalConvTranspose1d, SEANetEncoder, MimiConfig
from wmar_tpu.utils.logging import MetricLogger, encoder_drift


@pytest.mark.parametrize("kernel,stride,dilation", [(3, 1, 1), (7, 1, 2), (4, 2, 1), (8, 4, 1)])
def test_causal_conv_prefix_invariance(rng, kernel, stride, dilation):
    conv = CausalConv1d(8, kernel, stride=stride, dilation=dilation)
    x = jnp.asarray(rng.normal(size=(1, 64, 4)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)
    full = conv.apply(params, x)
    # perturb the future: outputs for earlier frames must not change
    x2 = x.at[:, 48:, :].set(0.0)
    part = conv.apply(params, x2)
    n_keep = 48 // stride
    np.testing.assert_allclose(
        np.asarray(full)[:, : n_keep - kernel, :],
        np.asarray(part)[:, : n_keep - kernel, :],
        atol=1e-6,
    )


def test_causal_transpose_prefix_invariance(rng):
    conv = CausalConvTranspose1d(4, 8, stride=4)
    x = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
    params = conv.init(jax.random.PRNGKey(0), x)
    full = conv.apply(params, x)
    x2 = x.at[:, 12:, :].set(0.0)
    part = conv.apply(params, x2)
    np.testing.assert_allclose(
        np.asarray(full)[:, : 4 * 10, :], np.asarray(part)[:, : 4 * 10, :], atol=1e-6
    )


def test_seanet_encoder_causal(rng):
    cfg = MimiConfig(dimension=16, n_filters=8, ratios=(4, 2), n_residual_layers=1,
                     n_q=2, n_q_semantic=1, cardinality=8, codebook_dim=8,
                     transformer_layers=1, transformer_heads=2, downsample=1)
    enc = SEANetEncoder(cfg)
    x = jnp.asarray(rng.normal(size=(1, 128, 1)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    full = enc.apply(params, x)
    x2 = x.at[:, 96:, :].set(0.0)
    part = enc.apply(params, x2)
    # frames strictly before the perturbation point are identical
    keep = 96 // 8 - 4
    np.testing.assert_allclose(
        np.asarray(full)[:, :keep, :], np.asarray(part)[:, :keep, :], atol=1e-5
    )


def test_metric_logger(tmp_path):
    log = MetricLogger(str(tmp_path), echo=False)
    log.scalars(1, "train", loss=0.5, idem=0.1)
    log.scalars(2, "train", loss=0.4, idem=0.05)
    log.image_panel(1, "rec", np.zeros((2, 8, 8, 3), np.float32))
    log.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    assert json.loads(lines[0])["loss"] == 0.5
    assert (tmp_path / "panels" / "000001_rec.png").exists()


def test_encoder_drift():
    a = {"w": np.zeros((2, 2))}
    b = {"w": np.ones((2, 2))}
    assert encoder_drift(a, b) == pytest.approx(2.0)
    assert encoder_drift(a, a) == 0.0
