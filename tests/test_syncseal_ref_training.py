"""Reference-spec SyncSeal training: hinge GAN + full valuemetric bank +
corner regression, dual optimizers, scaling_w schedule, detector-only phase
(train_sync.py:250-405 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wmar_tpu.sync import syncseal_models as sm
from wmar_tpu.sync.syncseal import (
    RefTrainConfig,
    SyncSealRef,
    evaluate_sync_ref,
    init_ref_train_state,
    make_ref_train_steps,
    sample_geometric_corners,
    scaling_w_at,
    valuemetric_branches,
)

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

TINY_UNET = sm.UNetConfig(in_channels=1, out_channels=1, z_channels=8,
                          num_blocks=1, z_channels_mults=(1, 2), norm_groups=4)
TINY_CN = sm.ConvNeXtConfig(depths=(1, 1), dims=(8, 16), out_dim=8)


@pytest.fixture(scope="module")
def tiny_model():
    return SyncSealRef.init(0, unet_cfg=TINY_UNET, convnext_cfg=TINY_CN)


class _NoPercep:
    def __call__(self, a, b):
        return ((a - b) ** 2).mean(axis=(1, 2, 3))


def test_train_steps_descend(tiny_model, rng):
    opt = optax.adam(2e-3)
    opt_d = optax.adam(2e-3)
    model_step, disc_step = make_ref_train_steps(
        tiny_model, opt, opt_d, RefTrainConfig(lambda_sync=5.0), perceptual=_NoPercep()
    )
    model_step = jax.jit(model_step)
    disc_step = jax.jit(disc_step)
    state = init_ref_train_state(tiny_model, opt, opt_d, seed=3)
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))
    first = None
    for i in range(8):
        k = jax.random.PRNGKey(i)
        state, m = model_step(state, imgs, k, jnp.float32(0.2), jnp.float32(1.0),
                              jnp.bool_(False))
        state, dm = disc_step(state, imgs, k, jnp.float32(0.2), jnp.float32(1.0))
        if first is None:
            first = float(m["transform"])
    assert float(m["transform"]) < first * 1.5  # noisy but not exploding
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(dm["disc_loss"]))


def test_detector_only_freezes_embedder(tiny_model, rng):
    opt, opt_d = optax.adam(1e-2), optax.adam(1e-2)
    model_step, _ = make_ref_train_steps(tiny_model, opt, opt_d,
                                         RefTrainConfig(), perceptual=_NoPercep())
    model_step = jax.jit(model_step)
    state = init_ref_train_state(tiny_model, opt, opt_d)
    imgs = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    unet_before = jax.tree.leaves(state[0]["unet"])[0].copy()
    state, _ = model_step(state, imgs, jax.random.PRNGKey(0), jnp.float32(0.2),
                          jnp.float32(1.0), jnp.bool_(True))
    unet_after = jax.tree.leaves(state[0]["unet"])[0]
    cn_delta = jnp.abs(
        jax.tree.leaves(state[0]["convnext"])[0]
        - jax.tree.leaves(init_ref_train_state(tiny_model, opt, opt_d)[0]["convnext"])[0]
    ).max()
    np.testing.assert_array_equal(np.asarray(unet_before), np.asarray(unet_after))
    assert float(cn_delta) > 0  # detector still trains


def test_scaling_schedule():
    cfg = RefTrainConfig(scaling_w=0.2, scaling_w_min=0.05, schedule_epochs=10)
    assert scaling_w_at(cfg, 0) == pytest.approx(0.2)
    assert scaling_w_at(cfg, 5) == pytest.approx(0.125)
    assert scaling_w_at(cfg, 10) == pytest.approx(0.05)
    assert scaling_w_at(cfg, 99) == pytest.approx(0.05)
    assert scaling_w_at(RefTrainConfig(), 7) == pytest.approx(0.2)


def test_valuemetric_bank_runs(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    for i, fn in enumerate(valuemetric_branches()):
        out = fn(imgs, jax.random.PRNGKey(i))
        assert out.shape == imgs.shape, i
        assert np.isfinite(np.asarray(out)).all(), i


def test_geometric_sampler_covers_families():
    outs = [np.asarray(sample_geometric_corners(jax.random.PRNGKey(i))) for i in range(40)]
    canon = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    n_ident = sum(np.allclose(o, canon, atol=1e-5) for o in outs)
    n_flip = sum(np.allclose(o[:, 0], 1 - canon[:, 0], atol=1e-5)
                 and np.allclose(o[:, 1], canon[:, 1], atol=1e-5) for o in outs)
    assert 0 < n_ident < 40
    assert n_flip > 0


def test_eval_grid_runs(tiny_model, rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    report = evaluate_sync_ref(tiny_model, imgs, jax.random.PRNGKey(0),
                               with_sift_baseline=True)
    assert "psnr" in report["quality"] and "ssim" in report["quality"]
    assert len(report["grid"]) == 12  # 3 strengths x 4 valuemetrics
    for row in report["grid"]:
        assert np.isfinite(row["corner_mae"])
        assert "sift_corner_mae" in row


def test_ref_model_save_load_roundtrip(tiny_model, tmp_path, rng):
    path = str(tmp_path / "syncref.msgpack")
    tiny_model.save(path)
    # load requires matching configs; reload manually with the tiny cfg
    from wmar_tpu.utils import checkpoint as ckpt

    state = ckpt.load_pytree(path, {"unet": tiny_model.unet_params,
                                    "convnext": tiny_model.convnext_params})
    clone = SyncSealRef(state["unet"], state["convnext"],
                        unet_cfg=TINY_UNET, convnext_cfg=TINY_CN)
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(clone.add_sync(imgs)), np.asarray(tiny_model.add_sync(imgs)), atol=1e-6
    )


def test_ref_model_load_torch_layout(tmp_path):
    """SyncSealRef.load_torch consumes the released embedder.unet/extractor
    state-dict naming."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from tests.test_syncseal_parity import TorchConvNeXt, TorchUNet

    class Wrapper(nn.Module):
        def __init__(self):
            super().__init__()
            emb = nn.Module()
            emb.unet = TorchUNet(TINY_UNET)
            self.embedder = emb
            self.extractor = TorchConvNeXt(TINY_CN)

    torch.manual_seed(0)
    w = Wrapper()
    path = tmp_path / "syncmodel.pth"
    torch.save(w.state_dict(), path)

    from wmar_tpu.sync import syncseal_models as smm
    from wmar_tpu.utils.convert import load_torch_state_dict

    sd = load_torch_state_dict(str(path))
    unet_p = smm.convert_unet(sd, TINY_UNET, prefix="embedder.unet.")
    cn_p = smm.convert_convnext(sd, TINY_CN, prefix="extractor.convnext.",
                                head_prefix="extractor.head.")
    model = SyncSealRef(unet_p, cn_p, unet_cfg=TINY_UNET, convnext_cfg=TINY_CN)
    imgs = jnp.zeros((1, 32, 32, 3))
    out = model.add_sync(imgs)
    assert out.shape == imgs.shape


def test_wam_corner_baseline_identity(rng):
    """WAM corner baseline (syncseal baselines.py WAMSyncModel): an identity
    estimate maps to the canonical corners; a flip estimate mirrors x."""
    from wmar_tpu.sync.syncseal import wam_corner_baseline

    class FakeSync:
        def __init__(self, info):
            self.info = info

        def estimate(self, img01):
            return self.info, None

    imgs = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32))
    ident = wam_corner_baseline(FakeSync((0, 127, 127, False)), imgs, image_size=256)
    np.testing.assert_allclose(
        ident[0].reshape(4, 2),
        [[-1, -1], [63 / 32 - 1, -1], [63 / 32 - 1, 63 / 32 - 1], [-1, 63 / 32 - 1]],
        atol=1e-5,
    )
    flipped = wam_corner_baseline(FakeSync((0, 127, 127, True)), imgs, image_size=256)
    np.testing.assert_allclose(flipped[0].reshape(4, 2)[:, 0],
                               -ident[0].reshape(4, 2)[:, 0][[1, 0, 3, 2]]
                               if False else [63 / 32 - 1, -1, -1, 63 / 32 - 1][0:4],
                               atol=1e-5)


def test_ref_training_dp_sharded(rng):
    """The reference-spec SyncSeal train step runs dp-sharded over the
    8-device mesh (the reference's DDP + SyncBatchNorm path)."""
    import optax

    from wmar_tpu.parallel import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    model = SyncSealRef.init(0, unet_cfg=TINY_UNET, convnext_cfg=TINY_CN)
    opt, opt_d = optax.adam(1e-3), optax.adam(1e-3)
    model_step, disc_step = make_ref_train_steps(model, opt, opt_d,
                                                 RefTrainConfig(), perceptual=_NoPercep())
    mesh = make_mesh(dp=len(jax.devices()), tp=1)
    state = init_ref_train_state(model, opt, opt_d)
    imgs = jnp.asarray(rng.uniform(0, 1, size=(len(jax.devices()), 32, 32, 3)).astype(np.float32))
    with jax.set_mesh(mesh):
        state = replicate(mesh, state)
        batch = shard_batch(mesh, imgs)
        state, m = jax.jit(model_step)(state, batch, jax.random.PRNGKey(0),
                                       jnp.float32(0.2), jnp.float32(1.0), jnp.bool_(False))
        state, dm = jax.jit(disc_step)(state, batch, jax.random.PRNGKey(1),
                                       jnp.float32(0.2), jnp.float32(1.0))
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(dm["disc_loss"]))
