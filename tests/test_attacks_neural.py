"""Neural compression codec bank + DiffPure at tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.augmentations import compressai_jax as cj
from wmar_tpu.augmentations.diffpure import ADMConfig, ADMUNet, DiffPure, linear_betas
from wmar_tpu.augmentations.neural import (
    REFERENCE_CODEC_NAMES,
    NeuralCompression,
    RandomWeightsError,
    build_codec_bank,
    init_compressai_params,
)

TINY_ADM = ADMConfig(
    image_size=16, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(8,), num_head_channels=16, diffusion_steps=50,
)


@pytest.mark.parametrize("arch", list(cj.FORWARDS))
def test_codec_roundtrip_tiny(arch, rng):
    nc = NeuralCompression.from_name(f"{arch}-q=3", tiny=(8, 12))
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    rec = nc(x)
    assert rec.shape == x.shape
    rec2, bpp = nc(x, return_bpp=True)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))
    assert np.isfinite(float(bpp)) and float(bpp) >= 0
    a = np.asarray(rec)
    assert a.min() >= 0 and a.max() <= 1


def test_refuses_random_weights():
    with pytest.raises(RandomWeightsError):
        NeuralCompression.from_name("bmshj2018-factorized-q=3")
    with pytest.raises(RandomWeightsError):
        NeuralCompression.from_name("cheng2020-attn-q=6", weights_dir="/nonexistent")


def test_allow_random_tags_codec(capsys):
    nc = NeuralCompression.from_name("bmshj2018-factorized-q=1", allow_random=True)
    assert nc.random_weights
    assert "RANDOM" in capsys.readouterr().out


def test_build_codec_bank_skips_missing(capsys):
    bank = build_codec_bank(names=REFERENCE_CODEC_NAMES[:2], weights_dir=None)
    assert bank == {}
    out = capsys.readouterr().out
    assert "skipping codec" in out


def test_codec_loads_raw_checkpoint(tmp_path, rng):
    """A compressai-layout .pth in weights_dir converts and loads."""
    torch = pytest.importorskip("torch")
    from tests.test_compressai_parity import FactorizedPrior

    torch.manual_seed(0)
    model = FactorizedPrior(8, 12)
    torch.save(model.state_dict(), tmp_path / "bmshj2018-factorized-q=1.pth")
    # tiny dims don't match zoo N/M, but conversion is shape-driven
    nc = NeuralCompression.from_name(
        "bmshj2018-factorized-q=1", weights_dir=str(tmp_path)
    )
    assert not nc.random_weights
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 64, 3)).astype(np.float32))
    model.eval()
    with torch.no_grad():
        ref, _ = model(torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(nc(x)), np.clip(ref.numpy().transpose(0, 2, 3, 1), 0, 1), atol=2e-4
    )


def test_diffusers_kl_vae_tiny(rng):
    nc = NeuralCompression.from_name("diffusers-sd-vae-ft-ema", tiny=(0, 0))
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    rec, bpp = nc(x, return_bpp=True)
    assert rec.shape == x.shape
    assert float(bpp) == 2.0


def test_diffusers_flux_no_quant_conv(rng):
    nc = NeuralCompression.from_name("diffusers-flux", tiny=(0, 0))
    assert "quant_conv" not in nc.params
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    assert nc(x).shape == x.shape


def test_dc_ae_dispatch(rng):
    """DC-AE completes the 22-codec bank: the diffusers-deep-compression name
    dispatches to the EfficientViT port and refuses silent random weights."""
    with pytest.raises(RandomWeightsError, match="no weights"):
        NeuralCompression.from_name("diffusers-deep-compression")
    nc = NeuralCompression.from_name("diffusers-deep-compression", tiny=(0, 0))
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32))
    out, bpp = nc(x, return_bpp=True)
    assert out.shape == x.shape
    assert float(bpp) == 1.0  # the reference's nominal DC-AE bpp


def test_init_params_match_converted_shapes():
    """Random init must be shape-identical to converted checkpoints so
    msgpack restore works."""
    torch = pytest.importorskip("torch")
    from tests.test_compressai_parity import Cheng2020Attention, JointAutoregressive

    for arch, ctor, nm in [
        ("mbt2018", lambda: JointAutoregressive(8, 12), (8, 12)),
        ("cheng2020-attn", lambda: Cheng2020Attention(8), (8, 8)),
    ]:
        torch.manual_seed(0)
        sd = {k: v.detach().numpy() for k, v in ctor().state_dict().items()}
        converted = cj.convert_compressai(sd, arch)
        inited = init_compressai_params(0, arch, *nm)
        c_shapes = jax.tree.map(lambda a: np.shape(a), converted)
        i_shapes = jax.tree.map(lambda a: np.shape(a), inited)
        assert c_shapes == i_shapes, arch


def test_adm_unet_shapes(rng):
    unet = ADMUNet(TINY_ADM)
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32))
    t = jnp.array([5, 20], dtype=jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(params, x, t)
    assert out.shape == (2, 16, 16, 6)  # eps + learned variance


def test_diffpure_runs_and_stays_in_range(rng):
    unet = ADMUNet(TINY_ADM)
    x01 = jnp.asarray(rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32))
    params = unet.init(jax.random.PRNGKey(0), x01 * 2 - 1, jnp.array([0]))
    dp = DiffPure(unet, params, steps=0.1)
    out = jax.jit(lambda x, r: dp(x, 0.1, r))(x01, jax.random.PRNGKey(1))
    assert out.shape == x01.shape
    a = np.asarray(out)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert not np.allclose(a, np.asarray(x01), atol=1e-3)


def test_betas_schedule():
    b = linear_betas(1000)
    assert b[0] == pytest.approx(1e-4, rel=1e-6)
    assert b[-1] == pytest.approx(0.02, rel=1e-6)
    assert (np.diff(b) > 0).all()
