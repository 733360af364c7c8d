"""Unit tests for ops/wquant.py (weight-only int8 serving lever)."""

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.ops import wquant


def test_quantize_matrix_error_bound():
    """Per-output-channel absmax: reconstruction error <= scale/2 per entry
    (half a quantization step), i.e. <= |col|_max / 254."""
    w = np.random.default_rng(0).normal(size=(64, 48)).astype(np.float32)
    w[:, 7] *= 100.0  # one hot column must not poison the others' scales
    qs = wquant.quantize_matrix_int8(w)
    assert qs["q"].dtype == jnp.int8 and qs["q"].shape == w.shape
    assert qs["s"].shape == (48,)
    recon = np.asarray(qs["q"], np.float32) * np.asarray(qs["s"], np.float32)
    col_max = np.abs(w).max(axis=0)
    err = np.abs(recon - w)
    # bf16 scales add ~0.4% relative error on top of the half-step bound
    assert (err <= col_max / 254.0 + 0.01 * col_max).all()


def test_matmul_dispatch_close_to_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    exact = np.asarray(x @ w)
    quant = np.asarray(wquant.matmul(x, wquant.quantize_matrix_int8(w)))
    # int8 noise on a 64-deep contraction: well under 2% of the output scale
    assert np.abs(quant - exact).max() <= 0.02 * np.abs(exact).max() + 1e-3
    # plain-matrix dispatch is exact passthrough
    np.testing.assert_array_equal(np.asarray(wquant.matmul(x, w)), exact)


def test_linear_dispatch_and_compute_dtype():
    rng = np.random.default_rng(2)
    p = {"w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32))
    exact = np.asarray(wquant.linear(x, p))
    qp = wquant.quantize_linear_int8(p, compute_dtype=jnp.bfloat16)
    assert qp["b"].dtype == jnp.bfloat16
    got = np.asarray(wquant.linear(x, qp), np.float32)
    assert np.abs(got - exact).max() <= 0.05 * np.abs(exact).max() + 1e-2


def test_cast_float_leaves_preserves_int8():
    tree = {"a": jnp.ones((2,), jnp.float32),
            "q": jnp.ones((2, 2), jnp.int8),
            "i": jnp.ones((2,), jnp.int32)}
    out = wquant.cast_float_leaves(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["q"].dtype == jnp.int8
    assert out["i"].dtype == jnp.int32


def test_quantized_tree_jits_and_donates():
    """A quantized linear runs under jit with the tree as an argument."""
    rng = np.random.default_rng(3)
    p = wquant.quantize_linear_int8(
        {"w": rng.normal(size=(16, 8)).astype(np.float32),
         "b": np.zeros(8, np.float32)})
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    f = jax.jit(wquant.linear)
    np.testing.assert_allclose(np.asarray(f(x, p)), np.asarray(wquant.linear(x, p)))


# ---------------------------------------------------------------- int4 ----

def test_int4_pack_roundtrip_exact():
    """unpack(pack(q)) == q for every nibble value in [-7, 7]."""
    rng = np.random.default_rng(4)
    gc, group, n_out = 3, wquant.INT4_GROUP, 16
    w = rng.normal(size=(gc * group, n_out)).astype(np.float32)
    qs = wquant.quantize_matrix_int4(w)
    assert qs["q4"].dtype == jnp.uint8
    assert qs["q4"].shape == (gc, group // 2, n_out)
    assert qs["s4"].shape == (gc, n_out)
    unpacked = np.asarray(wquant.unpack_int4(qs["q4"]))
    assert unpacked.min() >= -7 and unpacked.max() <= 7
    # re-derive q from the float math and compare
    wg = w.reshape(gc, group, n_out)
    scale = np.abs(wg).max(axis=1) / 7.0
    q = np.clip(np.round(wg / np.maximum(scale[:, None, :], 1e-12)), -7, 7)
    np.testing.assert_array_equal(unpacked, q.astype(np.int32))


def test_int4_error_bound_per_group():
    """Grouped absmax: per-entry error <= its own group's half-step."""
    rng = np.random.default_rng(5)
    gc, group, n_out = 2, wquant.INT4_GROUP, 24
    w = rng.normal(size=(gc * group, n_out)).astype(np.float32)
    w[:group, 3] *= 50.0  # a hot group must not poison the other group's scale
    qs = wquant.quantize_matrix_int4(w)
    recon = (np.asarray(wquant.unpack_int4(qs["q4"]), np.float32)
             * np.asarray(qs["s4"], np.float32)[:, None, :])
    wg = w.reshape(gc, group, n_out)
    grp_max = np.abs(wg).max(axis=1)
    err = np.abs(recon - wg)
    # half a step = grp_max/14; bf16 scales add ~0.4% relative on top
    assert (err <= grp_max[:, None, :] / 14.0 + 0.01 * grp_max[:, None, :]).all()


def test_int4_matmul_matches_dequantized_reference():
    """matmul4's grouped partial-sum == x @ dequant(w) (same quant noise)."""
    rng = np.random.default_rng(6)
    n_in, n_out = 4 * wquant.INT4_GROUP, 40
    x = jnp.asarray(rng.normal(size=(5, n_in)).astype(np.float32))
    w = rng.normal(size=(n_in, n_out)).astype(np.float32)
    qs = wquant.quantize_matrix_int4(w)
    recon = (np.asarray(wquant.unpack_int4(qs["q4"]), np.float32)
             * np.asarray(qs["s4"], np.float32)[:, None, :]).reshape(n_in, n_out)
    want = np.asarray(x) @ recon
    got = np.asarray(wquant.matmul(x, qs), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # and it is a usable approximation of the exact product; int4 noise on a
    # 512-deep gaussian contraction: quant-error std/entry ~ (gmax/7)/sqrt(12)
    # ~ 0.14, dot error ~ sqrt(512)*0.14 ~ 3.2 -> bound at 5 sigma ~ 16
    exact = np.asarray(x @ jnp.asarray(w))
    assert np.abs(got - exact).max() <= 16.0


def test_int4_device_quantizer_agrees_with_host():
    rng = np.random.default_rng(7)
    w = rng.normal(size=(2 * wquant.INT4_GROUP, 16)).astype(np.float32)
    host = wquant.quantize_matrix_int4(w)
    dev = wquant.quantize_matrix_int4_device(w)
    np.testing.assert_array_equal(np.asarray(host["q4"]), np.asarray(dev["q4"]))
    np.testing.assert_array_equal(np.asarray(host["s4"], np.float32),
                                  np.asarray(dev["s4"], np.float32))


def test_int4_linear_dispatch_and_leading_dims():
    rng = np.random.default_rng(8)
    n_in, n_out = 2 * wquant.INT4_GROUP, 12
    p = {"w": jnp.asarray(rng.normal(size=(n_in, n_out)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(n_out,)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(2, 3, n_in)).astype(np.float32))
    exact = np.asarray(wquant.linear(x, p))
    qp = wquant.quantize_linear_int4(p, compute_dtype=jnp.bfloat16)
    assert qp["b"].dtype == jnp.bfloat16
    got = np.asarray(wquant.linear(x, qp), np.float32)
    assert got.shape == exact.shape
    # 256-deep contraction: dot-error ~ sqrt(256) * 0.14 ~ 2.3 -> 5 sigma
    assert np.abs(got - exact).max() <= 12.0


def test_int4_rejects_bad_group():
    w = np.zeros((100, 8), np.float32)  # 100 not divisible by 128
    try:
        wquant.quantize_matrix_int4(w)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError on indivisible n_in")


def test_int4_jits():
    rng = np.random.default_rng(9)
    qs = wquant.quantize_matrix_int4(
        rng.normal(size=(wquant.INT4_GROUP, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, wquant.INT4_GROUP)).astype(np.float32))
    f = jax.jit(wquant.matmul)
    np.testing.assert_allclose(np.asarray(f(x, qs)),
                               np.asarray(wquant.matmul(x, qs)), rtol=1e-6)
