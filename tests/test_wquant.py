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
