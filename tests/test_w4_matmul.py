"""Pallas w4a16 matmul kernel (ops/w4_matmul.py) — interpret-mode parity.

The kernel's contract is numerical agreement with the XLA grouped-int4
route (`wquant.matmul4_xla`) on the same packed operand: identical
dequantized weights, so the only divergence allowed is bf16 accumulation
order. CPU tests run the kernel in interpret mode (WMAR_W4_INTERPRET)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from wmar_tpu.ops import wquant
from wmar_tpu.ops.w4_matmul import matmul_w4_pallas, w4_kernel_eligible


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("WMAR_W4_INTERPRET", "1")
    monkeypatch.setenv("WMAR_W4_KERNEL", "1")  # kernel is opt-in by default


def _quantized(rng, k, n):
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    return wquant.quantize_matrix_int4(w, group=128), w


@pytest.mark.parametrize("m,k,n", [(5, 256, 128), (12, 256, 256), (3, 128, 384)])
def test_kernel_matches_xla_route(m, k, n):
    rng = np.random.default_rng(0)
    qs, _ = _quantized(rng, k, n)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    want = np.asarray(wquant.matmul4_xla(x, qs), np.float32)
    got = np.asarray(matmul_w4_pallas(x, qs["q4"], qs["s4"]), np.float32)
    assert got.shape == want.shape
    # same int4 weights; bf16 scale/accum ordering differs -> ~1% of scale
    tol = 0.02 * np.abs(want).max() + 1e-2
    np.testing.assert_allclose(got, want, atol=tol)


def test_kernel_vs_dequantized_reference():
    rng = np.random.default_rng(1)
    qs, w = _quantized(rng, 256, 128)
    recon = (np.asarray(wquant.unpack_int4(qs["q4"]), np.float32)
             * np.asarray(qs["s4"], np.float32)[:, None, :]).reshape(256, 128)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    want = x @ recon
    got = np.asarray(matmul_w4_pallas(jnp.asarray(x), qs["q4"], qs["s4"]),
                     np.float32)
    # x cast to bf16 inside the kernel: ~0.4% relative on a 256-deep dot
    np.testing.assert_allclose(got, want, atol=0.03 * np.abs(want).max() + 1e-2)


def test_leading_dims_and_dtype():
    rng = np.random.default_rng(2)
    qs, _ = _quantized(rng, 128, 128)
    x = jnp.asarray(rng.normal(size=(2, 3, 128)), jnp.bfloat16)
    y = matmul_w4_pallas(x, qs["q4"], qs["s4"])
    assert y.shape == (2, 3, 128) and y.dtype == jnp.bfloat16
    flat = matmul_w4_pallas(x.reshape(6, 128), qs["q4"], qs["s4"])
    np.testing.assert_array_equal(np.asarray(y.reshape(6, 128), np.float32),
                                  np.asarray(flat, np.float32))


def test_dispatcher_routes_to_kernel_in_interpret_mode():
    rng = np.random.default_rng(3)
    qs, _ = _quantized(rng, 256, 128)
    x = jnp.asarray(rng.normal(size=(2, 256)), jnp.bfloat16)
    assert w4_kernel_eligible(x.shape, qs["q4"].shape)
    via_dispatch = np.asarray(wquant.matmul4(x, qs), np.float32)
    via_kernel = np.asarray(matmul_w4_pallas(x, qs["q4"], qs["s4"]), np.float32)
    np.testing.assert_array_equal(via_dispatch, via_kernel)


def test_eligibility_gates():
    rng = np.random.default_rng(4)
    qs, _ = _quantized(rng, 256, 128)
    # N not a multiple of 128 -> ineligible (XLA fallback)
    assert not w4_kernel_eligible((2, 256), (2, 64, 120))
    os.environ["WMAR_W4_KERNEL"] = "0"
    try:
        assert not w4_kernel_eligible((2, 256), qs["q4"].shape)
    finally:
        del os.environ["WMAR_W4_KERNEL"]
