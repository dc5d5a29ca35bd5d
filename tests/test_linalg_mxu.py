"""Custom-call-free linalg vs numpy references."""
import numpy as np
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.ops.linalg_mxu import (
    gauss_solve_real, solve_hermitian_small, pd_solve_ns, svdvals_small)


def test_gauss_solve_real():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((50, 8, 8)).astype(np.float32)
    A = A + 8 * np.eye(8, dtype=np.float32)   # well-conditioned
    b = rng.standard_normal((50, 8, 3)).astype(np.float32)
    x = np.asarray(gauss_solve_real(jnp.asarray(A), jnp.asarray(b)))
    expect = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, expect, rtol=2e-3, atol=2e-4)


def test_gauss_solve_needs_pivoting():
    A = np.array([[[0.0, 1.0], [1.0, 0.0]]], dtype=np.float32)
    b = np.array([[[2.0], [3.0]]], dtype=np.float32)
    x = np.asarray(gauss_solve_real(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [[[3.0], [2.0]]], atol=1e-5)


def test_solve_hermitian_small_complex():
    rng = np.random.default_rng(1)
    H = (rng.standard_normal((200, 8, 4))
         + 1j * rng.standard_normal((200, 8, 4))).astype(np.complex64)
    A = np.einsum("bij,bik->bjk", H.conj(), H) + 0.1 * np.eye(4)
    b = (rng.standard_normal((200, 4, 1))
         + 1j * rng.standard_normal((200, 4, 1))).astype(np.complex64)
    x = np.asarray(solve_hermitian_small(jnp.asarray(A), jnp.asarray(b)))
    expect = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, expect, rtol=5e-3, atol=5e-4)


def test_pd_solve_ns():
    rng = np.random.default_rng(2)
    F = 64
    M = rng.standard_normal((4, 200, F)).astype(np.float32)
    A = np.einsum("brf,brg->bfg", M, M) + 1e-3 * np.eye(F, dtype=np.float32)
    b = rng.standard_normal((4, F, 8)).astype(np.float32)
    x = np.asarray(pd_solve_ns(jnp.asarray(A), jnp.asarray(b), iters=40))
    expect = np.linalg.solve(A, b)
    rel = np.linalg.norm(x - expect) / np.linalg.norm(expect)
    assert rel < 1e-3, rel


def test_svdvals_small():
    rng = np.random.default_rng(3)
    H = (rng.standard_normal((64, 8, 4))
         + 1j * rng.standard_normal((64, 8, 4))).astype(np.complex64)
    s = np.asarray(svdvals_small(jnp.asarray(H)))
    expect = np.linalg.svd(H, compute_uv=False)
    np.testing.assert_allclose(s, expect, rtol=1e-3, atol=1e-3)
