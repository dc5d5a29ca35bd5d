"""Unrolled small-Cholesky solve vs numpy."""
import numpy as np
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.ops.linalg_mxu import chol_solve_small


def test_chol_solve_small_matches_numpy():
    rng = np.random.default_rng(0)
    M = rng.standard_normal((500, 12, 8)).astype(np.float32)
    A = np.einsum("bij,bik->bjk", M, M) + 0.05 * np.eye(8, dtype=np.float32)
    b = rng.standard_normal((500, 8, 2)).astype(np.float32)
    x = np.asarray(chol_solve_small(jnp.asarray(A), jnp.asarray(b)))
    expect = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, expect, rtol=5e-3, atol=5e-4)


def test_chol_solve_small_near_singular_stays_finite():
    A = np.zeros((1, 4, 4), dtype=np.float32) + 1e-12 * np.eye(4)
    b = np.ones((1, 4, 1), dtype=np.float32)
    x = np.asarray(chol_solve_small(jnp.asarray(A), jnp.asarray(b)))
    assert np.all(np.isfinite(x))
