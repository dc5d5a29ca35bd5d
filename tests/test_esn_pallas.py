"""Pallas ESN kernels vs the XLA-scan reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.models.esn import (
    EsnReservoir, EsnScale, esn_fit, esn_predict, esn_states)
from esn_ofdm_mimo_tpu.models.esn_pallas import (
    esn_predict_pallas, esn_states_pallas, predict_viable, states_viable)


def _mk(B=3, T=40, n_res=50, n_in=4, n_out=2, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.uniform(-0.5, 0.5, (n_res, n_res)).astype(np.float32)
    W *= 0.9 / np.max(np.abs(np.linalg.eigvals(W.astype(np.float64)))).astype(np.float32)
    res = EsnReservoir(
        Wt=jnp.asarray(W.T),
        W_in_t=jnp.asarray(rng.uniform(-1, 1, (n_res, n_in)).astype(np.float32).T),
        W_fb_t=jnp.asarray(rng.uniform(-1, 1, (n_res, n_out)).astype(np.float32).T),
        noise=jnp.float32(0.0))
    scale = EsnScale(jnp.float32(0.1), jnp.float32(0.0), jnp.float32(1e-2))
    X = jnp.asarray(rng.standard_normal((B, T, n_in)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((B, T, n_out)).astype(np.float32))
    return res, scale, X, D


def test_states_kernel_matches_scan():
    res, scale, X, D = _mk()
    key = jax.random.PRNGKey(0)
    S_ref = esn_states(res, scale, X, D * 1e-2, key)
    S_pl = esn_states_pallas(res, scale, X, D * 1e-2, key, interpret=True)
    np.testing.assert_allclose(np.asarray(S_pl), np.asarray(S_ref),
                               atol=2e-5, rtol=1e-4)


def test_predict_kernel_matches_scan():
    res, scale, X, D = _mk()
    key = jax.random.PRNGKey(1)
    Wt_out = esn_fit(res, scale, X, D, 5, key)
    P_ref = esn_predict(res, scale, Wt_out, X, 5, key)
    P_pl = esn_predict_pallas(res, scale, Wt_out, X, 5, key, interpret=True)
    np.testing.assert_allclose(np.asarray(P_pl), np.asarray(P_ref),
                               atol=1e-4, rtol=1e-3)


def test_predict_kernel_large_batch_chunks():
    """B spanning several BC=128 grid chunks must still match."""
    res, scale, X, D = _mk(B=4, T=30)
    key = jax.random.PRNGKey(2)
    Wt_out = esn_fit(res, scale, X, D, 3, key)
    # tile to 150 rows (2 chunks, ragged tail)
    reps = 40
    Xb = jnp.tile(X, (reps, 1, 1))[:150]
    Wb = jnp.tile(Wt_out, (reps, 1, 1))[:150]
    P_ref = esn_predict(res, scale, Wb, Xb, 3, key)
    P_pl = esn_predict_pallas(res, scale, Wb, Xb, 3, key, interpret=True)
    np.testing.assert_allclose(np.asarray(P_pl), np.asarray(P_ref),
                               atol=1e-4, rtol=1e-3)


def test_predict_kernel_grouped_readouts(monkeypatch):
    """Grouped Wt_out (Dg rows share a readout) through the opt-in masked
    MXU-dot kernel must match the XLA grouped esn_predict — including
    group boundaries inside a BC chunk and padding lanes past B."""
    monkeypatch.setenv("ESN_TPU_PREDICT_READOUT", "grouped")
    res, scale, X, D = _mk(B=3, T=30)
    key = jax.random.PRNGKey(3)
    Wt_out = esn_fit(res, scale, X, D, 3, key)       # (3, F, n_out)
    Dg = 50                                          # P = 128//50 + 2 = 4
    Xb = jnp.repeat(X, Dg, axis=0)                   # (150, T, n_in) grouped
    P_ref = esn_predict(res, scale, Wt_out, Xb, 3, key)
    P_pl = esn_predict_pallas(res, scale, Wt_out, Xb, 3, key, interpret=True)
    np.testing.assert_allclose(np.asarray(P_pl), np.asarray(P_ref),
                               atol=1e-4, rtol=1e-3)


def test_viability_checks():
    # flagship CDL predict shape fits; an enormous one doesn't
    assert predict_viable(592, 138, 300, 16, 8)
    assert not predict_viable(592, 5000, 2048, 16, 8)
    assert states_viable(8, 138, 300, 16, 8)
