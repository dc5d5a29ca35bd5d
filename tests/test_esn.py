"""ESN engine tests against a float64 NumPy oracle implementing the reference
pyESN semantics (state recurrence, teacher forcing, pinv readout,
self-feedback prediction) with zero state noise for determinism."""
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.models.esn import (
    EsnReservoir, EsnScale, init_reservoir, esn_fit, esn_predict, esn_states,
    spectral_radius_power_iter,
)


class OracleESN:
    """Minimal float64 oracle of pyESN's math (noise=0)."""

    def __init__(self, W, W_in, W_fb, input_scaling, teacher_scaling):
        self.W, self.W_in, self.W_fb = W, W_in, W_fb
        self.in_scale, self.t_scale = input_scaling, teacher_scaling

    def harvest(self, X, D):
        T = X.shape[0]
        n = self.W.shape[0]
        u = X * self.in_scale
        d = D * self.t_scale
        S = np.zeros((T, n))
        for t in range(1, T):
            S[t] = np.tanh(self.W @ S[t - 1] + self.W_in @ u[t] + self.W_fb @ d[t - 1])
        return S, u, d

    def fit(self, X, D, n_forget):
        S, u, d = self.harvest(X, D)
        ext = np.hstack([S, u])
        self.W_out = (np.linalg.pinv(ext[n_forget:]) @ d[n_forget:]).T
        return self.W_out

    def predict(self, X, n_forget, s0=None, o0=None):
        T = X.shape[0]
        n = self.W.shape[0]
        u = X * self.in_scale
        s = np.zeros(n) if s0 is None else s0.copy()
        o = np.zeros(self.W_fb.shape[1]) if o0 is None else o0.copy()
        outs = []
        for t in range(T):
            s = np.tanh(self.W @ s + self.W_in @ u[t] + self.W_fb @ o)
            o = self.W_out @ np.concatenate([s, u[t]])
            outs.append(o)
        return np.array(outs)[n_forget:] / self.t_scale


def _mk(seed=0, n=40, n_in=2, n_out=2, T=120, in_scale=0.05, t_scale=5e-3):
    rng = np.random.default_rng(seed)
    W = rng.uniform(-0.5, 0.5, (n, n))
    W *= 0.9 / np.max(np.abs(np.linalg.eigvals(W)))
    W_in = rng.uniform(-1, 1, (n, n_in))
    W_fb = rng.uniform(-1, 1, (n, n_out))
    X = rng.standard_normal((T, n_in))
    D = rng.standard_normal((T, n_out))
    res = EsnReservoir(Wt=jnp.asarray(W.T, jnp.float32),
                       W_in_t=jnp.asarray(W_in.T, jnp.float32),
                       W_fb_t=jnp.asarray(W_fb.T, jnp.float32),
                       noise=jnp.float32(0.0))
    scale = EsnScale(jnp.float32(in_scale), jnp.float32(0.0), jnp.float32(t_scale))
    oracle = OracleESN(W, W_in, W_fb, in_scale, t_scale)
    return res, scale, oracle, X, D


def test_states_match_oracle():
    res, scale, oracle, X, D = _mk()
    S_o, _, _ = oracle.harvest(X, D)
    S = esn_states(res, scale, jnp.asarray(X, jnp.float32)[None],
                   jnp.asarray(D * 5e-3, jnp.float32)[None],
                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(S[0]), S_o, atol=2e-5)


def test_fit_matches_pinv_oracle():
    res, scale, oracle, X, D = _mk()
    W_out_o = oracle.fit(X, D, n_forget=10)
    Wt_out = esn_fit(res, scale, jnp.asarray(X, jnp.float32)[None],
                     jnp.asarray(D, jnp.float32)[None], 10, jax.random.PRNGKey(0))
    rel = (np.linalg.norm(np.asarray(Wt_out[0]).T - W_out_o)
           / np.linalg.norm(W_out_o))
    assert rel < 2e-3


def test_fit_pinv_mode_matches_numpy_pinv(monkeypatch):
    """ESN_TPU_READOUT=pinv is the reference-faithful ablation readout:
    unregularised SVD pseudo-inverse exactly like pyESN.fit (pyESN.py:191).
    It must track the float64 numpy-pinv oracle at least as closely as the
    production ridge solver."""
    from esn_ofdm_mimo_tpu.models import esn as esn_mod
    res, scale, oracle, X, D = _mk()
    W_out_o = oracle.fit(X, D, n_forget=10)
    monkeypatch.setattr(esn_mod, "_READOUT_IMPL", "pinv")
    Wt_out = esn_fit(res, scale, jnp.asarray(X, jnp.float32)[None],
                     jnp.asarray(D, jnp.float32)[None], 10,
                     jax.random.PRNGKey(0))
    rel = (np.linalg.norm(np.asarray(Wt_out[0]).T - W_out_o)
           / np.linalg.norm(W_out_o))
    assert rel < 2e-3, rel


def test_predict_matches_oracle():
    res, scale, oracle, X, D = _mk()
    oracle.fit(X, D, n_forget=10)
    Wt_out = esn_fit(res, scale, jnp.asarray(X, jnp.float32)[None],
                     jnp.asarray(D, jnp.float32)[None], 10, jax.random.PRNGKey(0))
    pred_o = oracle.predict(X, 10)
    pred = esn_predict(res, scale, Wt_out, jnp.asarray(X, jnp.float32)[None],
                       10, jax.random.PRNGKey(1))
    # f32 recurrence + solve vs f64 oracle: modest tolerance, correlation ~1
    err = np.linalg.norm(np.asarray(pred[0]) - pred_o) / np.linalg.norm(pred_o)
    assert err < 5e-2


def test_predict_continuation_matches_oracle():
    """continuation=True semantics: predict resumes from fit's laststate/
    lastoutput (pyESN.predict:234-237) instead of a zero carry."""
    res, scale, oracle, X, D = _mk()
    oracle.fit(X, D, n_forget=10)
    S_o, _, d_o = oracle.harvest(X, D)
    Wt_out, (laststate, lastout) = esn_fit(
        res, scale, jnp.asarray(X, jnp.float32)[None],
        jnp.asarray(D, jnp.float32)[None], 10, jax.random.PRNGKey(0),
        return_carry=True)
    np.testing.assert_allclose(np.asarray(laststate[0]), S_o[-1], atol=2e-5)
    np.testing.assert_allclose(np.asarray(lastout[0]), d_o[-1], atol=1e-6)

    X2 = X[::-1]  # fresh inputs for the continued run
    pred_o = oracle.predict(X2, 0, s0=S_o[-1], o0=d_o[-1])
    pred = esn_predict(res, scale, Wt_out, jnp.asarray(X2, jnp.float32)[None],
                       0, jax.random.PRNGKey(1),
                       init_carry=(laststate, lastout))
    err = np.linalg.norm(np.asarray(pred[0]) - pred_o) / np.linalg.norm(pred_o)
    assert err < 5e-2
    # and the carry genuinely changes the trajectory vs continuation=False
    pred_zero = esn_predict(res, scale, Wt_out,
                            jnp.asarray(X2, jnp.float32)[None],
                            0, jax.random.PRNGKey(1))
    assert np.linalg.norm(np.asarray(pred[0] - pred_zero[0])) > 1e-3


def test_batch_independence():
    """Row b of a batched fit must equal a single-sequence fit."""
    res, scale, _, X, D = _mk()
    X2 = np.stack([X, X[::-1]])
    D2 = np.stack([D, D[::-1]])
    W_batch = esn_fit(res, scale, jnp.asarray(X2, jnp.float32),
                      jnp.asarray(D2, jnp.float32), 10, jax.random.PRNGKey(0))
    W_single = esn_fit(res, scale, jnp.asarray(X2[1:], jnp.float32),
                       jnp.asarray(D2[1:], jnp.float32), 10, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(W_batch[1]), np.asarray(W_single[0]),
                               atol=1e-4, rtol=1e-2)


def test_spectral_radius_estimate():
    rng = np.random.default_rng(3)
    for n in (50, 200):
        W = rng.uniform(-0.5, 0.5, (n, n))
        true = np.max(np.abs(np.linalg.eigvals(W)))
        est = float(spectral_radius_power_iter(jnp.asarray(W, jnp.float32),
                                               jax.random.PRNGKey(0)))
        assert abs(est - true) / true < 0.03


def test_init_reservoir_properties():
    res = init_reservoir(jax.random.PRNGKey(0), 4, 2, 150,
                         spectral_radius=0.9, sparsity=0.1)
    W = np.asarray(res.Wt).T
    zeros = np.mean(W == 0)
    assert 0.05 < zeros < 0.15          # ~sparsity fraction zeroed
    radius = np.max(np.abs(np.linalg.eigvals(W.astype(np.float64))))
    assert abs(radius - 0.9) < 0.05     # rescaled to requested spectral radius
    assert np.all(np.abs(np.asarray(res.W_in_t)) <= 1.0)


def test_esn_learns_identity_channel():
    """End-to-end: ESN trained on a pilot through a mild 2-tap channel should
    track the transmit waveform (NMSE well below 1)."""
    from esn_ofdm_mimo_tpu.models.esn_mimo import (
        train_mimo_esn, esn_nmse)
    rng = np.random.default_rng(5)
    N, cp, d = 64, 7, 3
    T = N + cp
    x = (rng.standard_normal((1, 1, T)) + 1j * rng.standard_normal((1, 1, T))).astype(np.complex64)
    taps = np.array([1.0, 0.3], dtype=np.complex64)
    y = np.zeros_like(x)
    y[0, 0] = np.convolve(x[0, 0], taps)[:T]
    y += 0.01 * (rng.standard_normal(y.shape) + 1j * rng.standard_normal(y.shape)).astype(np.complex64)
    res = init_reservoir(jax.random.PRNGKey(2), 2, 2, 100,
                         spectral_radius=0.9, sparsity=0.1, noise=1e-3)
    scale = EsnScale(jnp.float32(0.5), jnp.float32(0.0), jnp.float32(5e-3))
    Wt_out = train_mimo_esn(res, scale, jnp.asarray(y), jnp.asarray(x), d, cp,
                            jax.random.PRNGKey(3))
    nmse = float(esn_nmse(res, scale, Wt_out, jnp.asarray(y), jnp.asarray(x),
                          d, cp, 8, jax.random.PRNGKey(4))[0])
    assert nmse < 0.1
