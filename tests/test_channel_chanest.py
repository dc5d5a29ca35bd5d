"""Channel model + estimation tests: lfilter-semantics FIR, tap statistics,
LS/MMSE estimation recovering the true channel in benign conditions."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal, interpolate

from esn_ofdm_mimo_tpu.ops import (
    exp_pdp, draw_exp_pdp_taps, draw_cdlb_taps, apply_fir_channel,
    taps_to_freq_response, ls_comb_estimate, mmse_refine_td,
    equalize_zf, equalize_mmse,
)


def test_exp_pdp_matches_reference_formula():
    isi = 8
    cp = isi - 1
    expect = np.exp(-np.arange(cp + 1) / (cp / 9))
    expect /= expect.sum()
    np.testing.assert_allclose(np.asarray(exp_pdp(isi)), expect, rtol=1e-6)


def test_fir_matches_scipy_lfilter():
    rng = np.random.default_rng(3)
    n_rx, n_tx, isi, T = 2, 3, 8, 50
    taps = (rng.standard_normal((n_rx, n_tx, isi))
            + 1j * rng.standard_normal((n_rx, n_tx, isi))).astype(np.complex64)
    x = (rng.standard_normal((n_tx, T))
         + 1j * rng.standard_normal((n_tx, T))).astype(np.complex64)
    y = np.asarray(apply_fir_channel(jnp.asarray(taps), jnp.asarray(x)))
    y_ref = np.zeros((n_rx, T), dtype=np.complex128)
    for r in range(n_rx):
        for t in range(n_tx):
            y_ref[r] += signal.lfilter(taps[r, t], [1.0], x[t])
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_fir_batched_leading_axes():
    rng = np.random.default_rng(4)
    taps = (rng.standard_normal((5, 2, 1, 4)) + 0j).astype(np.complex64)
    x = (rng.standard_normal((5, 1, 30)) + 0j).astype(np.complex64)
    y = apply_fir_channel(jnp.asarray(taps), jnp.asarray(x))
    assert y.shape == (5, 2, 30)
    y0 = apply_fir_channel(jnp.asarray(taps[0]), jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y0), rtol=1e-5)


def test_exp_pdp_tap_statistics():
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    taps = jax.vmap(lambda k: draw_exp_pdp_taps(k, 1, 1, 8))(keys)
    power = np.mean(np.abs(np.asarray(taps)) ** 2, axis=0)[0, 0]
    np.testing.assert_allclose(power, np.asarray(exp_pdp(8)), rtol=0.15)


def test_cdlb_taps_unit_power_and_shape():
    keys = jax.random.split(jax.random.PRNGKey(1), 100)
    taps = jax.vmap(lambda k: draw_cdlb_taps(k, 8, 4, 8, 2 * 1.024e6, 300.0))(keys)
    assert taps.shape == (100, 8, 4, 8)
    power = np.sum(np.abs(np.asarray(taps)) ** 2, axis=-1)
    np.testing.assert_allclose(power, 1.0, rtol=1e-4)


def test_taps_to_freq_response():
    rng = np.random.default_rng(5)
    c = (rng.standard_normal((1, 1, 8)) + 1j * rng.standard_normal((1, 1, 8))).astype(np.complex64)
    H = np.asarray(taps_to_freq_response(jnp.asarray(c), 64))
    expect = np.fft.fft(np.r_[c[0, 0], np.zeros(56)])
    np.testing.assert_allclose(H[:, 0, 0], expect, rtol=1e-4, atol=1e-4)


def test_comb_interp_matches_scipy():
    rng = np.random.default_rng(6)
    N, n_tx = 64, 4
    from esn_ofdm_mimo_tpu.ops.chanest import _interp_comb_linear
    for tx in range(n_tx):
        sc = np.arange(tx, N, n_tx)
        v = rng.standard_normal(len(sc)) + 1j * rng.standard_normal(len(sc))
        f = interpolate.interp1d(sc, v, kind="linear", bounds_error=False,
                                 fill_value="extrapolate")
        expect = f(np.arange(N))
        got = np.asarray(_interp_comb_linear(jnp.asarray(v.astype(np.complex64)),
                                             tx, n_tx, N))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_ls_estimate_recovers_true_channel_noiseless():
    """Noiseless comb LS on a smooth channel must land close to H_true."""
    rng = np.random.default_rng(7)
    N, n_tx, n_rx, isi = 64, 2, 2, 8
    taps = (rng.standard_normal((n_rx, n_tx, isi))
            + 1j * rng.standard_normal((n_rx, n_tx, isi))).astype(np.complex64) / np.sqrt(2 * isi)
    H_true = np.asarray(taps_to_freq_response(jnp.asarray(taps), N))
    # build comb pilot directly in frequency: X_comb[tx, sc] nonzero on its comb
    X_comb = np.zeros((n_tx, N), dtype=np.complex64)
    for tx in range(n_tx):
        X_comb[tx, tx::n_tx] = np.exp(1j * rng.uniform(0, 2 * np.pi, size=len(range(tx, N, n_tx))))
    sqrt_pi = 1.7
    # received freq-domain pilots: Y[rx, k] = sum_tx H[k,rx,tx] * X_comb[tx,k] * sqrt_pi
    Y = np.einsum("krt,tk->rk", H_true, X_comb) * sqrt_pi
    H_ls = np.asarray(ls_comb_estimate(jnp.asarray(Y), jnp.asarray(X_comb),
                                       sqrt_pi, n_tx))
    # on comb positions the estimate is exact; interpolation error is small for
    # an isi-limited channel sampled at N/n_tx >= 2*isi points
    err = np.abs(H_ls - H_true) / (np.abs(H_true) + 1e-9)
    assert np.median(err) < 0.15


def test_mmse_refine_shrinks_noise():
    rng = np.random.default_rng(8)
    N, isi = 64, 8
    taps = (rng.standard_normal((1, 1, isi)) * np.sqrt(np.asarray(exp_pdp(isi)))).astype(np.complex64)
    H_true = np.asarray(taps_to_freq_response(jnp.asarray(taps), N))
    noise = 0.3 * (rng.standard_normal(H_true.shape) + 1j * rng.standard_normal(H_true.shape))
    H_noisy = (H_true + noise).astype(np.complex64)
    H_mmse = np.asarray(mmse_refine_td(jnp.asarray(H_noisy), isi, 1e-5, 1e-3))
    err_ls = np.linalg.norm(H_noisy - H_true)
    err_mmse = np.linalg.norm(H_mmse - H_true)
    assert err_mmse < err_ls  # TD truncation + shrinkage must help


def test_equalizers_recover_noiseless():
    rng = np.random.default_rng(9)
    n_rx, n_tx, N = 4, 2, 32
    H = (rng.standard_normal((N, n_rx, n_tx))
         + 1j * rng.standard_normal((N, n_rx, n_tx))).astype(np.complex64)
    x = (rng.standard_normal((N, n_tx)) + 1j * rng.standard_normal((N, n_tx))).astype(np.complex64)
    sqrt_pi = 2.0
    y = np.einsum("krt,kt->kr", H, x) * sqrt_pi
    x_zf = np.asarray(equalize_zf(jnp.asarray(y), jnp.asarray(H), sqrt_pi))
    np.testing.assert_allclose(x_zf, x, rtol=1e-2, atol=1e-3)
    x_mmse = np.asarray(equalize_mmse(jnp.asarray(y), jnp.asarray(H), sqrt_pi, 1e-9))
    np.testing.assert_allclose(x_mmse, x, rtol=1e-2, atol=1e-3)


def test_channel_freq_correlation():
    from esn_ofdm_mimo_tpu.ops.chanest import channel_freq_correlation
    pdp = np.asarray(exp_pdp(8))
    R = np.asarray(channel_freq_correlation(jnp.asarray(pdp), 32))
    # Hermitian, unit diagonal (pdp sums to 1), Toeplitz
    np.testing.assert_allclose(R, R.conj().T, atol=1e-5)
    np.testing.assert_allclose(np.diag(R), 1.0, atol=1e-5)
    np.testing.assert_allclose(R[0, 1], R[1, 2], atol=1e-5)
    # matches E[H_k H_l^*] for the exp-PDP channel ensemble (Monte Carlo)
    rng = np.random.default_rng(0)
    acc = np.zeros((32, 32), dtype=complex)
    for _ in range(3000):
        c = (rng.standard_normal(8) + 1j * rng.standard_normal(8)) / np.sqrt(2)
        c *= np.sqrt(pdp)
        H = np.fft.fft(np.r_[c, np.zeros(24)])
        acc += np.outer(H, H.conj())
    np.testing.assert_allclose(acc / 3000, R, atol=0.1)


def test_capacity_closed_form_identity_channel():
    """Capacity metric vs closed form: H = I (n x n) gives
    sum_k log2(1 + gamma * 1) with gamma = (Pi/No)/n_tx."""
    from esn_ofdm_mimo_tpu.ops.analytics import channel_svd_metrics
    n = 4
    H = jnp.broadcast_to(jnp.eye(n, dtype=jnp.complex64), (8, n, n))[None]
    pi, No = 2e-4, 1e-5
    met = channel_svd_metrics(H, jnp.asarray(pi), No)
    gamma = (pi / No) / n
    expect = n * np.log2(1 + gamma)
    np.testing.assert_allclose(np.asarray(met.capacity_per_sc), expect,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(met.rank), n)
    np.testing.assert_allclose(np.asarray(met.cond), 1.0, rtol=1e-4)


def test_factored_equalizer_matches_persc():
    """equalizer_weights + apply_equalizer == equalize_persc broadcast over D
    (the factored path is the hot one in pipelines/common.detect_data_symbols)."""
    from esn_ofdm_mimo_tpu.ops.equalize import (
        equalize_persc, equalizer_weights, apply_equalizer)
    rng = np.random.default_rng(10)
    B, D, n_rx, n_tx, N = 3, 5, 8, 4, 16
    H = (rng.standard_normal((B, N, n_rx, n_tx))
         + 1j * rng.standard_normal((B, N, n_rx, n_tx))).astype(np.complex64)
    Y = (rng.standard_normal((B, D, n_rx, N))
         + 1j * rng.standard_normal((B, D, n_rx, N))).astype(np.complex64)
    sqrt_pi = 1.7
    for reg in (1e-12, 0.23):
        ref = np.asarray(equalize_persc(
            jnp.asarray(Y), jnp.asarray(H)[:, None], sqrt_pi,
            noise_over_power=None if reg == 1e-12 else reg))
        We = equalizer_weights(jnp.asarray(H), jnp.float32(reg))
        fast = np.asarray(apply_equalizer(We, jnp.asarray(Y), sqrt_pi))
        np.testing.assert_allclose(fast, ref, rtol=2e-4, atol=2e-5)


def test_tdl_profiles_a_c():
    """TDL-A/C extensions: unit power, determinism, distinct mean delay
    profiles (A/B/C have different delay tables), and the B profile equals
    the draw_cdlb_taps wrapper exactly."""
    from esn_ofdm_mimo_tpu.ops.channel import draw_tdl_taps, TDL_PROFILES
    k = jax.random.PRNGKey(7)
    out = {}
    for p in ("a", "b", "c"):
        taps = draw_tdl_taps(k, 2, 1, 8, 2 * 1.024e6, 300.0, profile=p)
        assert taps.shape == (2, 1, 8)
        np.testing.assert_allclose(
            np.sum(np.abs(np.asarray(taps)) ** 2, axis=-1), 1.0, rtol=1e-4)
        again = draw_tdl_taps(k, 2, 1, 8, 2 * 1.024e6, 300.0, profile=p)
        np.testing.assert_array_equal(np.asarray(taps), np.asarray(again))
        out[p] = np.asarray(taps)
    assert not np.allclose(out["a"], out["b"])
    assert not np.allclose(out["b"], out["c"])
    np.testing.assert_array_equal(
        out["b"],
        np.asarray(draw_cdlb_taps(k, 2, 1, 8, 2 * 1.024e6, 300.0)))
    # per-tap mean power matches each table's analytic profile
    # E|h_i|^2 ∝ sum_p pow_lin[p] * S[p, i]^2 (independent per-path gains;
    # the per-link unit-power renormalisation preserves the shape)
    from esn_ofdm_mimo_tpu.ops.channel import _tdl_split_matrix
    keys = jax.random.split(jax.random.PRNGKey(8), 1500)
    for p in ("a", "b", "c"):
        t = jax.vmap(lambda kk: draw_tdl_taps(kk, 1, 1, 8, 2 * 1.024e6,
                                              300.0, profile=p))(keys)
        pw = np.mean(np.abs(np.asarray(t)) ** 2, axis=0)[0, 0]
        pow_lin = 10.0 ** (TDL_PROFILES[p][1] / 10.0)
        S = _tdl_split_matrix(p, 8, 2 * 1.024e6, 300.0)
        expect = (pow_lin[:, None] * S**2).sum(axis=0)
        corr = np.corrcoef(pw, expect)[0, 1]
        assert corr > 0.99, (p, corr, pw, expect)


@pytest.mark.slow
def test_cdl_a_c_pipeline_kinds():
    """kind='cdl_a'/'cdl_c' run end-to-end through the block pipeline."""
    import dataclasses
    from esn_ofdm_mimo_tpu.config import (
        SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
    from esn_ofdm_mimo_tpu.pipelines.cdl import run_cdl_cal_blocks
    from esn_ofdm_mimo_tpu.utils.rng import block_keys
    for kind in ("cdl_a", "cdl_c"):
        cfg = SimConfig(
            name=f"tiny_{kind}",
            ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4,
                            doppler_hz=3000.0),
            channel=ChannelConfig(kind=kind, n_tx=1, n_rx=2),
            esn=EsnConfig(n_reservoir=24, train_ebno_fixed_db=None),
            ldpc=LdpcConfig(max_iter=5),
            ebno_db=(12.0,))
        keys = block_keys(jax.random.PRNGKey(0), 0,
                          jnp.arange(2, dtype=jnp.uint32))
        out = run_cdl_cal_blocks(cfg, jnp.float32(12.0), keys)
        errs = int(out.bit_errors["mmse"])
        tot = int(out.total_bits)
        assert 0 <= errs <= tot and tot > 0
