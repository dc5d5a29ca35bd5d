"""CDL calibrated pipeline + preset registry + graft entry dryrun tests."""
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.config import (
    SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig, CalibConfig)
from esn_ofdm_mimo_tpu.experiments.presets import PRESETS, get_preset
from esn_ofdm_mimo_tpu.pipelines.cdl import fit_logreg_1d
from esn_ofdm_mimo_tpu.parallel import trials_mesh
from esn_ofdm_mimo_tpu.parallel.montecarlo import run_cdl_curve


def test_fit_logreg_recovers_slope():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float32) * 3
    true_a, true_b = -0.8, 0.3
    p = 1 / (1 + np.exp(-(true_a * x + true_b)))
    y = (rng.random(4000) < p).astype(np.float32)
    a, b = fit_logreg_1d(jnp.asarray(x), jnp.asarray(y), steps=800, lr=0.3)
    assert abs(float(a) - true_a) < 0.15
    assert abs(float(b) - true_b) < 0.15


def test_fit_logreg_vectorized_over_bits():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 2000)).astype(np.float32)
    y = (rng.random((4, 2000)) < 0.5).astype(np.float32)
    a, b = fit_logreg_1d(jnp.asarray(x), jnp.asarray(y), steps=50)
    assert a.shape == (4,) and b.shape == (4,)


def test_cdl_curve_tiny():
    cfg = SimConfig(
        name="cdl_tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4, doppler_hz=3000.0),
        channel=ChannelConfig(kind="cdl_b", n_tx=2, n_rx=4),
        esn=EsnConfig(n_reservoir=40, train_ebno_fixed_db=None),
        ldpc=LdpcConfig(max_iter=15),
        calib=CalibConfig(enabled=True, gd_steps=50),
        ebno_db=(15.0,))
    res = run_cdl_curve(cfg, blocks_per_snr=8, blocks_per_device=1,
                        mesh=trials_mesh(8), progress=None)
    r = res[0]
    assert 0 <= r["ber_uncoded"]["mmse"] < 0.5
    assert r["ber_coded"]["mmse"] <= r["ber_uncoded"]["mmse"] + 0.05
    # calibration slopes are negative (LLR convention), as in the reference's
    # committed LLR_calibration_params files (BASELINE.md §3)
    assert all(a < 0 for a in r["calib"]["mmse"][0])


def test_presets_construct():
    for name in PRESETS:
        cfg = get_preset(name, fast=True)
        assert cfg.ofdm.n_subcarriers * cfg.ofdm.bits_per_symbol % cfg.ldpc.dc == 0
        assert cfg.data_symbols_per_block >= 1


def test_preset_parameters_match_reference():
    cdl = get_preset("mimo_4x8_cdl")
    assert cdl.ofdm.n_subcarriers == 128
    assert cdl.channel.n_tx == 4 and cdl.channel.n_rx == 8
    assert cdl.esn.n_reservoir == 300
    assert cdl.ofdm.coherence_symbols == 75        # L = 75 @ N=128 (SURVEY §2.3)
    nbf = get_preset("siso_nbf")
    assert nbf.ofdm.coherence_symbols == 19        # L = 19 @ N=512
    assert nbf.esn.shared_delay(8) == 3            # shared delay d=3
    awgn = get_preset("siso_qpsk_awgn")
    assert awgn.ofdm.cp_len == 0
    assert awgn.esn.shared_delay(1) == 0


def test_graft_dryrun_multichip():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_newton_calibrator_fit_matches_gd_and_is_safe():
    """fit_method='newton' (backtracking Newton on the same penalized
    logistic MLE) equals GD@400 wherever GD has converged, never has a
    worse penalized NLL, and stays finite on separated cal sets
    (round 5; default stays 'gd' — the reference's fit semantics)."""
    import numpy as np
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.pipelines.cdl import (fit_logreg_1d,
                                                 fit_logreg_1d_newton)

    rng = np.random.default_rng(0)

    def pnll(a, b, x, y, l2=1e-3):
        z = a[:, None] * x + b[:, None]
        return (np.mean(np.log1p(np.exp(-np.abs(z)))
                        + np.maximum(z, 0) - y * z)
                + l2 / 2 * np.mean(a * a))

    for at, bt in ((0.8, 0.1), (0.3, 0.0), (0.05, 0.2)):
        x = rng.normal(0, 4.0, (4, 60000)).astype(np.float32)
        p = 1 / (1 + np.exp(-(at * x + bt)))
        y = (rng.random(x.shape) < p).astype(np.float32)
        ag, bg = map(np.asarray, fit_logreg_1d(jnp.asarray(x),
                                               jnp.asarray(y)))
        an, bn = map(np.asarray, fit_logreg_1d_newton(jnp.asarray(x),
                                                      jnp.asarray(y)))
        assert pnll(an, bn, x, y) <= pnll(ag, bg, x, y) + 1e-6
        # where GD converged (shallow slopes), the two agree tightly
        if at < 1.0:
            np.testing.assert_allclose(an, ag, atol=5e-3)
            np.testing.assert_allclose(bn, bg, atol=5e-3)

    # separated (deterministic) labels: no NaN/inf, still better NLL
    x = rng.normal(0, 4.0, (2, 20000)).astype(np.float32)
    y = (x > 0).astype(np.float32)
    an, bn = map(np.asarray, fit_logreg_1d_newton(jnp.asarray(x),
                                                  jnp.asarray(y)))
    assert np.isfinite(an).all() and np.isfinite(bn).all()
