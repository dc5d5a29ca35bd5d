"""SISO-AWGN demo path (flat channel, CP=0, scalar LS) + delay-scan trainer."""
import pytest
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.config import (
    SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
from esn_ofdm_mimo_tpu.pipelines.blockfading import run_nbf_blocks
from esn_ofdm_mimo_tpu.utils.rng import block_keys


def _awgn_cfg(n=64, syms=17):
    return SimConfig(
        name="awgn_tiny",
        ofdm=OfdmConfig(n_subcarriers=n, bits_per_symbol=2,
                        bits_per_pilot_symbol=2, isi_duration=1,
                        coherence_override=syms),
        channel=ChannelConfig(kind="awgn_flat", n_tx=1, n_rx=1,
                              flat_scalar_ls=True),
        esn=EsnConfig(n_reservoir=64, min_delay=0, max_delay=0,
                      train_ebno_fixed_db=None),
        ldpc=LdpcConfig(max_iter=20, yobs_half=False, sigma2_mode="true_no"),
        ebno_db=(9.0, 21.0))


def test_siso_awgn_pipeline_runs_and_detects():
    cfg = _awgn_cfg()
    keys = block_keys(jax.random.PRNGKey(0), 0, jnp.arange(2, dtype=jnp.uint32))
    out = jax.jit(lambda e, k: run_nbf_blocks(
        cfg, e, k, detectors=("esn", "zf_perfect", "zf_ls", "mmse")))(
        jnp.float32(21.0), keys)
    ber = {k: float(v) / float(out.total_bits) for k, v in out.bit_errors.items()}
    # QPSK on a unit-magnitude flat channel at 21 dB: classical detectors
    # essentially error-free, ESN close behind
    assert ber["zf_perfect"] < 1e-2
    assert ber["mmse"] < 1e-2
    assert ber["zf_ls"] < 2e-2
    assert ber["esn"] < 0.2
    berc = {k: float(v) / max(float(out.total_info_bits), 1)
            for k, v in out.info_errors.items()}
    assert berc["mmse"] == 0.0


@pytest.mark.slow
def test_delay_scan_trainer_prefers_true_delay():
    """select_delay_by_nmse must pick a small delay for a causal channel."""
    from esn_ofdm_mimo_tpu.models.esn import init_reservoir, EsnScale
    from esn_ofdm_mimo_tpu.models.esn_mimo import select_delay_by_nmse
    rng = np.random.default_rng(0)
    T = 71
    x = (rng.standard_normal((1, 1, T)) + 1j * rng.standard_normal((1, 1, T))).astype(np.complex64)
    y = np.zeros_like(x)
    taps = np.array([1.0, 0.4, 0.2], dtype=np.complex64)
    y[0, 0] = np.convolve(x[0, 0], taps)[:T]
    res = init_reservoir(jax.random.PRNGKey(1), 2, 2, 80, 0.9, 0.1, 1e-3)
    scale = EsnScale(jnp.float32(0.5), jnp.float32(0.0), jnp.float32(5e-3))
    best, table = select_delay_by_nmse(res, scale, jnp.asarray(y),
                                       jnp.asarray(x), 0, 4, 7, 8,
                                       jax.random.PRNGKey(2))
    assert table.shape == (1, 5)
    assert np.all(np.isfinite(np.asarray(table)))
    # the best NMSE should be far below the worst (delay actually matters)
    t = np.asarray(table)[0]
    assert t.min() < 0.5 * t.max()
