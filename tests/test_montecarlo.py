"""Sharded Monte-Carlo engine tests on the 8-device CPU mesh:
psum-reduced counters, layout bit-reproducibility, BER monotonicity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.config import (
    SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
from esn_ofdm_mimo_tpu.parallel import trials_mesh, run_nbf_curve
from esn_ofdm_mimo_tpu.parallel.montecarlo import make_sharded_nbf_step
from esn_ofdm_mimo_tpu.utils.rng import block_keys


def tiny_cfg(**kw):
    return SimConfig(
        name="tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4,
                        doppler_hz=3000.0),   # high doppler -> small L
        channel=ChannelConfig(kind="exp_pdp", n_tx=1, n_rx=1),
        esn=EsnConfig(n_reservoir=40),
        ldpc=LdpcConfig(max_iter=20, decode_every=2),
        ebno_db=(6.0, 18.0),
        **kw)


def test_mesh_has_8_devices():
    assert jax.device_count() == 8


def test_sharded_step_matches_single_device():
    """8-way sharded counts must equal a 1-device run on the same block ids."""
    cfg = tiny_cfg()
    keys = block_keys(jax.random.PRNGKey(0), 0, jnp.arange(8, dtype=jnp.uint32))

    full = make_sharded_nbf_step(cfg, trials_mesh(1))(jnp.float32(12.0), keys)
    shard = make_sharded_nbf_step(cfg, trials_mesh(8))(jnp.float32(12.0), keys)

    # channel/pilot/data randomness is per-block => bit-identical counters for
    # the detectors that don't involve the batch-shared ESN streams
    for det in ("zf_perfect", "zf_ls", "mmse"):
        assert int(full.bit_errors[det]) == int(shard.bit_errors[det]), det
    assert int(full.total_bits) == int(shard.total_bits)
    np.testing.assert_allclose(float(full.capacity_sum),
                               float(shard.capacity_sum), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.cond_hist),
                                  np.asarray(shard.cond_hist))
    # ESN detectors share a reservoir per local batch: statistically identical
    # but not bit-equal across layouts — sanity-band check instead
    for det in ("esn", "esn_fixed"):
        a = int(full.bit_errors[det]) / int(full.total_bits)
        b = int(shard.bit_errors[det]) / int(shard.total_bits)
        assert abs(a - b) < 0.1, (det, a, b)


def test_curve_runs_and_is_monotone():
    cfg = tiny_cfg()
    res = run_nbf_curve(cfg, blocks_per_snr=8, blocks_per_device=1,
                        mesh=trials_mesh(8), progress=None)
    for det in ("zf_perfect", "mmse"):
        assert res.ber[det][1] < res.ber[det][0], det  # BER falls with SNR
    assert np.all(res.capacity_per_sc > 0)
    assert res.total_bits[0] > 0 and res.total_info_bits[0] > 0
