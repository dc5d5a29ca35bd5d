"""Shared config + fused-from-root wrapper for the multi-process CDL test.

Both tests/distributed_worker.py (inside each jax.distributed process) and
tests/test_distributed.py (single-process reference) build the SAME program
from here, so the comparison is between device layouts only.

The wrapper takes ONLY a replicated root key: the per-block key arrays fold
on device (utils/rng.block_keys is jit-traceable), so no host-constructed
array ever needs cross-process sharding — the same trick the fused NBF grid
uses (parallel/montecarlo.make_fused_nbf_grid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.config import (CalibConfig, ChannelConfig, EsnConfig,
                                      LdpcConfig, OfdmConfig, SimConfig)

CAL_ROUNDS, DEC_ROUNDS = 1, 2


def cdl_cfg() -> SimConfig:
    return SimConfig(
        name="dist_cdl_tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4,
                        doppler_hz=3000.0),
        channel=ChannelConfig(kind="cdl_b", n_tx=2, n_rx=2,
                              delay_spread_ns=300.0),
        esn=EsnConfig(n_reservoir=40, train_ebno_fixed_db=None,
                      rng_mode="block"),
        ldpc=LdpcConfig(max_iter=10),
        calib=CalibConfig(enabled=True, cal_fraction=0.34, gd_steps=50),
        ebno_db=(12.0,))


def make_cdl_root_step(cfg: SimConfig, mesh):
    """(root key) -> (uncoded errs, total, decoded counters, calibrators),
    through the full fused CDL SNR program on `mesh`."""
    from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_cdl_snr_step
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    step = make_fused_cdl_snr_step(cfg, mesh)
    G = mesh.devices.size  # one block per device per round

    @jax.jit
    def run(root):
        ck = block_keys(root, 0, jnp.arange(CAL_ROUNDS * G,
                                            dtype=jnp.uint32))
        ck = ck.reshape(CAL_ROUNDS, G, *ck.shape[1:])
        dk = block_keys(root, 0, jnp.arange(CAL_ROUNDS * G,
                                            (CAL_ROUNDS + DEC_ROUNDS) * G,
                                            dtype=jnp.uint32))
        dk = dk.reshape(DEC_ROUNDS, G, *dk.shape[1:])
        return step(jnp.float32(12.0), ck, dk)

    return run
