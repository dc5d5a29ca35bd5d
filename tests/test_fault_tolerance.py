"""Fault-injection: a round that fails transiently must be retried exactly."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.parallel import trials_mesh
from esn_ofdm_mimo_tpu.parallel.montecarlo import (
    make_sharded_nbf_step, run_nbf_curve)
from tests.test_montecarlo import tiny_cfg


@pytest.mark.slow
def test_round_retry_recovers():
    cfg = tiny_cfg()
    mesh = trials_mesh(8)

    calls = {"n": 0}

    def flaky_factory(cfg_, mesh_):
        real = make_sharded_nbf_step(cfg_, mesh_)

        def step(ebno, keys):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected chaos: device shard dropped")
            return real(ebno, keys)

        return step

    res = run_nbf_curve(cfg, blocks_per_snr=8, blocks_per_device=1,
                        mesh=mesh, progress=None, step_factory=flaky_factory)
    # first attempt failed, retry succeeded; curve intact
    assert calls["n"] >= 2
    assert res.total_bits[0] > 0

    # and the result equals a non-flaky run (retry is exact re-execution)
    res2 = run_nbf_curve(cfg, blocks_per_snr=8, blocks_per_device=1,
                         mesh=mesh, progress=None)
    for det in res.ber:
        np.testing.assert_allclose(res.ber[det], res2.ber[det])
