"""Checkpoint + metrics utilities tests."""
import os
import numpy as np
import jax
import jax.numpy as jnp

from esn_ofdm_mimo_tpu.utils.model_io import save_pytree, load_pytree
from esn_ofdm_mimo_tpu.utils.checkpoint import SnrCheckpoint
from esn_ofdm_mimo_tpu.utils.metrics import MetricsLogger


def test_pytree_roundtrip(tmp_path):
    from esn_ofdm_mimo_tpu.models.esn import init_reservoir
    res = init_reservoir(jax.random.PRNGKey(0), 4, 2, 30)
    state = {"res": res, "calib": (jnp.arange(4.0), jnp.zeros(4)),
             "count": jnp.int32(7)}
    p = str(tmp_path / "ckpt.npz")
    save_pytree(p, state)
    out = load_pytree(p, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pytree_structure_mismatch(tmp_path):
    p = str(tmp_path / "c.npz")
    save_pytree(p, {"a": jnp.zeros(3)})
    try:
        load_pytree(p, {"b": (jnp.zeros(3), jnp.zeros(2))})
        assert False, "should raise"
    except ValueError:
        pass


def test_snr_checkpoint(tmp_path):
    ck = SnrCheckpoint(str(tmp_path / "snr"))
    assert not ck.has(0)
    ck.save(0, {"x": 1})
    assert ck.has(0)
    assert ck.load(0) == {"x": 1}


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "ev.jsonl")
    log = MetricsLogger(p, echo=False)
    log.log("test_event", a=1, b="x")
    log.close()
    import json
    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "test_event" and rec["a"] == 1


def test_debug_nan_checks_guard():
    """The dev-mode NaN guard raises at the first NaN and restores config."""
    import jax
    import jax.numpy as jnp
    import pytest
    from esn_ofdm_mimo_tpu.utils.metrics import debug_nan_checks

    prev = jax.config.jax_debug_nans
    with debug_nan_checks(True):
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()
    assert jax.config.jax_debug_nans == prev
