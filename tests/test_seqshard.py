"""Sequence-sharding primitives vs unsharded oracles on the 8-device mesh."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from esn_ofdm_mimo_tpu.parallel.mesh import trials_mesh
from esn_ofdm_mimo_tpu.parallel.seqshard import sharded_fir, overlap_save_scan
from esn_ofdm_mimo_tpu.ops.channel import apply_fir_channel


def test_sharded_fir_matches_unsharded():
    rng = np.random.default_rng(0)
    n_rx, n_tx, isi, T = 2, 2, 8, 64 * 8
    taps = (rng.standard_normal((n_rx, n_tx, isi))
            + 1j * rng.standard_normal((n_rx, n_tx, isi))).astype(np.complex64)
    x = (rng.standard_normal((n_tx, T))
         + 1j * rng.standard_normal((n_tx, T))).astype(np.complex64)
    expect = np.asarray(apply_fir_channel(jnp.asarray(taps), jnp.asarray(x)))

    mesh = trials_mesh(8)
    f = jax.jit(jax.shard_map(
        lambda t, xx: sharded_fir(t, xx, "trials"), mesh=mesh,
        in_specs=(P(), P(None, "trials")), out_specs=P(None, "trials"),
        check_vma=False))
    got = np.asarray(f(jnp.asarray(taps), jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_overlap_save_scan_esn_like():
    """Sharded leaky recurrence with warmup re-run: interior outputs must
    match the unsharded scan closely (echo-state forgetting)."""
    rng = np.random.default_rng(1)
    n, T, warmup = 16, 64 * 8, 24
    W = rng.standard_normal((n, n)).astype(np.float32)
    W *= 0.7 / np.max(np.abs(np.linalg.eigvals(W)))   # fast forgetting
    xs = rng.standard_normal((T, n)).astype(np.float32)

    def step_fn(state, x):
        new = jnp.tanh(state @ jnp.asarray(W.T) + x)
        return new, new

    _, expect = jax.lax.scan(step_fn, jnp.zeros(n), jnp.asarray(xs))
    expect = np.asarray(expect)

    mesh = trials_mesh(8)
    f = jax.jit(jax.shard_map(
        lambda x: overlap_save_scan(step_fn, jnp.zeros(n), x, warmup, "trials"),
        mesh=mesh, in_specs=(P("trials"),), out_specs=P("trials"),
        check_vma=False))
    got = np.asarray(f(jnp.asarray(xs)))
    assert got.shape == expect.shape
    # first shard is exact; later shards converge after their warmup
    np.testing.assert_allclose(got[:64], expect[:64], atol=1e-5)
    err = np.abs(got - expect).max(axis=1)
    assert np.median(err) < 1e-3


@pytest.mark.slow
def test_seqshard_composed_rx_chain():
    """End-to-end long-waveform receive chain: a 64k-sample 2x2 stream runs
    through the time-sharded FIR channel into a time-sharded reservoir
    recurrence (the docs/SCALING.md composition for T >> N workloads) and
    matches the unsharded chain. FIR is exact; the recurrence matches to
    echo-state truncation on the warmup re-run."""
    rng = np.random.default_rng(7)
    n_rx, n_tx, isi = 2, 2, 8
    T, n_res, warmup = 2048 * 8, 32, 64
    taps = (rng.standard_normal((n_rx, n_tx, isi))
            + 1j * rng.standard_normal((n_rx, n_tx, isi))
            ).astype(np.complex64) / np.sqrt(2 * isi)
    x = (rng.standard_normal((n_tx, T))
         + 1j * rng.standard_normal((n_tx, T))).astype(np.complex64)
    W = rng.standard_normal((n_res, n_res)).astype(np.float32)
    W *= 0.8 / np.max(np.abs(np.linalg.eigvals(W)))
    W_in = rng.uniform(-1, 1, (2 * n_rx, n_res)).astype(np.float32)

    def step_fn(state, u):
        new = jnp.tanh(state @ jnp.asarray(W.T) + u @ jnp.asarray(W_in))
        return new, new

    def to_esn_input(y):                       # (n_rx, t) -> (t, 2*n_rx)
        return jnp.concatenate([y.real.T, y.imag.T], axis=-1)

    # unsharded oracle
    y_ref = apply_fir_channel(jnp.asarray(taps), jnp.asarray(x))
    _, s_ref = jax.lax.scan(step_fn, jnp.zeros(n_res), to_esn_input(y_ref))

    mesh = trials_mesh(8)

    def chain(t, xx):
        y = sharded_fir(t, xx, "trials")
        return overlap_save_scan(step_fn, jnp.zeros(n_res),
                                 to_esn_input(y), warmup, "trials")

    f = jax.jit(jax.shard_map(
        chain, mesh=mesh, in_specs=(P(), P(None, "trials")),
        out_specs=P("trials"), check_vma=False))
    got = np.asarray(f(jnp.asarray(taps), jnp.asarray(x)))
    ref = np.asarray(s_ref)
    assert got.shape == ref.shape
    err = np.abs(got - ref).max(axis=1)
    # exact on shard 0 (no truncation), echo-state-converged elsewhere
    np.testing.assert_allclose(got[:T // 8], ref[:T // 8], atol=1e-4)
    assert np.quantile(err, 0.99) < 1e-3, np.quantile(err, 0.99)
