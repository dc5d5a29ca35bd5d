"""Sequence-axis sharding primitives: FIR halo exchange + overlap-save scan.

The reference has no sequence parallelism (SURVEY.md §5 "Long-context"), but
two of its mechanics generalise to a sharded time axis and are built here as
reusable primitives:

  * `sharded_fir` — the causal FIR channel needs isi-1 halo samples at shard
    boundaries; the halo rides `jax.lax.ppermute` over the mesh axis (ICI on
    hardware), after which each shard's convolution is local.
  * `overlap_save_scan` — a stateful scan (the ESN recurrence) is split by
    re-running a `warmup`-sample prefix fetched from the left neighbour and
    discarding its outputs; this is exactly the reference's own
    `transient`/`nForgetPoints` overlap-discard mechanic (pyESN.py:191,
    helper_mimo_esn_generic.py:43) promoted to a parallel decomposition. The
    echo-state property (spectral radius < 1) bounds the truncation error.

Both are written to be used *inside* shard_map with a named mesh axis.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _left_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Fetch the last `halo` samples (time = last axis) from the left
    neighbour shard; shard 0 receives zeros (causal start)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    send = x[..., -halo:]
    # ring-shift right: shard i receives from shard i-1
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(send, axis_name, perm)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def sharded_fir(taps: jnp.ndarray, x: jnp.ndarray, axis_name: str
                ) -> jnp.ndarray:
    """Causal FIR over a time-sharded signal.

    taps (..., n_rx, n_tx, isi) replicated; x (..., n_tx, T_local) local time
    shard. Returns (..., n_rx, T_local) with lfilter semantics globally.
    """
    from ..ops.channel import apply_fir_channel
    isi = taps.shape[-1]
    if isi == 1:
        return apply_fir_channel(taps, x)
    halo = isi - 1
    ext = jnp.concatenate([_left_halo(x, halo, axis_name), x], axis=-1)
    y = apply_fir_channel(taps, ext)
    return y[..., halo:]


def overlap_save_scan(step_fn: Callable, init_state, xs: jnp.ndarray,
                      warmup: int, axis_name: str) -> jnp.ndarray:
    """Run a stateful scan over a time-sharded input with warmup re-run.

    step_fn(state, x_t) -> (state, y_t); xs (T_local, ...) local shard
    (time-major). Each shard prepends the `warmup` last inputs of its left
    neighbour, scans from `init_state`, and drops the warmup outputs.
    """
    send = xs[-warmup:]
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(send, axis_name, perm)
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
    ext = jnp.concatenate([halo, xs], axis=0)
    _, ys = jax.lax.scan(step_fn, init_state, ext)
    return ys[warmup:]
