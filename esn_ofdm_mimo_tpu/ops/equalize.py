"""Per-subcarrier ZF/MMSE equalization as batched linear solves.

Reference OFDM_SISO_NBF_LDPC.py:41-53 (per-subcarrier Python loop :450-460 is
replaced by one batched `jnp.linalg.solve` over all subcarriers/batches):
  ZF:   solve(H^H H + 1e-12 I, H^H y) / sqrt(Pi)
  MMSE: solve(H^H H + (No/Pi) I, H^H y) / sqrt(Pi)
"""
from __future__ import annotations

import jax.numpy as jnp


def _regularized_solve(H: jnp.ndarray, y: jnp.ndarray, reg) -> jnp.ndarray:
    """solve(H^H H + reg*I, H^H y) batched over leading axes.

    H (..., n_rx, n_tx), y (..., n_rx), reg broadcastable scalar.
    """
    n_tx = H.shape[-1]
    Hh = jnp.conj(jnp.swapaxes(H, -1, -2))
    G = Hh @ H + jnp.asarray(reg)[..., None, None] * jnp.eye(n_tx, dtype=H.dtype)
    rhs = (Hh @ y[..., None])[..., 0]
    return jnp.linalg.solve(G, rhs[..., None])[..., 0]


def equalize_zf(Y: jnp.ndarray, H: jnp.ndarray, power_scale) -> jnp.ndarray:
    """Zero-forcing with tiny diagonal loading. Y (..., n_rx), H (..., n_rx, n_tx)."""
    x = _regularized_solve(H, Y, jnp.asarray(1e-12, dtype=jnp.float32))
    return x / jnp.asarray(power_scale)[..., None]


def equalize_mmse(Y: jnp.ndarray, H: jnp.ndarray, power_scale,
                  noise_over_power) -> jnp.ndarray:
    """LMMSE: diagonal loading by No/Pi."""
    x = _regularized_solve(H, Y, noise_over_power)
    return x / jnp.asarray(power_scale)[..., None]


def equalize_persc(Y: jnp.ndarray, H: jnp.ndarray, power_scale,
                   noise_over_power=None) -> jnp.ndarray:
    """Equalize a full OFDM symbol: Y (..., N, n_rx)?? — convenience wrapper.

    Y (..., n_rx, N) and H (..., N, n_rx, n_tx); returns X_hat (..., N, n_tx).
    ZF when noise_over_power is None, else MMSE.
    """
    Yk = jnp.moveaxis(Y, -2, -1)  # (..., N, n_rx)
    if noise_over_power is None:
        return equalize_zf(Yk, H, jnp.asarray(power_scale)[..., None])
    return equalize_mmse(Yk, H, jnp.asarray(power_scale)[..., None],
                         jnp.asarray(noise_over_power)[..., None])
