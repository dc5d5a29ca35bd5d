"""OFDM modulation/demodulation with the reference's (unnormalised) FFT pair.

Conventions (reference OFDM_SISO_NBF_LDPC.py:413-428, SURVEY.md §2.3):
  TX:  x_td = N * ifft(X)           (so x_td = sum_k X_k e^{j2πkn/N})
  CP:  prepend last `cp` samples
  RX:  Y = (1/N) * fft(y[cp:])

All functions operate on the *last* axis being time/frequency unless noted and
broadcast over arbitrary leading batch axes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .fft_mxu import fft_mxu, ifft_mxu


def ofdm_modulate(X: jnp.ndarray, cp_len: int, power_scale=None) -> jnp.ndarray:
    """Frequency symbols (..., N) -> time-domain with CP (..., N+cp).

    power_scale (broadcastable to leading axes) multiplies the output, matching
    the reference's `* sqrt(Pi)` after CP insertion.
    """
    n = X.shape[-1]
    x = n * ifft_mxu(X, axis=-1)
    x_cp = add_cp(x, cp_len)
    if power_scale is not None:
        x_cp = x_cp * jnp.asarray(power_scale)[..., None]
    return x_cp


def ofdm_demodulate(y_cp: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    """Time-domain with CP (..., N+cp) -> frequency symbols (..., N)."""
    y = remove_cp(y_cp, cp_len)
    n = y.shape[-1]
    return fft_mxu(y, axis=-1) / n


def add_cp(x: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    if cp_len == 0:
        return x
    return jnp.concatenate([x[..., -cp_len:], x], axis=-1)


def remove_cp(y_cp: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    return y_cp[..., cp_len:]
