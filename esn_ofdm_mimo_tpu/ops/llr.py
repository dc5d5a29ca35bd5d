"""Max-log LLRs and decision-directed noise-variance estimation.

Reference Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:66-88:
  LLR_b = (min_{s: b(s)=1} |z-s|^2 - min_{s: b(s)=0} |z-s|^2) / sigma^2
  (positive LLR => bit 0 more likely)
  sigma^2 = mean |z - harddecision(z)|^2 + 1e-12
"""
from __future__ import annotations

import jax.numpy as jnp

from .qam import qam_constellation, qam_bit_labels


def est_sigma2_from_decision(z: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Decision-directed sigma^2 over the last axis. Returns (...,) scalar(s)."""
    const = qam_constellation(bits_per_symbol)
    d2 = jnp.abs(z[..., None] - const) ** 2
    err2 = jnp.min(d2, axis=-1)
    return jnp.mean(err2, axis=-1) + 1e-12


def qam_llrs_maxlog(z: jnp.ndarray, sigma2, bits_per_symbol: int) -> jnp.ndarray:
    """Max-log LLRs. z (..., n_sym); sigma2 broadcastable to (...).

    Returns (..., n_sym, m) with LLR = (d1_min - d0_min)/max(sigma2, 1e-12).
    """
    m = bits_per_symbol
    const = qam_constellation(m)
    labels = qam_bit_labels(m)  # (M, m)
    d2 = jnp.abs(z[..., None] - const) ** 2  # (..., n_sym, M)
    big = jnp.asarray(jnp.inf, dtype=d2.dtype)
    # (..., n_sym, M, m) masked distances
    is1 = labels.astype(bool)  # (M, m)
    d0 = jnp.min(jnp.where(is1, big, d2[..., None]), axis=-2)
    d1 = jnp.min(jnp.where(is1, d2[..., None], big), axis=-2)
    s2 = jnp.maximum(jnp.asarray(sigma2)[..., None, None], 1e-12)
    return (d1 - d0) / s2
