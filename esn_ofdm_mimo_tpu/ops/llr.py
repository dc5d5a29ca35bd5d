"""Max-log LLRs and decision-directed noise-variance estimation.

Reference Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:66-88:
  LLR_b = (min_{s: b(s)=1} |z-s|^2 - min_{s: b(s)=0} |z-s|^2) / sigma^2
  (positive LLR => bit 0 more likely)
  sigma^2 = mean |z - harddecision(z)|^2 + 1e-12

TPU execution: the column-major square-QAM constellation is separable
(const[i*P + j] = pam[i] + 1j*pam[j], LSB-first labels => bits [0, m/2)
encode the imaginary PAM index j and bits [m/2, m) the real index i), and
in the max-log difference the other axis's min cancels exactly:
  b in the j-group:  LLR_b = (min_{j: b=1} (Im z - pam_j)^2
                              - min_{j: b=0} (Im z - pam_j)^2) / sigma^2
so both LLRs and sigma^2 reduce to two P-point PAM problems — 4x less
distance work at 16-QAM and no (..., M, m) masked-min temporaries
(~1.2 GB of HBM traffic per flagship decode batch with the generic form).
Exactness is locked by tests/test_llr.py against the generic M-point form.
"""
from __future__ import annotations

import jax.numpy as jnp

from .qam import qam_constellation, qam_bit_labels, pam_axis_points


def _pam_min_d2(x: jnp.ndarray, bits_per_symbol: int):
    """Per-axis distances: x real (...,) -> (..., P) squared distances."""
    pam = pam_axis_points(bits_per_symbol)
    return (x[..., None] - pam) ** 2


def est_sigma2_from_decision(z: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Decision-directed sigma^2 over the last axis. Returns (...,) scalar(s)."""
    m = bits_per_symbol
    if m % 2 == 0:
        err2 = (jnp.min(_pam_min_d2(z.real, m), axis=-1)
                + jnp.min(_pam_min_d2(z.imag, m), axis=-1))
        return jnp.mean(err2, axis=-1) + 1e-12
    const = qam_constellation(m)
    d2 = jnp.abs(z[..., None] - const) ** 2
    err2 = jnp.min(d2, axis=-1)
    return jnp.mean(err2, axis=-1) + 1e-12


def _pam_llrs(d2: jnp.ndarray, half_bits: int) -> jnp.ndarray:
    """d2 (..., P) per-axis distances -> (..., half_bits) max-log LLRs for
    the natural-binary LSB-first labelling of the PAM index."""
    labels = qam_bit_labels(half_bits)          # (P, half_bits)
    is1 = labels.astype(bool)
    big = jnp.asarray(jnp.inf, dtype=d2.dtype)
    d0 = jnp.min(jnp.where(is1, big, d2[..., None]), axis=-2)
    d1 = jnp.min(jnp.where(is1, d2[..., None], big), axis=-2)
    return d1 - d0


def qam_llrs_maxlog(z: jnp.ndarray, sigma2, bits_per_symbol: int) -> jnp.ndarray:
    """Max-log LLRs. z (..., n_sym); sigma2 broadcastable to (...).

    Returns (..., n_sym, m) with LLR = (d1_min - d0_min)/max(sigma2, 1e-12).
    """
    m = bits_per_symbol
    s2 = jnp.maximum(jnp.asarray(sigma2)[..., None, None], 1e-12)
    if m % 2 == 0:
        h = m // 2
        llr_im = _pam_llrs(_pam_min_d2(z.imag, m), h)   # bits [0, h)
        llr_re = _pam_llrs(_pam_min_d2(z.real, m), h)   # bits [h, m)
        return jnp.concatenate([llr_im, llr_re], axis=-1) / s2
    const = qam_constellation(m)
    labels = qam_bit_labels(m)  # (M, m)
    d2 = jnp.abs(z[..., None] - const) ** 2  # (..., n_sym, M)
    big = jnp.asarray(jnp.inf, dtype=d2.dtype)
    is1 = labels.astype(bool)  # (M, m)
    d0 = jnp.min(jnp.where(is1, big, d2[..., None]), axis=-2)
    d1 = jnp.min(jnp.where(is1, d2[..., None], big), axis=-2)
    return (d1 - d0) / s2
