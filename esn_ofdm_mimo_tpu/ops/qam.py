"""QAM constellation, bit labelling, mapping and hard demapping.

Conventions reproduced from the reference (SURVEY.md §2.3):
  * Square M-QAM built from a PAM grid, flattened column-major, normalised to
    unit average power (reference system_model_2/OFDM_SISO_NBF_LDPC.py:22-33).
  * Bit labelling is *natural binary, LSB-first* — the reference's
    `bits_to_grayvec` (:36-38) is not Gray despite its name. Symbol index is
    idx = sum_i bits[i] * 2^i.

All functions are shape-polymorphic over leading batch axes and jit-safe.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _constellation_np(bits_per_symbol: int) -> np.ndarray:
    """Unit-power square QAM constellation, column-major PAM ordering."""
    even_sqrt = int(np.ceil(np.sqrt(2.0**bits_per_symbol) / 2) * 2)
    pam = np.arange(-(even_sqrt - 1), even_sqrt, 2, dtype=np.float64)
    # C[j, i] = pam[i] + 1j*pam[j]; column-major flatten => index = i*PamM + j
    grid = pam[None, :] + 1j * pam[:, None]
    flat = grid.T.reshape(-1)  # column-major of grid == row-major of grid.T
    return (flat / np.sqrt(np.mean(np.abs(flat) ** 2))).astype(np.complex64)


def qam_constellation(bits_per_symbol: int) -> jnp.ndarray:
    """Return the (M,) complex64 unit-power constellation."""
    return jnp.asarray(_constellation_np(bits_per_symbol))


@functools.lru_cache(maxsize=None)
def _bit_labels_np(bits_per_symbol: int) -> np.ndarray:
    """(M, m) int32 matrix; row idx = natural-binary LSB-first bits of idx."""
    m = bits_per_symbol
    idx = np.arange(2**m, dtype=np.int64)
    return ((idx[:, None] >> np.arange(m)[None, :]) & 1).astype(np.int32)


def qam_bit_labels(bits_per_symbol: int) -> jnp.ndarray:
    return jnp.asarray(_bit_labels_np(bits_per_symbol))


def bits_to_symbols(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Map bits (..., n_sym * m) -> complex symbols (..., n_sym).

    LSB-first packing: idx = sum_i bits[..., k*m + i] * 2^i
    (reference OFDM_SISO_NBF_LDPC.py:399-404 via PowersOfTwo @ bits).
    """
    m = bits_per_symbol
    const = qam_constellation(m)
    *lead, nbits = bits.shape
    groups = bits.reshape(*lead, nbits // m, m)
    powers = (2 ** jnp.arange(m)).astype(jnp.int32)
    idx = jnp.sum(groups.astype(jnp.int32) * powers, axis=-1)
    return const[idx]


def pam_axis_points(bits_per_symbol: int) -> jnp.ndarray:
    """(P,) normalized PAM coordinates of the square-QAM grid (P = 2^(m/2)).

    The column-major constellation is separable: const[i*P + j] =
    pam[i] + 1j*pam[j], so per-axis distances decompose every nearest-point
    computation (demap / sigma^2 / max-log LLR) into two P-point problems —
    4x less distance work at 16-QAM and no (..., M, m) masked-min blowup.
    """
    m = bits_per_symbol
    assert m % 2 == 0
    P = 2 ** (m // 2)
    return qam_constellation(m)[:P].imag


def hard_demap_index(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Nearest-constellation-point index, per-PAM-axis argmin."""
    m = bits_per_symbol
    if m % 2 == 0:
        pam = pam_axis_points(m)
        P = pam.shape[0]
        i = jnp.argmin((symbols.real[..., None] - pam) ** 2, axis=-1)
        j = jnp.argmin((symbols.imag[..., None] - pam) ** 2, axis=-1)
        return i * P + j
    const = qam_constellation(m)
    d2 = jnp.abs(symbols[..., None] - const) ** 2
    return jnp.argmin(d2, axis=-1)


@functools.lru_cache(maxsize=None)
def _pam_gray(bits: tuple) -> float:
    """Gray-labelled PAM amplitude for an MSB-first bit tuple (3GPP / Sionna
    convention: recursively p(b) = (1-2 b0) * (2^(len-1) - p(b1:)))."""
    if len(bits) > 1:
        return (1 - 2 * bits[0]) * (2 ** (len(bits) - 1) - _pam_gray(bits[1:]))
    return float(1 - 2 * bits[0])


@functools.lru_cache(maxsize=None)
def _constellation_gray_np(bits_per_symbol: int) -> np.ndarray:
    """Unit-power Gray-labelled square QAM, system-model-1 convention.

    The reference's Sionna pipelines use `sionna.mapping.Mapper("qam", m)`
    (esn_ofdm_mimo_via_cdl.py:70): index bits MSB-first, even-position bits
    form the real PAM coordinate and odd-position bits the imaginary one,
    each Gray-labelled; normalized to unit average energy.
    """
    m = bits_per_symbol
    assert m % 2 == 0, "square QAM needs an even number of bits"
    pts = np.empty(2 ** m, dtype=np.complex128)
    for idx in range(2 ** m):
        b = tuple((idx >> (m - 1 - i)) & 1 for i in range(m))
        pts[idx] = _pam_gray(b[0::2]) + 1j * _pam_gray(b[1::2])
    return (pts / np.sqrt(np.mean(np.abs(pts) ** 2))).astype(np.complex64)


def qam_constellation_gray(bits_per_symbol: int) -> jnp.ndarray:
    """(M,) complex64 Gray/Sionna-convention unit-power constellation."""
    return jnp.asarray(_constellation_gray_np(bits_per_symbol))


@functools.lru_cache(maxsize=None)
def _bit_labels_msb_np(bits_per_symbol: int) -> np.ndarray:
    """(M, m) int32; row idx = natural-binary MSB-first bits of idx (the
    system-model-1 label convention, esn_ofdm_mimo_via_cdl.py:81-93)."""
    m = bits_per_symbol
    idx = np.arange(2 ** m, dtype=np.int64)
    shifts = np.arange(m - 1, -1, -1)
    return ((idx[:, None] >> shifts[None, :]) & 1).astype(np.int32)


def qam_bit_labels_msb(bits_per_symbol: int) -> jnp.ndarray:
    return jnp.asarray(_bit_labels_msb_np(bits_per_symbol))


def bits_to_symbols_gray(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Map bits (..., n_sym * m) -> Gray-QAM symbols (..., n_sym), MSB-first
    packing (system model 1: idx = sum_i bits[..., k*m + i] * 2^(m-1-i))."""
    m = bits_per_symbol
    const = qam_constellation_gray(m)
    *lead, nbits = bits.shape
    groups = bits.reshape(*lead, nbits // m, m)
    powers = (2 ** jnp.arange(m - 1, -1, -1)).astype(jnp.int32)
    idx = jnp.sum(groups.astype(jnp.int32) * powers, axis=-1)
    return const[idx]


def bits_to_index_msb(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Pack bits (..., n_sym * m) -> symbol indices (..., n_sym), MSB-first
    (reference bits_to_symbol_indices, esn_ofdm_mimo_via_cdl.py:81-87)."""
    m = bits_per_symbol
    *lead, nbits = bits.shape
    groups = bits.reshape(*lead, nbits // m, m)
    powers = (2 ** jnp.arange(m - 1, -1, -1)).astype(jnp.int32)
    return jnp.sum(groups.astype(jnp.int32) * powers, axis=-1)


def hard_demap_index_gray(symbols: jnp.ndarray,
                          bits_per_symbol: int) -> jnp.ndarray:
    """Nearest-point index in the Gray/Sionna constellation (the reference's
    hard SymbolDemapper, esn_ofdm_mimo_via_cdl.py:281-284)."""
    const = qam_constellation_gray(bits_per_symbol)
    d2 = jnp.abs(symbols[..., None] - const) ** 2
    return jnp.argmin(d2, axis=-1)


def symbols_to_bits_hard(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Hard demap (..., n_sym) -> bits (..., n_sym * m), LSB-first.

    Replaces the reference's Python double loop `hard_bits_from_syms`
    (OFDM_SISO_NBF_LDPC.py:103-111) with a batched argmin + table lookup.
    """
    m = bits_per_symbol
    idx = hard_demap_index(symbols, m)
    # labels are natural binary LSB-first, so label k of index i is simply
    # (i >> k) & 1 — bit arithmetic instead of a labels[idx] gather (gathers
    # over millions of positions are slow on TPU; this is elementwise)
    shifts = jnp.arange(m, dtype=idx.dtype)
    bits = ((idx[..., None] >> shifts) & 1).astype(jnp.int8)
    *lead, n_sym, _ = bits.shape
    return bits.reshape(*lead, n_sym * m)
