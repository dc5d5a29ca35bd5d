"""Unit tests for QAM mapping and OFDM modulation against closed forms and a
NumPy oracle that re-derives the reference's conventions independently."""
import numpy as np
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.ops import (
    qam_constellation, qam_bit_labels, bits_to_symbols, symbols_to_bits_hard,
    ofdm_modulate, ofdm_demodulate, add_cp, remove_cp,
)
from esn_ofdm_mimo_tpu.ops.pa import rapp_pa, clip_amplitude


def _oracle_constellation(m):
    """Independent NumPy re-derivation of the column-major PAM-grid QAM."""
    import math
    even = math.ceil(math.sqrt(2**m) / 2) * 2
    pam = np.arange(-(even - 1), even, 2)
    pts = []
    for i in range(even):        # column-major: column i, row j
        for j in range(even):
            pts.append(pam[i] + 1j * pam[j])
    pts = np.array(pts)
    return pts / np.sqrt(np.mean(np.abs(pts) ** 2))


@pytest.mark.parametrize("m", [2, 4, 6])
def test_constellation_matches_oracle(m):
    c = np.asarray(qam_constellation(m))
    np.testing.assert_allclose(c, _oracle_constellation(m), rtol=1e-6)
    assert abs(np.mean(np.abs(c) ** 2) - 1.0) < 1e-6


def test_bit_labels_lsb_first_natural_binary():
    labels = np.asarray(qam_bit_labels(4))
    # index 6 = 0b0110 -> LSB-first [0,1,1,0]
    np.testing.assert_array_equal(labels[6], [0, 1, 1, 0])
    np.testing.assert_array_equal(labels[1], [1, 0, 0, 0])


@pytest.mark.parametrize("m", [2, 4])
def test_bits_symbols_roundtrip(m):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(3, 16 * m)).astype(np.int32)
    syms = bits_to_symbols(jnp.asarray(bits), m)
    back = symbols_to_bits_hard(syms, m)
    np.testing.assert_array_equal(np.asarray(back), bits)


def test_ofdm_mod_demod_roundtrip_and_convention():
    rng = np.random.default_rng(1)
    N, cp = 64, 7
    X = (rng.standard_normal((2, N)) + 1j * rng.standard_normal((2, N))).astype(np.complex64)
    x_cp = ofdm_modulate(jnp.asarray(X), cp)
    # convention: x = N * ifft(X), CP = last cp samples prepended
    x_ref = N * np.fft.ifft(X, axis=-1)
    np.testing.assert_allclose(np.asarray(x_cp[:, cp:]), x_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_cp[:, :cp]), x_ref[:, -cp:], rtol=1e-4, atol=1e-4)
    X_back = ofdm_demodulate(x_cp, cp)
    np.testing.assert_allclose(np.asarray(X_back), X, rtol=1e-4, atol=1e-4)


def test_cp_add_remove():
    x = jnp.arange(10.0)
    assert np.array_equal(np.asarray(remove_cp(add_cp(x, 3), 3)), np.asarray(x))


def test_rapp_pa_matches_formula_and_limits():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(np.complex64)
    var_x = 2.0
    A = float(clip_amplitude(var_x, 3.0))
    assert abs(A - np.sqrt(var_x) * 10 ** (3 / 20)) < 1e-6
    y = np.asarray(rapp_pa(jnp.asarray(x), A, 1.0))
    expect = x / (1 + (np.abs(x) / A) ** 2) ** 0.5
    np.testing.assert_allclose(y, expect, rtol=1e-5)
    # hard limit: |y| <= A, and small signals pass ~unchanged
    big = jnp.asarray(np.complex64(1000.0 + 0j))
    assert abs(np.asarray(rapp_pa(big, A))) < A
    small = jnp.asarray(np.complex64(1e-3 + 0j))
    assert abs(np.asarray(rapp_pa(small, A)) - 1e-3) < 1e-6


def test_64qam_roundtrip_and_llr_signs():
    """m=6 (beyond the reference's QPSK/16-QAM): constellation unit power,
    exact hard-demap roundtrip, and max-log LLR signs match the bits."""
    import jax
    from esn_ofdm_mimo_tpu.ops import (qam_constellation, bits_to_symbols,
                                       symbols_to_bits_hard, qam_llrs_maxlog)
    m = 6
    c = qam_constellation(m)
    assert c.shape == (64,)
    np.testing.assert_allclose(float(jnp.mean(jnp.abs(c) ** 2)), 1.0,
                               rtol=1e-6)
    bits = jax.random.bernoulli(jax.random.PRNGKey(0), 0.5,
                                (4, 8 * m)).astype(jnp.int8)
    X = bits_to_symbols(bits, m)
    np.testing.assert_array_equal(np.asarray(symbols_to_bits_hard(X, m)),
                                  np.asarray(bits))
    llr = qam_llrs_maxlog(X, jnp.float32(0.01), m)
    np.testing.assert_array_equal(
        np.asarray(llr.reshape(4, 8, m) > 0),
        np.asarray(bits.reshape(4, 8, m) == 0))
