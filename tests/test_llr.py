"""Separable (per-PAM-axis) LLR/sigma^2/demap fast paths are EXACT vs the
generic M-point constellation forms (the reference's computation,
Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:66-88)."""
import numpy as np
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.ops.qam import (
    qam_constellation, qam_bit_labels, hard_demap_index)
from esn_ofdm_mimo_tpu.ops.llr import qam_llrs_maxlog, est_sigma2_from_decision


def _generic_llrs(z, sigma2, m):
    const = np.asarray(qam_constellation(m))
    labels = np.asarray(qam_bit_labels(m)).astype(bool)
    d2 = np.abs(z[..., None] - const) ** 2
    d0 = np.where(labels, np.inf, d2[..., None]).min(axis=-2)
    d1 = np.where(labels, d2[..., None], np.inf).min(axis=-2)
    return (d1 - d0) / np.maximum(sigma2, 1e-12)[..., None, None]


@pytest.mark.parametrize("m", [2, 4])
def test_separable_llrs_exact(m):
    rng = np.random.default_rng(0)
    z = (rng.normal(size=(3, 64)) + 1j * rng.normal(size=(3, 64))).astype(
        np.complex64)
    s2 = rng.uniform(0.05, 0.5, size=(3,)).astype(np.float32)
    got = np.asarray(qam_llrs_maxlog(jnp.asarray(z), jnp.asarray(s2), m))
    want = _generic_llrs(z, s2, m)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m", [2, 4])
def test_separable_sigma2_and_demap_exact(m):
    rng = np.random.default_rng(1)
    z = (rng.normal(size=(5, 128)) + 1j * rng.normal(size=(5, 128))).astype(
        np.complex64)
    const = np.asarray(qam_constellation(m))
    d2 = np.abs(z[..., None] - const) ** 2
    want_idx = d2.argmin(axis=-1)
    want_s2 = d2.min(axis=-1).mean(axis=-1) + 1e-12
    got_idx = np.asarray(hard_demap_index(jnp.asarray(z), m))
    got_s2 = np.asarray(est_sigma2_from_decision(jnp.asarray(z), m))
    assert (got_idx == want_idx).all()
    np.testing.assert_allclose(got_s2, want_s2, rtol=2e-5)
