"""Multipath channel models: tap generators, FIR application, AWGN.

Tap generators (all return (n_rx, n_tx, isi) complex64):
  * draw_exp_pdp_taps — i.i.d. CN(0, pdp) taps with one-sided exponential
    power-delay profile (reference OFDM_SISO_NBF_LDPC.py:162-164, 272-279).
  * draw_cdlb_taps — 3GPP TR 38.901 Table 7.7.2-2 TDL-B 23-path profile scaled
    to a target RMS delay spread, fractional delays linearly split between
    adjacent integer taps, per-link unit-power normalisation
    (reference Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:127-165).
  * draw_flat_awgn_tap — single random-phase unit-magnitude tap (reference
    Demo_SISO_QPSK_AWGN_LDPC_ESN_with_ZF_LS.py flat-channel draw).

Channel application reproduces `scipy.signal.lfilter(c, [1], x)` semantics:
causal FIR convolution truncated to the input length (NOT circular), summed
over transmit antennas (reference :303-311).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fft_mxu import fft_mxu

# 3GPP TR 38.901 (Rel-16) Table 7.7.2-2: TDL-B normalized delays and powers.
TDLB_NORM_DELAYS = np.array([
    0.0000, 0.1072, 0.2155, 0.2095, 0.2870, 0.2986, 0.3752, 0.5055, 0.3681,
    0.3697, 0.5700, 0.5283, 1.1021, 1.2756, 1.5474, 1.7842, 2.0169, 2.8294,
    3.0219, 3.6187, 4.1067, 4.2790, 4.7834,
])
TDLB_POW_DB = np.array([
    0.0, -2.2, -4.0, -3.2, -9.8, -1.2, -3.4, -5.2, -7.6,
    -3.0, -8.9, -9.0, -4.8, -5.7, -7.5, -1.9, -7.6, -12.2,
    -9.8, -11.4, -14.9, -9.2, -11.3,
])


def exp_pdp(isi_duration: int) -> jnp.ndarray:
    """One-sided exponential PDP over cp_len+1 == isi_duration taps.

    IsiMagnitude = exp(-n/(CP/9)) normalised to sum 1 (reference :162-164).
    """
    cp = isi_duration - 1
    scale = max(cp / 9.0, 1e-12)
    mag = np.exp(-np.arange(cp + 1) / scale)
    return jnp.asarray(mag / mag.sum(), dtype=jnp.float32)


def draw_exp_pdp_taps(key, n_rx: int, n_tx: int, isi_duration: int) -> jnp.ndarray:
    """(n_rx, n_tx, isi) taps c ~ CN(0, pdp) per link."""
    pdp = exp_pdp(isi_duration)
    kr, ki = jax.random.split(key)
    shape = (n_rx, n_tx, isi_duration)
    re = jax.random.normal(kr, shape)
    im = jax.random.normal(ki, shape)
    c = (re + 1j * im) / np.sqrt(2.0)
    return (c * jnp.sqrt(pdp)).astype(jnp.complex64)


@functools.lru_cache(maxsize=None)
def _cdlb_split_matrix(isi_duration: int, sample_rate_hz: float,
                       delay_spread_ns: float) -> np.ndarray:
    """(n_paths, isi) real matrix S with S[p, i] = contribution weight of path p
    to integer tap i: linear split between floor(d) and floor(d)+1."""
    delays_samp = TDLB_NORM_DELAYS * delay_spread_ns * 1e-9 * sample_rate_hz
    n_paths = len(TDLB_NORM_DELAYS)
    S = np.zeros((n_paths, isi_duration))
    for p, d in enumerate(delays_samp):
        i0 = int(np.floor(d))
        frac = d - i0
        if 0 <= i0 < isi_duration:
            S[p, i0] += 1.0 - frac
        if 0 <= i0 + 1 < isi_duration:
            S[p, i0 + 1] += frac
    return S


def draw_cdlb_taps(key, n_rx: int, n_tx: int, isi_duration: int,
                   sample_rate_hz: float, delay_spread_ns: float) -> jnp.ndarray:
    """(n_rx, n_tx, isi) CDL-B TDL taps, per-link unit-power normalised."""
    pow_lin = 10.0 ** (TDLB_POW_DB / 10.0)
    pow_lin = jnp.asarray(pow_lin / pow_lin.sum(), dtype=jnp.float32)
    split = jnp.asarray(
        _cdlb_split_matrix(isi_duration, float(sample_rate_hz),
                           float(delay_spread_ns)), dtype=jnp.float32)
    n_paths = pow_lin.shape[0]
    kr, ki = jax.random.split(key)
    shape = (n_rx, n_tx, n_paths)
    gr = jax.random.normal(kr, shape) / np.sqrt(2.0) * jnp.sqrt(pow_lin)
    gi = jax.random.normal(ki, shape) / np.sqrt(2.0) * jnp.sqrt(pow_lin)
    # complex gains x real split matrix as two real einsums (no complex
    # matmul — unsupported on the axon TPU backend, and real matmuls are the
    # native MXU path anyway)
    h = (jnp.einsum("rtp,pi->rti", gr, split)
         + 1j * jnp.einsum("rtp,pi->rti", gi, split))
    power = jnp.sum(jnp.abs(h) ** 2, axis=-1, keepdims=True)
    h = h / jnp.sqrt(jnp.maximum(power, 1e-30))
    return h.astype(jnp.complex64)


def draw_flat_awgn_tap(key, n_rx: int, n_tx: int) -> jnp.ndarray:
    """(n_rx, n_tx, 1) unit-magnitude random-phase taps (flat channel)."""
    phase = jax.random.uniform(key, (n_rx, n_tx, 1), maxval=2 * np.pi)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def apply_fir_channel(taps: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR channel, lfilter semantics, summed over TX antennas.

    taps: (..., n_rx, n_tx, isi) complex
    x:    (..., n_tx, T) complex time-domain per TX antenna
    returns (..., n_rx, T): y[r, n] = sum_t sum_k taps[r,t,k] * x[t, n-k]

    Implemented as an unrolled shift-accumulate over the (static, small) tap
    axis — XLA fuses this into a handful of vector ops; taps <= 8 in all
    reference configurations, so no conv kernel is needed here.
    """
    isi = taps.shape[-1]
    T = x.shape[-1]

    def cmul_contract(t_k, xs):
        # complex (..., n_rx, n_tx) x (..., n_tx, T) -> (..., n_rx, T) via
        # real einsums only (axon TPU lacks complex matmul)
        tr, ti = jnp.real(t_k), jnp.imag(t_k)
        xr, xi = jnp.real(xs), jnp.imag(xs)
        yr = (jnp.einsum("...rt,...tn->...rn", tr, xr)
              - jnp.einsum("...rt,...tn->...rn", ti, xi))
        yi = (jnp.einsum("...rt,...tn->...rn", tr, xi)
              + jnp.einsum("...rt,...tn->...rn", ti, xr))
        return yr + 1j * yi

    y = cmul_contract(taps[..., 0], x)
    for k in range(1, isi):
        xs = jnp.pad(x[..., : T - k], [(0, 0)] * (x.ndim - 1) + [(k, 0)])
        y = y + cmul_contract(taps[..., k], xs)
    return y


def taps_to_freq_response(taps: jnp.ndarray, n_subcarriers: int) -> jnp.ndarray:
    """taps (..., n_rx, n_tx, isi) -> H (..., N, n_rx, n_tx) = fft(pad(c, N))."""
    isi = taps.shape[-1]
    pad = [(0, 0)] * (taps.ndim - 1) + [(0, n_subcarriers - isi)]
    H = fft_mxu(jnp.pad(taps, pad), axis=-1)
    return jnp.moveaxis(H, -1, -3)


def awgn(key, shape, noise_psd: float, seq_len: int) -> jnp.ndarray:
    """Complex AWGN with the reference's length-scaled std.

    Per real dimension the std is sqrt(seq_len * No / 2) (reference :309,:425),
    i.e. total complex noise power seq_len*No — the reference deliberately
    scales noise with the vector length so that time-domain SNR matches
    var_x = 10^(EbNo/10) * No * N. `shape` is the full output shape; seq_len is
    the length used in the scaling (== time length of each sequence).
    """
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(seq_len * noise_psd / 2.0)
    return (std * (jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape))
            ).astype(jnp.complex64)
