"""Multipath channel models: tap generators, FIR application, AWGN.

Tap generators (all return (n_rx, n_tx, isi) complex64):
  * draw_exp_pdp_taps — i.i.d. CN(0, pdp) taps with one-sided exponential
    power-delay profile (reference OFDM_SISO_NBF_LDPC.py:162-164, 272-279).
  * draw_tdl_taps — 3GPP TR 38.901 TDL-A/B/C profiles (Tables 7.7.2-1/-2/-3)
    scaled to a target RMS delay spread, fractional delays linearly split
    between adjacent integer taps, per-link unit-power normalisation. TDL-B
    is the reference's channel (Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:127-165,
    kept as the draw_cdlb_taps wrapper); A and C are framework extensions.
  * draw_flat_awgn_tap — single random-phase unit-magnitude tap (reference
    Demo_SISO_QPSK_AWGN_LDPC_ESN_with_ZF_LS.py flat-channel draw).

Channel application reproduces `scipy.signal.lfilter(c, [1], x)` semantics:
causal FIR convolution truncated to the input length (NOT circular), summed
over transmit antennas (reference :303-311).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .fft_mxu import fft_mxu, ifft_mxu

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

# Framework extensions beyond the reference (which only uses TDL-B):
# TR 38.901 Table 7.7.2-1 (TDL-A, NLOS) and Table 7.7.2-3 (TDL-C, NLOS).
TDLA_NORM_DELAYS = np.array([
    0.0000, 0.3819, 0.4025, 0.5868, 0.4610, 0.5375, 0.6708, 0.5750,
    0.7618, 1.5375, 1.8978, 2.2242, 2.1718, 2.4942, 2.5119, 3.0582,
    4.0810, 4.4579, 4.5695, 4.7966, 5.0066, 5.3043, 9.6586,
])
TDLA_POW_DB = np.array([
    -13.4, 0.0, -2.2, -4.0, -6.0, -8.2, -9.9, -10.5, -7.5, -15.9,
    -6.6, -16.7, -12.4, -15.2, -10.8, -11.3, -12.7, -16.2, -18.3,
    -18.9, -16.6, -19.9, -29.7,
])
TDLC_NORM_DELAYS = np.array([
    0.0000, 0.2099, 0.2219, 0.2329, 0.2176, 0.6366, 0.6448, 0.6560,
    0.6584, 0.7935, 0.8213, 0.9336, 1.2285, 1.3083, 2.1704, 2.7105,
    4.2589, 4.6003, 5.4902, 5.6077, 6.3065, 6.6374, 7.0427, 8.6523,
])
TDLC_POW_DB = np.array([
    -4.4, -1.2, -3.5, -5.2, -2.5, 0.0, -2.2, -3.9, -7.4, -7.1,
    -10.7, -11.1, -5.1, -6.8, -8.7, -13.2, -13.9, -13.9, -15.8,
    -17.1, -16.0, -15.7, -21.6, -22.8,
])
TDL_PROFILES = {
    "a": (TDLA_NORM_DELAYS, TDLA_POW_DB),
    "b": (TDLB_NORM_DELAYS, TDLB_POW_DB),
    "c": (TDLC_NORM_DELAYS, TDLC_POW_DB),
}


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
def _tdl_split_matrix(profile: str, isi_duration: int, sample_rate_hz: float,
                      delay_spread_ns: float) -> np.ndarray:
    """(n_paths, isi) real matrix S with S[p, i] = contribution weight of path p
    to integer tap i: linear split between floor(d) and floor(d)+1."""
    norm_delays = TDL_PROFILES[profile][0]
    delays_samp = norm_delays * delay_spread_ns * 1e-9 * sample_rate_hz
    n_paths = len(norm_delays)
    S = np.zeros((n_paths, isi_duration))
    for p, d in enumerate(delays_samp):
        i0 = int(np.floor(d))
        frac = d - i0
        if 0 <= i0 < isi_duration:
            S[p, i0] += 1.0 - frac
        if 0 <= i0 + 1 < isi_duration:
            S[p, i0 + 1] += frac
    return S


def draw_tdl_taps(key, n_rx: int, n_tx: int, isi_duration: int,
                  sample_rate_hz: float, delay_spread_ns: float,
                  profile: str = "b") -> jnp.ndarray:
    """(n_rx, n_tx, isi) 38.901 TDL taps, per-link unit-power normalised.

    profile in {"a", "b", "c"} (Tables 7.7.2-1/-2/-3). The reference only
    implements TDL-B (Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:127-165); A and C
    are framework extensions with the same delay-spread scaling,
    fractional-delay linear split and unit-power normalisation."""
    pow_db = TDL_PROFILES[profile][1]
    pow_lin = 10.0 ** (pow_db / 10.0)
    pow_lin = jnp.asarray(pow_lin / pow_lin.sum(), dtype=jnp.float32)
    split = jnp.asarray(
        _tdl_split_matrix(profile, isi_duration, float(sample_rate_hz),
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


def draw_cdlb_taps(key, n_rx: int, n_tx: int, isi_duration: int,
                   sample_rate_hz: float, delay_spread_ns: float) -> jnp.ndarray:
    """(n_rx, n_tx, isi) CDL-B TDL taps (the reference's channel)."""
    return draw_tdl_taps(key, n_rx, n_tx, isi_duration, sample_rate_hz,
                         delay_spread_ns, profile="b")


def draw_flat_awgn_tap(key, n_rx: int, n_tx: int) -> jnp.ndarray:
    """(n_rx, n_tx, 1) unit-magnitude random-phase taps (flat channel)."""
    phase = jax.random.uniform(key, (n_rx, n_tx, 1), maxval=2 * np.pi)
    return jnp.exp(1j * phase).astype(jnp.complex64)


# FIR implementation A/B knob (see apply_fir_channel):
#   dft   — frequency-domain linear convolution (default; measured 1.1 ms
#           /round on the flagship datapath vs 8.8 ms for the original
#           per-tap shift-accumulate, tools/profile_datapath.py)
#   stack — shifted-copies matmul (K = n_tx*isi batched dot; 5.3 ms)
#   conv  — grouped conv_general_dilated (pathological on v5e: 113 ms —
#           the conv emitter collapses under B-many feature groups)
_FIR_IMPL = os.environ.get("ESN_TPU_FIR_IMPL", "dft")


def apply_fir_channel(taps: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR channel, lfilter semantics, summed over TX antennas.

    taps: (..., n_rx, n_tx, isi) complex
    x:    (..., n_tx, T) complex time-domain per TX antenna
    returns (..., n_rx, T): y[r, n] = sum_t sum_k taps[r,t,k] * x[t, n-k]

    Default implementation: frequency-domain linear convolution
    (_apply_fir_dft) — measured 1.1 ms/round on the flagship datapath vs
    8.8 ms for a per-tap shift-accumulate (the reference's
    `lfilter(c, 1, x)` per (rx, tx) pair, OFDM_SISO_NBF_LDPC.py:423) and
    5.3 ms for the shifted-copies batched dot below
    (tools/profile_datapath.py). The fallback below stacks the isi shifted
    copies of x ONCE into a (..., T, n_tx*isi) operand and contracts
    against (..., n_rx, n_tx*isi) in a single batched dot. Complex
    products via real einsums (axon TPU lacks complex matmul).
    """
    if _FIR_IMPL == "conv":
        return _apply_fir_conv(taps, x)
    if _FIR_IMPL == "dft" and taps.shape[-1] > 1:
        return _apply_fir_dft(taps, x)
    isi = taps.shape[-1]
    T = x.shape[-1]

    # S[..., t, n, k] = x[..., t, n-k] (zero for n < k), then fold (t, k)
    shifted = [x]
    for k in range(1, isi):
        shifted.append(
            jnp.pad(x[..., : T - k], [(0, 0)] * (x.ndim - 1) + [(k, 0)]))
    S = jnp.stack(shifted, axis=-1)                  # (..., n_tx, T, isi)
    S = jnp.swapaxes(S, -3, -2)                      # (..., T, n_tx, isi)
    S = S.reshape(*S.shape[:-2], S.shape[-2] * S.shape[-1])  # (..., T, C)
    tf = taps.reshape(*taps.shape[:-2], taps.shape[-2] * taps.shape[-1])

    Sr, Si = jnp.real(S), jnp.imag(S)
    tr, ti = jnp.real(tf), jnp.imag(tf)              # (..., n_rx, C)
    yr = (jnp.einsum("...nc,...rc->...rn", Sr, tr)
          - jnp.einsum("...nc,...rc->...rn", Si, ti))
    yi = (jnp.einsum("...nc,...rc->...rn", Sr, ti)
          + jnp.einsum("...nc,...rc->...rn", Si, tr))
    return yr + 1j * yi


def _apply_fir_dft(taps: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """apply_fir_channel via frequency-domain linear convolution.

    lfilter's causal-truncated output equals the first T samples of the
    linear convolution, which a circular convolution at length
    L = T + isi - 1 computes exactly. The two DFTs are (., L) @ (L, L)
    matmuls (fft_mxu) — large-M MXU shapes with NO isi-fold data expansion,
    unlike the shifted-copies stack; the per-frequency TX mixing fuses into
    one multiply-reduce."""
    isi = taps.shape[-1]
    T = x.shape[-1]
    L = T + isi - 1
    X = fft_mxu(jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, L - T)]), axis=-1)
    H = fft_mxu(jnp.pad(taps, [(0, 0)] * (taps.ndim - 1) + [(0, L - isi)]),
                axis=-1)
    Y = jnp.sum(H * X[..., None, :, :], axis=-2)     # (..., n_rx, L)
    return ifft_mxu(Y, axis=-1)[..., :T]


def _apply_fir_conv(taps: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """apply_fir_channel via grouped conv_general_dilated: each (lead...)
    entry is one feature group (n_tx in -> n_rx out channels), causal padding
    (isi-1, 0), kernel tap axis reversed (conv primitive is correlation).
    Avoids materializing the isi shifted copies of x — the conv emitter
    windows the input on-chip."""
    isi = taps.shape[-1]
    T = x.shape[-1]
    n_tx = x.shape[-2]
    n_rx = taps.shape[-3]
    lead = jnp.broadcast_shapes(x.shape[:-2], taps.shape[:-3])
    B = 1
    for d in lead:
        B *= int(d)
    xb = jnp.broadcast_to(x, lead + x.shape[-2:]).reshape(1, B * n_tx, T)
    tb = jnp.broadcast_to(taps, lead + taps.shape[-3:]).reshape(
        B * n_rx, n_tx, isi)[..., ::-1]

    def conv(l, r):
        return jax.lax.conv_general_dilated(
            l, r, window_strides=(1,), padding=[(isi - 1, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=B)

    xr, xi = jnp.real(xb), jnp.imag(xb)
    tr, ti = jnp.real(tb), jnp.imag(tb)
    yr = conv(xr, tr) - conv(xi, ti)
    yi = conv(xr, ti) + conv(xi, tr)
    return (yr + 1j * yi).reshape(*lead, n_rx, T)


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
