"""Channel estimation: comb-pilot LS + linear interpolation + TD-MMSE refine.

Reference OFDM_SISO_NBF_LDPC.py:316-334:
  * comb pattern: TX antenna `tx` owns subcarriers tx, tx+N_t, tx+2N_t, ...
  * per-(rx,tx) LS on the comb, then linear interp with linear extrapolation
    (scipy interp1d fill_value='extrapolate') to all N subcarriers
  * MMSE refinement in the time domain: truncate ifft(H_LS) to isi taps, solve
    (MMSEScaler * inv(R_h) + I) c = c_LS with R_h = diag(exp PDP),
    MMSEScaler = (No/Pi)/(N/2); since R_h is diagonal this is elementwise.

All functions are batched: vmapped internally over (rx, tx) pairs and
broadcastable over leading batch axes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .channel import exp_pdp
from .fft_mxu import fft_mxu, ifft_mxu


def _interp_comb_linear(values: jnp.ndarray, offset: int, step: int,
                        n_out: int) -> jnp.ndarray:
    """Linear interp/extrapolation of comb samples to a dense grid.

    values (..., P) sampled at positions offset + i*step; returns (..., n_out).
    Matches scipy interp1d(kind='linear', fill_value='extrapolate') on a
    uniform grid: out-of-range points use the first/last segment's slope.
    """
    P = values.shape[-1]
    pos = (jnp.arange(n_out) - offset) / step  # fractional index into comb
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(P - 2, 0))
    w = (pos - i0).astype(values.real.dtype)
    v0 = values[..., i0]
    v1 = values[..., jnp.minimum(i0 + 1, P - 1)]
    return v0 * (1.0 - w) + v1 * w


def ls_comb_estimate(Y_ls: jnp.ndarray, X_ls_comb: jnp.ndarray,
                     power_scale, n_tx: int) -> jnp.ndarray:
    """Per-link LS estimate on the comb + linear interpolation to all N.

    Y_ls:      (..., n_rx, N) received pilot frequency symbols (LS waveform)
    X_ls_comb: (..., n_tx, N) comb pilot grid (zeros off-comb)
    power_scale: sqrt(Pi), broadcastable over leading axes
    returns H_ls (..., N, n_rx, n_tx)
    """
    N = Y_ls.shape[-1]
    ps = jnp.asarray(power_scale)[..., None]
    outs = []
    for tx in range(n_tx):
        sc = jnp.arange(tx, N, n_tx)
        denom = X_ls_comb[..., tx, sc] * ps + 1e-12
        h_comb = Y_ls[..., :, sc] / denom[..., None, :]  # (..., n_rx, P)
        outs.append(_interp_comb_linear(h_comb, tx, n_tx, N))
    H = jnp.stack(outs, axis=-1)  # (..., n_rx, N, n_tx)
    return jnp.moveaxis(H, -2, -3)  # (..., N, n_rx, n_tx)


def mmse_refine_td(H_ls: jnp.ndarray, isi_duration: int, noise_psd: float,
                   power_per_sc) -> jnp.ndarray:
    """Time-domain MMSE refinement of an LS channel estimate.

    H_ls (..., N, n_rx, n_tx) -> H_mmse of the same shape.
    """
    N = H_ls.shape[-3]
    pdp = exp_pdp(isi_duration)  # diagonal of R_h
    mmse_scaler = (noise_psd / jnp.asarray(power_per_sc)) / (N / 2.0)
    c_ls = ifft_mxu(H_ls, axis=-3)[..., :isi_duration, :, :]
    # (scaler/pdp + 1)^-1 elementwise since R_h is diagonal
    gain = 1.0 / (mmse_scaler[..., None, None, None] / pdp[:, None, None] + 1.0)
    c_mmse = c_ls * gain
    pad = [(0, 0)] * (c_mmse.ndim - 3) + [(0, N - isi_duration), (0, 0), (0, 0)]
    return fft_mxu(jnp.pad(c_mmse, pad), axis=-3)


def estimate_channel(Y_ls, X_ls_comb, power_scale, n_tx, isi_duration,
                     noise_psd, power_per_sc):
    """LS + MMSE estimates in one call; returns (H_ls, H_mmse)."""
    H_ls = ls_comb_estimate(Y_ls, X_ls_comb, power_scale, n_tx)
    H_mmse = mmse_refine_td(H_ls, isi_duration, noise_psd, power_per_sc)
    return H_ls, H_mmse


def channel_freq_correlation(pdp: jnp.ndarray, n_subcarriers: int
                             ) -> jnp.ndarray:
    """Frequency-domain channel correlation matrix from a power-delay profile.

    R_H[k, l] = sum_tap pdp[tap] * exp(-j 2π (k-l) tap / N) — capability
    parity with the reference's `ComputeChannelCorrMatrix`
    (libs/HelpFunc.py:41-62; defined there but never called by any script).
    Returns (N, N) complex64 Hermitian Toeplitz matrix.
    """
    taps = jnp.arange(pdp.shape[0])
    k = jnp.arange(n_subcarriers)
    diff = k[:, None] - k[None, :]                     # (N, N)
    ang = -2.0 * jnp.pi * diff[..., None] * taps / n_subcarriers
    r = jnp.sum(pdp * (jnp.cos(ang) + 1j * jnp.sin(ang)), axis=-1)
    return r.astype(jnp.complex64)
