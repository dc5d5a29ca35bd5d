"""System-model-1 receiver: LS channel estimation with nearest-neighbour
interpolation + per-RE unbiased LMMSE MIMO equalization.

Re-designs the reference's `LSChannelEstimator(rg, interpolation_type="nn")`
and `LMMSEEqualizer(rg, sm)` (esn_ofdm_mimo_via_cdl.py:73-74, 247-248):

  * LS: at each pilot RE of stream s, h_ls = y * conj(p) / |p|^2 per rx
    antenna; estimation error variance no / |p|^2 = no / num_streams
    (kronecker pilots carry energy num_streams). Every RE then takes the
    estimate of its nearest pilot (L2 distance in (ofdm-symbol, subcarrier)
    index coordinates, first-match tie-break) — per stream, per rx antenna.
  * LMMSE (sionna.mimo.lmmse_equalizer semantics): with per-RE channel
    estimate H (U x S) and total error covariance S_cov = (no +
    sum_s err_var) I, compute G = (H^H H + s I)^-1 H^H, then the unbiased
    estimate x_hat_j = (G y)_j / (G H)_jj with post-equalization noise
    no_eff_j = 1/(G H)_jj - 1.

TPU design: the nn-interpolation is a static gather (indices precomputed in
numpy from the pilot pattern); the per-RE complex solve runs through the
real 2Sx2S embedding with the unrolled static-index Cholesky of
ops/linalg_mxu (no complex matmuls, no LAPACK — docs/ENVIRONMENT.md).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.linalg_mxu import chol_solve_small
from .grid import ResourceGrid


@functools.lru_cache(maxsize=None)
def _nn_tables(rg: ResourceGrid) -> Tuple[np.ndarray, np.ndarray]:
    """Static (S, P) flat pilot-RE indices and (S, T, F) nn map into [0,P)."""
    mask = rg.pilot_mask()                       # (S, T, F) bool
    S, T, F = mask.shape
    flat_idx = np.zeros((S, mask[0].sum()), dtype=np.int32)
    nn_map = np.zeros((S, T, F), dtype=np.int32)
    tt, ff = np.meshgrid(np.arange(T), np.arange(F), indexing="ij")
    for s in range(S):
        tp, fp = np.nonzero(mask[s])             # (P,)
        flat_idx[s] = (tp * F + fp).astype(np.int32)
        d2 = (tt[..., None] - tp) ** 2 + (ff[..., None] - fp) ** 2
        nn_map[s] = np.argmin(d2, axis=-1).astype(np.int32)
    return flat_idx, nn_map


def ls_nn_estimate(rg: ResourceGrid, y_grid: jnp.ndarray,
                   pilots: jnp.ndarray, no) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LS + nearest-neighbour channel estimate.

    y_grid (..., T, F_eff, U) complex; pilots (S, T, F_eff) complex.
    Returns h_hat (..., T, F_eff, U, S) and err_var (scalar jnp array).
    """
    flat_idx, nn_map = _nn_tables(rg)
    S, T = rg.num_streams, rg.num_ofdm_symbols
    F = rg.num_effective_subcarriers
    *lead, _, _, U = y_grid.shape
    y_flat = y_grid.reshape(*lead, T * F, U)
    p_flat = pilots.reshape(S, T * F)
    # per-stream pilot REs: (..., S, P, U)
    y_pil = y_flat[..., jnp.asarray(flat_idx), :]
    p_pil = p_flat[jnp.arange(S)[:, None], jnp.asarray(flat_idx)]  # (S, P)
    h_pil = y_pil * (jnp.conj(p_pil) /
                     (jnp.abs(p_pil) ** 2))[..., None]
    # nn gather to the full grid: (..., S, T*F, U) -> (..., T, F, U, S)
    h_full = h_pil[..., jnp.arange(S)[:, None],
                   jnp.asarray(nn_map).reshape(S, T * F), :]
    h_full = h_full.reshape(*lead, S, T, F, U)
    h_hat = jnp.moveaxis(h_full, -4, -1)         # (..., T, F, U, S)
    err_var = jnp.asarray(no) / float(S)
    return h_hat, err_var


def lmmse_equalize_grid(h_hat: jnp.ndarray, y_grid: jnp.ndarray,
                        err_var, no) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-RE unbiased LMMSE equalization (module docstring).

    h_hat (..., U, S) complex, y_grid (..., U) complex (any leading axes).
    Returns x_hat (..., S) complex and no_eff (..., S) real.
    """
    S = h_hat.shape[-1]
    s_cov = jnp.asarray(no) + S * jnp.asarray(err_var)
    # real embedding: He (..., 2U, 2S); G = He^T He = embed(H^H H)
    Hr, Hi = jnp.real(h_hat), jnp.imag(h_hat)
    He = jnp.concatenate(
        [jnp.concatenate([Hr, -Hi], -1), jnp.concatenate([Hi, Hr], -1)], -2)
    ye = jnp.concatenate([jnp.real(y_grid), jnp.imag(y_grid)], -1)[..., None]
    G = jnp.einsum("...ij,...ik->...jk", He, He)
    A = G + s_cov * jnp.eye(2 * S, dtype=G.dtype)
    rhs = jnp.concatenate([jnp.einsum("...ij,...ik->...jk", He, ye), G], -1)
    sol = chol_solve_small(A, rhs)               # (..., 2S, 1+2S)
    xe = sol[..., 0]
    gh_diag = jnp.diagonal(sol[..., 1:], axis1=-2, axis2=-1)  # (..., 2S)
    d = 0.5 * (gh_diag[..., :S] + gh_diag[..., S:])  # real diag of GH
    d = jnp.maximum(d, 1e-12)
    x_hat = (xe[..., :S] + 1j * xe[..., S:]) / d.astype(jnp.float32)
    no_eff = 1.0 / d - 1.0
    return x_hat, no_eff
