"""Per-subcarrier ZF/MMSE equalization as batched real-embedded solves.

Reference OFDM_SISO_NBF_LDPC.py:41-53 (per-subcarrier Python loop :450-460 is
replaced by one batched solve over all subcarriers/batches):
  ZF:   solve(H^H H + 1e-12 I, H^H y) / sqrt(Pi)
  MMSE: solve(H^H H + (No/Pi) I, H^H y) / sqrt(Pi)

TPU design: the complex n_tx x n_tx system is solved through its real
2n_tx x 2n_tx embedding with unrolled Gauss-Jordan (ops/linalg_mxu) — the
axon backend lacks complex matmul and LU/Cholesky custom calls, and at these
tiny, massively-batched shapes unrolled elimination is the faster lowering on
any TPU. The normal equations are themselves formed in the real embedding:
He = [[Hr, -Hi], [Hi, Hr]] satisfies He^T He = embed(H^H H) and
He^T ye = embed(H^H y).
"""
from __future__ import annotations

import jax.numpy as jnp

from .linalg_mxu import chol_solve_small


def _embed_H(H: jnp.ndarray) -> jnp.ndarray:
    Hr, Hi = jnp.real(H), jnp.imag(H)
    top = jnp.concatenate([Hr, -Hi], axis=-1)
    bot = jnp.concatenate([Hi, Hr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)   # (..., 2n_rx, 2n_tx)


def _regularized_solve(H: jnp.ndarray, y: jnp.ndarray, reg) -> jnp.ndarray:
    """solve(H^H H + reg*I, H^H y) batched over leading axes.

    H (..., n_rx, n_tx) complex, y (..., n_rx) complex, reg real scalar.
    """
    n_tx = H.shape[-1]
    He = _embed_H(H)                               # (..., 2nr, 2nt)
    ye = jnp.concatenate([jnp.real(y), jnp.imag(y)], axis=-1)[..., None]
    G = jnp.einsum("...ij,...ik->...jk", He, He)
    G = G + jnp.asarray(reg)[..., None, None] * jnp.eye(2 * n_tx, dtype=G.dtype)
    rhs = jnp.einsum("...ij,...ik->...jk", He, ye)  # (..., 2nt, 1)
    # SPD system: unrolled pivot-free Cholesky (static indices, no gathers —
    # ~10x faster than pivoted elimination for these tiny batched systems)
    xe = chol_solve_small(G, rhs)[..., 0]
    return xe[..., :n_tx] + 1j * xe[..., n_tx:]


def equalize_zf(Y: jnp.ndarray, H: jnp.ndarray, power_scale) -> jnp.ndarray:
    """Zero-forcing with tiny diagonal loading. Y (..., n_rx), H (..., n_rx, n_tx)."""
    x = _regularized_solve(H, Y, jnp.asarray(1e-12, dtype=jnp.float32))
    return x / jnp.asarray(power_scale)[..., None]


def equalize_mmse(Y: jnp.ndarray, H: jnp.ndarray, power_scale,
                  noise_over_power) -> jnp.ndarray:
    """LMMSE: diagonal loading by No/Pi."""
    x = _regularized_solve(H, Y, noise_over_power)
    return x / jnp.asarray(power_scale)[..., None]


def equalize_persc(Y: jnp.ndarray, H: jnp.ndarray, power_scale,
                   noise_over_power=None) -> jnp.ndarray:
    """Equalize a full OFDM symbol.

    Y (..., n_rx, N) and H (..., N, n_rx, n_tx); returns X_hat (..., N, n_tx).
    ZF when noise_over_power is None, else MMSE.
    """
    Yk = jnp.moveaxis(Y, -2, -1)  # (..., N, n_rx)
    if noise_over_power is None:
        return equalize_zf(Yk, H, jnp.asarray(power_scale)[..., None])
    return equalize_mmse(Yk, H, jnp.asarray(power_scale)[..., None],
                         jnp.asarray(noise_over_power)[..., None])


def equalizer_weights(H: jnp.ndarray, reg) -> jnp.ndarray:
    """Factor the regularized solve for a block-constant channel.

    The channel is fixed for every data symbol of a coherence block
    (OFDM_SISO_NBF_LDPC.py:450-460 re-solves it per symbol; here the Gram +
    Cholesky is done ONCE per (block, subcarrier) and the per-symbol work
    becomes a single small matmul — `apply_equalizer`).

    H (..., n_rx, n_tx) complex, reg real scalar ->
    We (..., 2*n_tx, 2*n_rx) real with We = (He^T He + reg I)^{-1} He^T.
    """
    n_tx = H.shape[-1]
    He = _embed_H(H)
    G = jnp.einsum("...ij,...ik->...jk", He, He)
    G = G + jnp.asarray(reg)[..., None, None] * jnp.eye(2 * n_tx, dtype=G.dtype)
    return chol_solve_small(G, jnp.swapaxes(He, -1, -2))


def apply_equalizer(We: jnp.ndarray, Y: jnp.ndarray, power_scale) -> jnp.ndarray:
    """Apply precomputed weights to D data symbols of the same block.

    We (B, N, 2*n_tx, 2*n_rx) from `equalizer_weights`;
    Y (B, D, n_rx, N) complex -> X_hat (B, D, N, n_tx) complex.
    """
    Yk = jnp.moveaxis(Y, -2, -1)                           # (B, D, N, n_rx)
    ye = jnp.concatenate([jnp.real(Yk), jnp.imag(Yk)], axis=-1)
    # broadcast multiply-reduce, NOT einsum: a dot_general here is 16k tiny
    # (2nt, 2nr) matmuls (~1% MXU utilisation + two big transposes); the
    # elementwise form fuses on the VPU at HBM roofline
    xe = jnp.sum(We[:, None] * ye[..., None, :], axis=-1)  # (B, D, N, 2n_tx)
    n_tx = We.shape[-2] // 2
    x = xe[..., :n_tx] + 1j * xe[..., n_tx:]
    return x / jnp.asarray(power_scale)[..., None]
