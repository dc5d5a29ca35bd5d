"""Channel analytics: per-subcarrier SVD capacity / rank / condition metrics.

Reference OFDM_SISO_NBF_LDPC.py:369-384:
  per subcarrier k: S = svdvals(H_k)
    capacity_k = sum log2(1 + gamma * S^2), gamma = Pi/No (divided by N_t for
                 the SIMO/MIMO scripts, see OFDM_SIMO_1-2_NBF_LDPC.py:372)
    rank_k     = #{S^2 >= max(1e-2 * s1^2, 10*No/Pi)}
    cond_k     = s1 / max(s_min, 1e-12)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .linalg_mxu import svdvals_small


class SvdMetrics(NamedTuple):
    capacity_per_sc: jnp.ndarray   # (...,) mean over subcarriers
    rank: jnp.ndarray              # (..., N) effective rank per subcarrier
    cond: jnp.ndarray              # (..., N) condition number per subcarrier


def channel_svd_metrics(H: jnp.ndarray, power_per_sc, noise_psd: float,
                        normalize_by_ntx: bool = True) -> SvdMetrics:
    """H (..., N, n_rx, n_tx). Batched SVD over all subcarriers at once."""
    n_tx = H.shape[-1]
    # complex SVD lowers to complex matmuls (unsupported on axon); singular
    # values come from cyclic-Jacobi on the real-embedded Gram instead
    S = svdvals_small(H)                      # (..., N, n_tx) descending
    s2 = S**2
    gamma = jnp.asarray(power_per_sc) / noise_psd
    if normalize_by_ntx:
        gamma = gamma / n_tx
    cap_k = jnp.sum(jnp.log2(1.0 + gamma[..., None, None] * s2), axis=-1)
    s1 = S[..., 0]
    smin = jnp.where(S.shape[-1] > 1, S[..., -1], s1)
    thr = jnp.maximum(1e-2 * s1**2,
                      10.0 * (noise_psd / jnp.asarray(power_per_sc))[..., None])
    rank = jnp.sum(s2 >= thr[..., None], axis=-1)
    cond = s1 / jnp.maximum(smin, 1e-12)
    return SvdMetrics(jnp.mean(cap_k, axis=-1), rank, cond)
