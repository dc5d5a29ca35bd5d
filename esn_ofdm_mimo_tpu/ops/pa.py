"""Rapp power-amplifier soft-clipping nonlinearity.

Reference OFDM_SISO_NBF_LDPC.py:300-301:
    x_NLD = x / (1 + (|x|/A)^(2p))^(1/(2p)),  A = sqrt(var_x) * 10^(clip_db/20)
"""
from __future__ import annotations

import jax.numpy as jnp


def rapp_pa(x: jnp.ndarray, a_clip, smoothness: float = 1.0) -> jnp.ndarray:
    """Apply Rapp soft clipping. `a_clip` broadcasts against leading axes."""
    p = smoothness
    a = jnp.asarray(a_clip)
    if a.ndim > 0:
        a = a[..., None]
    mag_ratio = jnp.abs(x) / a
    return x / (1.0 + mag_ratio ** (2 * p)) ** (1.0 / (2 * p))


def clip_amplitude(var_x, clip_level_db: float):
    """A_Clip = sqrt(var_x) * 10^(clip_db/20) (reference :235)."""
    return jnp.sqrt(jnp.asarray(var_x)) * 10.0 ** (clip_level_db / 20.0)
