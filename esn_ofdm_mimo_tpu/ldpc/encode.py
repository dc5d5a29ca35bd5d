"""LDPC encoding as a dense f32 matmul mod 2 — MXU-shaped, batched.

codeword = [P @ u mod 2 | u]  (info bits in the last k positions; the
reference's pyldpc `get_message` becomes a slice, see code.py docstring).
Sums are <= m < 2^24 so f32 matmul is exact.
"""
from __future__ import annotations

import jax.numpy as jnp

from .code import LdpcCode


def ldpc_encode(code: LdpcCode, u: jnp.ndarray) -> jnp.ndarray:
    """u (..., k) int bits -> codeword (..., n) int8."""
    P = jnp.asarray(code.P, dtype=jnp.float32)
    parity = jnp.mod(u.astype(jnp.float32) @ P.T, 2.0)
    cw = jnp.concatenate([parity, u.astype(jnp.float32)], axis=-1)
    return cw.astype(jnp.int8)


def ldpc_extract_message(code: LdpcCode, cw: jnp.ndarray) -> jnp.ndarray:
    """codeword (..., n) -> info bits (..., k)."""
    return cw[..., code.m:]
