"""DFT as MXU matmuls — the TPU-idiomatic FFT for modem-sized transforms.

For the subcarrier counts in this framework (N <= 512) an explicit DFT
matrix multiply is the right TPU kernel: one (B, N) @ (N, N) matmul hits the
MXU at full tilt, while a generic radix FFT lowering is latency-bound at
these sizes (and the experimental axon backend lacks the FFT custom call
entirely). Complex arithmetic is expressed over real matmuls:

    X = x W,  W = C + jS  (C = cos(-2πkn/N), S = sin(-2πkn/N))
    Re X = xr C - xi S,  Im X = xr S + xi C

The O(N^2) flop count is immaterial: N=512 -> 0.5 MFLOP per symbol, pure MXU.
ifft uses the conjugate identity ifft(x) = conj(fft(conj(x)))/N.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _dft_mats_np(n: int):
    # cache NumPy (never jnp: a jnp constant created inside a traced region
    # would leak a tracer through the cache)
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _dft_mats(n: int):
    C, S = _dft_mats_np(n)
    return jnp.asarray(C), jnp.asarray(S)


def fft_mxu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Forward DFT over `axis` of a complex array via real matmuls."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    C, S = _dft_mats(n)
    xr, xi = jnp.real(x), jnp.imag(x)
    Xr = xr @ C - xi @ S
    Xi = xr @ S + xi @ C
    return jnp.moveaxis(Xr + 1j * Xi, -1, axis)


def ifft_mxu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    n = x.shape[axis]
    return jnp.conj(fft_mxu(jnp.conj(x), axis)) / n
