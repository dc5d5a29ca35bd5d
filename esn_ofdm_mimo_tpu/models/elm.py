"""Extreme Learning Machine: random hidden layer + closed-form ridge readout.

Two variants used by the reference:
  * regression ELM on window-flattened time-domain samples
    (system_model_2_all_comparision.py:51-69: random (W, b), tanh hidden,
    pinv readout to 2*N_t targets);
  * classification ELM on equalized symbols
    (esn_via_cdl_all_model.py:180-195: one-hot targets, pinv readout,
    argmax prediction).

Both are batched closed-form solves — no iterations, MXU-shaped.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ElmParams(NamedTuple):
    W1: jnp.ndarray    # (n_hidden, n_in)
    b1: jnp.ndarray    # (n_hidden,)
    W2: jnp.ndarray    # (n_hidden, n_out) readout (trained)


def init_elm(key, n_in: int, n_hidden: int, n_out: int) -> ElmParams:
    kw, kb = jax.random.split(key)
    W1 = jax.random.normal(kw, (n_hidden, n_in)) / jnp.sqrt(n_in)
    b1 = jax.random.normal(kb, (n_hidden,))
    return ElmParams(W1=W1, b1=b1, W2=jnp.zeros((n_hidden, n_out)))


def _hidden(p: ElmParams, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(X @ p.W1.T + p.b1)


def elm_fit(p: ElmParams, X: jnp.ndarray, Y: jnp.ndarray,
            ridge: float = 1e-6) -> ElmParams:
    """X (..., S, n_in), Y (..., S, n_out) -> trained params (batched)."""
    H = _hidden(p, X)
    A = jnp.swapaxes(H, -1, -2) @ H
    nh = A.shape[-1]
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / nh
    A = A + ridge * tr * jnp.eye(nh, dtype=A.dtype)
    b = jnp.swapaxes(H, -1, -2) @ Y
    from ..ops.linalg_mxu import pd_solve_ns
    W2 = pd_solve_ns(A, b, iters=40)
    return p._replace(W2=W2)


def elm_predict(p: ElmParams, X: jnp.ndarray) -> jnp.ndarray:
    return _hidden(p, X) @ p.W2


def elm_fit_classifier(p: ElmParams, X: jnp.ndarray, labels: jnp.ndarray,
                       n_classes: int, ridge: float = 1e-6) -> ElmParams:
    Y = jax.nn.one_hot(labels, n_classes, dtype=X.dtype)
    return elm_fit(p, X, Y, ridge)


def elm_classify(p: ElmParams, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(elm_predict(p, X), axis=-1)
