"""Small deep-model zoo in pure JAX + optax: MLP, Conv1D-CNN, GRU-style RNN.

Capability parity with the reference's per-block trained baselines
(Demo_MIMO_2x2_all_DL_model_comparion.py:55-107 Keras builders and
system_model_2_all_comparision.py:14-49 torch modules): small regression
networks mapping time-domain received features to time-domain transmit
estimates, trained per coherence block with Adam for a few dozen epochs,
and the Sionna-pipeline classifier variants (esn_via_cdl_all_model.py:154-178)
mapping equalized (re, im) pairs to 16-class logits.

Design: stateless functional modules (init/apply pairs) + one generic Adam
training loop `train_regressor` that runs entirely inside jit via lax.scan —
no Python-per-epoch overhead, batched over coherence blocks when vmapped.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


# ---------------- MLP ----------------

def mlp_init(key, sizes: Sequence[int]):
    """sizes = (n_in, h1, ..., n_out); tanh hidden, linear output."""
    params = []
    for i, (a, b) in enumerate(zip(sizes[:-1], sizes[1:])):
        kw, key = jax.random.split(key)
        params.append({
            "w": jax.random.normal(kw, (a, b)) * jnp.sqrt(2.0 / a),
            "b": jnp.zeros(b)})
    return params


def mlp_apply(params, x, hidden_act=jnp.tanh, out_act=None):
    for i, lyr in enumerate(params):
        x = x @ lyr["w"] + lyr["b"]
        if i < len(params) - 1:
            x = hidden_act(x)
        elif out_act is not None:
            x = out_act(x)
    return x


# ---------------- Conv1D CNN ----------------

def cnn_init(key, n_in: int, n_out: int, channels: Sequence[int] = (32, 32),
             kernel: int = 3):
    """1-D conv stack over the time axis + linear head per time step."""
    params = []
    c_prev = n_in
    for c in channels:
        kw, key = jax.random.split(key)
        params.append({
            "w": jax.random.normal(kw, (kernel, c_prev, c))
            * jnp.sqrt(2.0 / (kernel * c_prev)),
            "b": jnp.zeros(c)})
        c_prev = c
    kw, key = jax.random.split(key)
    head = {"w": jax.random.normal(kw, (c_prev, n_out)) * jnp.sqrt(1.0 / c_prev),
            "b": jnp.zeros(n_out)}
    return {"convs": params, "head": head}


def cnn_apply(params, x):
    """x (..., T, n_in) -> (..., T, n_out); SAME padding, ReLU."""
    for lyr in params["convs"]:
        x = jax.lax.conv_general_dilated(
            x, lyr["w"], window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + lyr["b"]
        x = jax.nn.relu(x)
    return x @ params["head"]["w"] + params["head"]["b"]


# ---------------- GRU RNN ----------------

def rnn_init(key, n_in: int, n_hidden: int, n_out: int):
    k1, k2, k3 = jax.random.split(key, 3)
    s_in = jnp.sqrt(1.0 / n_in)
    s_h = jnp.sqrt(1.0 / n_hidden)
    return {
        "wi": jax.random.normal(k1, (n_in, 3 * n_hidden)) * s_in,
        "wh": jax.random.normal(k2, (n_hidden, 3 * n_hidden)) * s_h,
        "bi": jnp.zeros(3 * n_hidden),
        "head": {"w": jax.random.normal(k3, (n_hidden, n_out)) * s_h,
                 "b": jnp.zeros(n_out)},
    }


def rnn_apply(params, x):
    """GRU over (..., T, n_in) -> (..., T, n_out), scanned over time."""
    nh = params["wh"].shape[0]
    lead = x.shape[:-2]
    h0 = jnp.zeros((*lead, nh))
    xs = jnp.moveaxis(x @ params["wi"] + params["bi"], -2, 0)  # (T, ..., 3nh)

    def step(h, gi):
        gh = h @ params["wh"]
        r = jax.nn.sigmoid(gi[..., :nh] + gh[..., :nh])
        z = jax.nn.sigmoid(gi[..., nh:2 * nh] + gh[..., nh:2 * nh])
        n = jnp.tanh(gi[..., 2 * nh:] + r * gh[..., 2 * nh:])
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, xs)
    hs = jnp.moveaxis(hs, 0, -2)  # (..., T, nh)
    return hs @ params["head"]["w"] + params["head"]["b"]


# ---------------- generic in-jit Adam training ----------------

class TrainResult(NamedTuple):
    params: any
    losses: jnp.ndarray


# jit wrappers keyed on (apply_fn, epochs, lr, ...) — model apply functions
# are module-level (stable identity), so repeated calls across an SNR sweep
# reuse one compilation per model
@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _train_regressor_jit(apply_fn, params, X, Y, epochs, lr):
    return train_regressor(apply_fn, params, X, Y, epochs, lr)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6, 7))
def _train_classifier_jit(apply_fn, params, X, labels, epochs, lr, l2,
                          l2_keys):
    return train_classifier(apply_fn, params, X, labels, epochs, lr, l2,
                            l2_keys)


def train_regressor_cached(apply_fn, params, X, Y, epochs=50, lr=1e-3):
    return _train_regressor_jit(apply_fn, params, X, Y, epochs, lr)


def train_classifier_cached(apply_fn, params, X, labels, epochs=200,
                            lr=1e-3, l2=0.0, l2_keys=None):
    return _train_classifier_jit(apply_fn, params, X, labels, epochs, lr, l2,
                                 l2_keys)


def train_regressor(apply_fn: Callable, params, X: jnp.ndarray,
                    Y: jnp.ndarray, epochs: int = 50, lr: float = 1e-3
                    ) -> TrainResult:
    """Full-batch Adam on MSE, entirely inside jit via lax.scan.

    Mirrors the reference's per-block model fitting (50 Adam epochs on one
    pilot sequence, system_model_2_all_comparision.py:102-113).
    """
    opt = optax.adam(lr)

    def loss_fn(p):
        return jnp.mean((apply_fn(p, X) - Y) ** 2)

    def step(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, st = opt.update(g, st, p)
        return (optax.apply_updates(p, updates), st), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt.init(params)), None, length=epochs)
    return TrainResult(params=params, losses=losses)


def train_classifier(apply_fn: Callable, params, X: jnp.ndarray,
                     labels: jnp.ndarray, epochs: int = 200, lr: float = 1e-3,
                     l2: float = 0.0, l2_keys=None) -> TrainResult:
    """Full-batch Adam on softmax cross-entropy (the Sionna-pipeline training
    loop, esn_via_cdl_all_model.py:200-213).

    l2_keys: when params is a dict, restrict the L2 penalty to these
    top-level entries (the reference regularizes only the trainable readout
    weights, :205-213). Penalizing everything would hand Adam a nonzero
    gradient on entries the apply_fn freezes with stop_gradient (e.g. the
    fixed reservoir W_in) and silently decay them to zero.
    """
    opt = optax.adam(lr)

    def loss_fn(p):
        logits = apply_fn(p, X)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        reg_tree = ({k: p[k] for k in l2_keys} if l2_keys is not None else p)
        reg = sum(jnp.sum(leaf ** 2) for leaf in jax.tree.leaves(reg_tree))
        return jnp.mean(ce) + l2 * reg

    def step(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, st = opt.update(g, st, p)
        return (optax.apply_updates(p, updates), st), loss

    (params, _), losses = jax.lax.scan(
        step, (params, opt.init(params)), None, length=epochs)
    return TrainResult(params=params, losses=losses)


def window_flatten(x: jnp.ndarray, window: int = 8) -> jnp.ndarray:
    """(..., T, F) -> (..., T, window*F): causal sliding window, zero-padded.

    The reference's FNN/ELM feature layout (window-8 flattening,
    system_model_2_all_comparision.py:115-149).
    """
    pads = [(0, 0)] * (x.ndim - 2) + [(window - 1, 0), (0, 0)]
    xp = jnp.pad(x, pads)
    T = x.shape[-2]
    cols = [xp[..., t:t + T, :] for t in range(window)]
    return jnp.concatenate(cols, axis=-1)
