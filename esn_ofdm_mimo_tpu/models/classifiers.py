"""Symbol classifiers for the Sionna-style pipeline (system model 1).

The reference trains seven models to classify LMMSE-equalized complex
symbols into 16-QAM indices (esn_via_cdl_all_model.py:98-195):
  * traditional: nearest-constellation demapper (SymbolDemapper);
  * ESN single-step: a *stateless* random-reservoir feature map
    tanh(W_in x + W s)|_{s=0} with a trainable softmax readout — effectively
    random features + logistic regression (:98-121, state reset every call);
  * DeepESN: same features -> trainable ReLU(128) -> softmax (:123-152);
  * FNN / CNN / RNN builders (:154-178);
  * ELM: closed-form one-hot pinv readout (:180-195).

Here each is an (init, apply) pair over inputs (..., 2) = (re, im), reusing
the zoo modules; training uses zoo.train_classifier (Adam + xent in-jit).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.qam import hard_demap_index
from . import zoo
from .elm import ElmParams, elm_classify, elm_fit_classifier, init_elm


def traditional_demap(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """(...,) complex -> class index, the reference's SymbolDemapper."""
    return hard_demap_index(symbols, bits_per_symbol)


class EsnClassifierParams(NamedTuple):
    W_in: jnp.ndarray    # (2, n_res) fixed random input weights, U(-0.1, 0.1)
    W_out: jnp.ndarray   # (n_res, n_classes) trainable readout, zero init
    b_out: jnp.ndarray   # (n_classes,)


def esn_classifier_init(key, n_res: int = 600, n_classes: int = 16
                        ) -> EsnClassifierParams:
    """Reference ESNSingleStep init (esn_via_cdl_all_model.py:99-114):
    W_in ~ U(-0.1, 0.1) fixed, W_out zeros. The reference's W_res is unused
    math: the state is reset to zero every call (:117-121), so
    tanh(x W_in + 0 W_res) never sees it — not materialized here. Trainable
    count: 600*16 + 16 = 9,616, the reference's printed table."""
    ki, ko = jax.random.split(key)
    del ko
    return EsnClassifierParams(
        W_in=jax.random.uniform(ki, (2, n_res), minval=-0.1, maxval=0.1),
        W_out=jnp.zeros((n_res, n_classes)),
        b_out=jnp.zeros(n_classes))


def esn_classifier_apply(p: EsnClassifierParams, x: jnp.ndarray) -> jnp.ndarray:
    """x (..., 2) -> logits; state is zero each call, so the reservoir
    contributes only tanh(x @ W_in) features (reference :115-123)."""
    return jnp.tanh(x @ p.W_in) @ p.W_out + p.b_out


def esn_classifier_trainable(p: EsnClassifierParams):
    """Split into (trainable, static) for the Adam loop: W_in stays fixed."""
    return {"W_out": p.W_out, "b_out": p.b_out}


def esn_classifier_apply_full(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Module-level apply over the FULL param dict (stable identity for jit
    caching across an SNR sweep). W_in is frozen via stop_gradient — Adam
    sees zero gradient and leaves it untouched, matching the reference's
    fixed random reservoir (:98-121)."""
    W_in = jax.lax.stop_gradient(params["W_in"])
    return jnp.tanh(x @ W_in) @ params["W_out"] + params["b_out"]


def deep_esn_apply_full(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Full-param DeepESN apply; fixed W_in via stop_gradient."""
    W_in = jax.lax.stop_gradient(params["W_in"])
    from . import zoo
    return zoo.mlp_apply(params["hidden"], jnp.tanh(x @ W_in),
                         hidden_act=jax.nn.relu)


class DeepEsnParams(NamedTuple):
    W_in: jnp.ndarray     # (2, n_res) fixed
    hidden: dict          # trainable ReLU(600) layer + softmax head


def deep_esn_init(key, n_res: int = 600, n_hidden: int = 600,
                  n_classes: int = 16) -> DeepEsnParams:
    """Reference ESNSingleStepMulti, widened variant (:125-156): fixed
    reservoir features -> Dense(600, relu) -> Dense(16). Trainable count:
    600*600+600 + 600*16+16 = 370,216, the reference's printed table."""
    ki, kh = jax.random.split(key)
    W_in = jax.random.uniform(ki, (2, n_res), minval=-0.1, maxval=0.1)
    hidden = zoo.mlp_init(kh, (n_res, n_hidden, n_classes))
    return DeepEsnParams(W_in=W_in, hidden=hidden)


def deep_esn_apply(p: DeepEsnParams, x: jnp.ndarray) -> jnp.ndarray:
    return zoo.mlp_apply(p.hidden, jnp.tanh(x @ p.W_in),
                         hidden_act=jax.nn.relu)


def fnn_classifier_init(key, widths=(600,), n_classes: int = 16):
    """Reference build_simple_fc_16 widened variant (:158-163):
    Dense(600, relu) -> Dense(16). (The reference's printed count 12,160
    does not match its own builder, whose true count is 11,416 — the
    printout is a hardcoded string, reference :231; not replicated.)"""
    return zoo.mlp_init(key, (2, *widths, n_classes))


def fnn_classifier_apply(params, x):
    return zoo.mlp_apply(params, x, hidden_act=jax.nn.relu)


def cnn_classifier_init(key, n_classes: int = 16, channels: int = 128,
                        n_hidden: int = 600):
    """Reference build_cnn_16 (:165-174): Reshape((2,1)) -> Conv1D(128, k=1,
    relu) x2 -> Flatten -> Dense(600, relu) -> Dense(16). Kernel-1 convs over
    the length-2 (re, im) axis are pointwise denses applied per position.
    True trainable count 180,584 (the reference's printed 102,864 is another
    hardcoded-string mismatch, :232)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "c1": {"w": jax.random.normal(k1, (1, channels)) * jnp.sqrt(2.0),
               "b": jnp.zeros(channels)},
        "c2": {"w": jax.random.normal(k2, (channels, channels))
               * jnp.sqrt(2.0 / channels), "b": jnp.zeros(channels)},
        "mlp": zoo.mlp_init(k3, (2 * channels, n_hidden, n_classes)),
    }


def cnn_classifier_apply(params, x):
    """x (..., 2) -> logits: per-position pointwise convs then flatten."""
    h = x[..., None]                                   # (..., 2, 1)
    h = jax.nn.relu(h @ params["c1"]["w"] + params["c1"]["b"])
    h = jax.nn.relu(h @ params["c2"]["w"] + params["c2"]["b"])
    h = h.reshape(*x.shape[:-1], -1)                   # (..., 2*channels)
    return zoo.mlp_apply(params["mlp"], h, hidden_act=jax.nn.relu)


def rnn_classifier_init(key, n_hidden: int = 600, n_classes: int = 16):
    """Reference build_rnn_16 (:176-182): SimpleRNN(600) over a length-1
    sequence -> Dense(600, relu) -> Dense(16). With one time step and zero
    initial state the recurrence reduces to tanh(x W_x + b); the recurrent
    kernel W_h is kept in the param tree (zero gradient, like Keras') so the
    trainable count matches the architecture: 732,016."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wx": jax.random.normal(k1, (2, n_hidden)) * jnp.sqrt(1.0 / 2),
        "wh": jax.random.normal(k2, (n_hidden, n_hidden))
        * jnp.sqrt(1.0 / n_hidden),
        "b": jnp.zeros(n_hidden),
        "mlp": zoo.mlp_init(k3, (n_hidden, n_hidden, n_classes)),
    }


def rnn_classifier_apply(params, x):
    h = jnp.tanh(x @ params["wx"] + params["b"])
    return zoo.mlp_apply(params["mlp"], h, hidden_act=jax.nn.relu)


def elm_classifier_init(key, n_hidden: int = 600, n_classes: int = 16
                        ) -> ElmParams:
    return init_elm(key, 2, n_hidden, n_classes)


def elm_classifier_fit(p: ElmParams, x, labels, n_classes: int = 16):
    return elm_fit_classifier(p, x, labels, n_classes)


def elm_classifier_predict(p: ElmParams, x):
    return elm_classify(p, x)
