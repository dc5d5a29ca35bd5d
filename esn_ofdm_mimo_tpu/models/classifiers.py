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
    W_in: jnp.ndarray    # (2, n_res) fixed random input weights
    W_out: jnp.ndarray   # (n_res + 2, n_classes) trainable readout
    b_out: jnp.ndarray   # (n_classes,)


def esn_classifier_init(key, n_res: int = 600, n_classes: int = 16
                        ) -> EsnClassifierParams:
    ki, ko = jax.random.split(key)
    return EsnClassifierParams(
        W_in=jax.random.uniform(ki, (2, n_res), minval=-1.0, maxval=1.0),
        W_out=jax.random.normal(ko, (n_res + 2, n_classes)) * 0.01,
        b_out=jnp.zeros(n_classes))


def esn_classifier_apply(p: EsnClassifierParams, x: jnp.ndarray) -> jnp.ndarray:
    """x (..., 2) -> logits (..., n_classes); state is zero each call, so the
    reservoir contributes only tanh(x @ W_in) features (reference :115-123)."""
    feats = jnp.concatenate([jnp.tanh(x @ p.W_in), x], axis=-1)
    return feats @ p.W_out + p.b_out


def esn_classifier_trainable(p: EsnClassifierParams):
    """Split into (trainable, static) for the Adam loop: W_in stays fixed."""
    return {"W_out": p.W_out, "b_out": p.b_out}


def esn_classifier_apply_full(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Module-level apply over the FULL param dict (stable identity for jit
    caching across an SNR sweep). W_in is frozen via stop_gradient — Adam
    sees zero gradient and leaves it untouched, matching the reference's
    fixed random reservoir (:98-121)."""
    W_in = jax.lax.stop_gradient(params["W_in"])
    feats = jnp.concatenate([jnp.tanh(x @ W_in), x], axis=-1)
    return feats @ params["W_out"] + params["b_out"]


def deep_esn_apply_full(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Full-param DeepESN apply; fixed W_in via stop_gradient."""
    W_in = jax.lax.stop_gradient(params["W_in"])
    feats = jnp.concatenate([jnp.tanh(x @ W_in), x], axis=-1)
    from . import zoo
    return zoo.mlp_apply(params["hidden"], feats, hidden_act=jax.nn.relu)


class DeepEsnParams(NamedTuple):
    W_in: jnp.ndarray     # (2, n_res) fixed
    hidden: dict          # trainable ReLU layer + softmax head


def deep_esn_init(key, n_res: int = 600, n_hidden: int = 128,
                  n_classes: int = 16) -> DeepEsnParams:
    ki, kh = jax.random.split(key)
    W_in = jax.random.uniform(ki, (2, n_res), minval=-1.0, maxval=1.0)
    hidden = zoo.mlp_init(kh, (n_res + 2, n_hidden, n_classes))
    return DeepEsnParams(W_in=W_in, hidden=hidden)


def deep_esn_apply(p: DeepEsnParams, x: jnp.ndarray) -> jnp.ndarray:
    feats = jnp.concatenate([jnp.tanh(x @ p.W_in), x], axis=-1)
    return zoo.mlp_apply(p.hidden, feats, hidden_act=jax.nn.relu)


def fnn_classifier_init(key, widths=(128, 64), n_classes: int = 16):
    return zoo.mlp_init(key, (2, *widths, n_classes))


def fnn_classifier_apply(params, x):
    return zoo.mlp_apply(params, x, hidden_act=jax.nn.relu)


def cnn_classifier_init(key, n_classes: int = 16):
    return zoo.cnn_init(key, 2, n_classes, channels=(64, 64), kernel=3)


def cnn_classifier_apply(params, x):
    """x (..., 2): treat each symbol as a length-1 'sequence' with 2 chans."""
    return zoo.cnn_apply(params, x[..., None, :])[..., 0, :]


def rnn_classifier_init(key, n_hidden: int = 128, n_classes: int = 16):
    return zoo.rnn_init(key, 2, n_hidden, n_classes)


def rnn_classifier_apply(params, x):
    return zoo.rnn_apply(params, x[..., None, :])[..., 0, :]


def elm_classifier_init(key, n_hidden: int = 600, n_classes: int = 16
                        ) -> ElmParams:
    return init_elm(key, 2, n_hidden, n_classes)


def elm_classifier_fit(p: ElmParams, x, labels, n_classes: int = 16):
    return elm_fit_classifier(p, x, labels, n_classes)


def elm_classifier_predict(p: ElmParams, x):
    return elm_classify(p, x)
