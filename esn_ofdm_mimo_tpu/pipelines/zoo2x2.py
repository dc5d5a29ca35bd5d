"""2x2 model-zoo comparison: ESN vs CNN/RNN/FNN/ELM vs classical equalizers.

Capability re-design of the reference's regression-style comparisons
(system_model_2_all_comparision.py and Demo_MIMO_2x2_all_DL_model_comparion.py,
SURVEY.md §3.5): every model shares the ESN's time-domain I/O layout — input
(T+d, 2*n_rx) received waveform features, target (T+d, 2*n_tx) delayed
transmit waveform — is trained per coherence block on the pilot symbol, and
detects by predicting the TD waveform, delay-slicing, FFT and 1/sqrt(Pi).

Model set and training mirror the reference: CNN (Conv1d stack) and RNN
trained with Adam for ~50 epochs on the single pilot sequence
(:102-113), FNN and ELM on window-8 flattened features with closed-form or
Adam fits (:115-149, fixed shared delay 3); classical Perfect-ZF/LS-ZF/MMSE
equalizers ride along from the common block machinery.

NMSE bookkeeping (reference Demo_MIMO_2x2_all_DL_model_comparion.py:577-598
tracks per-model train AND test NMSE into NMSE_compare.pkl): per block,
NMSE = ||pred − target||² / ||target||² on the TD regression target, train =
the pilot sequence, test = the D data symbols; the ESN's entries use the
reference's own nmse_for_delay definition (models/esn_mimo.esn_nmse). Sums
over blocks are returned — divide by n_blocks for means.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..models import zoo
from ..models.elm import init_elm, elm_fit
from ..models.esn_mimo import (build_esn_io, esn_nmse, _deinterleave_reim)
from ..ops import symbols_to_bits_hard
from ..ops.fft_mxu import fft_mxu
from ..utils.rng import fold_key
from .common import (_link_budget, data_bits_for_blocks,
                     detect_data_symbols, synth_block, _K_DETECT)

_K_ZOO = 21
WINDOW = 8


class ZooCounts(NamedTuple):
    bit_errors: dict
    total_bits: jnp.ndarray
    train_nmse: dict      # per-model scalar sums (divide by n_blocks)
    test_nmse: dict       # per-model scalar sums (divide by n_blocks)
    n_blocks: jnp.ndarray


def _td_to_symbols(pred: jnp.ndarray, delay: int, cp: int, N: int, sqrt_pi):
    """Model TD output rows (B, T+d, 2n_tx) -> frequency symbols (B, N, n_tx).

    Row delay+cp .. delay+cp+N-1 of the target layout is the post-CP payload
    (same slice as the ESN detection path)."""
    x_td = _deinterleave_reim(pred[:, delay + cp:delay + cp + N])
    X = fft_mxu(x_td, axis=-1) / N / jnp.asarray(sqrt_pi)
    return jnp.moveaxis(X, -2, -1)


def _nmse_sum(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sum over blocks of ||pred−target||²/||target||² (leading axis = B)."""
    axes = tuple(range(1, pred.ndim))
    err = jnp.sum((pred - target) ** 2, axis=axes)
    ref = jnp.sum(target ** 2, axis=axes) + 1e-12
    return jnp.sum(err / ref)


def run_zoo_blocks(cfg: SimConfig, ebno_db, bkeys, epochs: int = 50
                   ) -> ZooCounts:
    """Simulate blocks with the full detector zoo; returns BER counters."""
    ofdm = cfg.ofdm
    N, cp, m = ofdm.n_subcarriers, ofdm.cp_len, ofdm.bits_per_symbol
    n_tx, n_rx = cfg.channel.n_tx, cfg.channel.n_rx
    D = cfg.data_symbols_per_block
    B = bkeys.shape[0]
    T = N + cp
    delay = cfg.esn.shared_delay(ofdm.isi_duration)
    _, pi, sqrt_pi, _ = _link_budget(cfg, ebno_db)

    state, (y_cp, x_cp) = synth_block(cfg, ebno_db, bkeys, return_pilot=True)
    code_bits, _ = data_bits_for_blocks(cfg, bkeys, D, None)
    data, (y_cp_d, x_cp_d) = detect_data_symbols(
        cfg, state, ebno_db, bkeys, code_bits,
        detectors=("esn", "zf_perfect", "zf_ls", "mmse"), return_td=True)

    # ---- per-block training data: the pilot in ESN layout ----
    X_in, X_out = build_esn_io(y_cp, x_cp, delay)      # (B, T+d, 2n_rx/2n_tx)

    # per-block feature standardisation for the NN/ELM models (the reference
    # fits mean/std on the pilot and applies them at detection,
    # Demo_MIMO_2x2_all_DL_model_comparion.py:163-170)
    feat_mu = jnp.mean(X_in, axis=1, keepdims=True)          # (B, 1, 2n_rx)
    feat_sd = jnp.std(X_in, axis=1, keepdims=True) + 1e-9
    X_in_std = (X_in - feat_mu) / feat_sd

    kroot = fold_key(bkeys[0], _K_ZOO)
    kc, kr, kf, ke = jax.random.split(kroot, 4)

    # ---- train per-block models (vmapped over blocks) ----
    def train_cnn(xin, xout, key):
        params = zoo.cnn_init(key, 2 * n_rx, 2 * n_tx, channels=(32, 32))
        res = zoo.train_regressor(zoo.cnn_apply, params, xin[None], xout[None],
                                  epochs=epochs, lr=3e-3)
        return res.params

    def train_rnn(xin, xout, key):
        params = zoo.rnn_init(key, 2 * n_rx, 32, 2 * n_tx)
        res = zoo.train_regressor(zoo.rnn_apply, params, xin[None], xout[None],
                                  epochs=epochs, lr=1e-2)
        return res.params

    def train_fnn(xin, xout, key):
        feats = zoo.window_flatten(xin[None], WINDOW)
        params = zoo.mlp_init(key, (WINDOW * 2 * n_rx, 64, 2 * n_tx))
        res = zoo.train_regressor(zoo.mlp_apply, params, feats, xout[None],
                                  epochs=epochs, lr=3e-3)
        return res.params

    cnn_p = jax.vmap(train_cnn)(X_in_std, X_out, jax.random.split(kc, B))
    rnn_p = jax.vmap(train_rnn)(X_in_std, X_out, jax.random.split(kr, B))
    fnn_p = jax.vmap(train_fnn)(X_in_std, X_out, jax.random.split(kf, B))

    elm0 = init_elm(ke, WINDOW * 2 * n_rx, 128, 2 * n_tx)
    feats = zoo.window_flatten(X_in_std, WINDOW)
    elm_p = elm_fit(elm0, feats, X_out)                 # batched closed form

    def elm_predict(feats_std):  # (..., W*2n_rx) with leading (B, ...) axes
        H = jnp.tanh(feats_std @ elm_p.W1.T + elm_p.b1)
        return jnp.einsum("b...h,bho->b...o", H, elm_p.W2)

    def zoo_preds(xin_std):
        """Per-model TD predictions on standardized inputs (B, ..., 2n_rx)."""
        def per_block(apply_fn, params_b, feats_fn=lambda x: x):
            def one(params, x):  # x ([D,] T+d, 2n_rx) per block
                f = feats_fn(x)
                if f.ndim == 2:          # pilot: add the batch dim (static)
                    return apply_fn(params, f[None])[0]
                return apply_fn(params, f)
            return jax.vmap(one)(params_b, xin_std)
        return {
            "cnn": per_block(zoo.cnn_apply, cnn_p),
            "rnn": per_block(zoo.rnn_apply, rnn_p),
            "fnn": per_block(zoo.mlp_apply, fnn_p,
                             lambda x: zoo.window_flatten(x, WINDOW)),
            "elm": elm_predict(zoo.window_flatten(xin_std, WINDOW)),
        }

    # ---- train NMSE: predictions back over the pilot sequence ----
    train_preds = zoo_preds(X_in_std)
    train_nmse = {k: _nmse_sum(p, X_out) for k, p in train_preds.items()}
    train_nmse["esn"] = jnp.sum(esn_nmse(
        state.reservoir, state.scale_m, state.Wt_out_m, y_cp, x_cp, delay,
        cp, ofdm.isi_duration, fold_key(bkeys[0], _K_ZOO, 1)))

    # ---- data-path detection for the extra models ----
    # the TD waveforms come straight from detect_data_symbols (no re-synthesis)
    Yin_flat, Xout_flat = build_esn_io(
        y_cp_d.reshape(B * D, n_rx, T), x_cp_d.reshape(B * D, n_tx, T), delay)
    Yin = Yin_flat.reshape(B, D, -1, 2 * n_rx)
    Xout_d = Xout_flat.reshape(B, D, -1, 2 * n_tx)
    # apply the pilot-fitted standardisation at detection time
    Yin = (Yin - feat_mu[:, None]) / feat_sd[:, None]

    X_hat = dict(data.X_hat)
    test_preds = zoo_preds(Yin)                         # (B, D, T+d, 2n_tx)
    test_nmse = {k: _nmse_sum(p, Xout_d) for k, p in test_preds.items()}
    test_nmse["esn"] = jnp.sum(esn_nmse(
        state.reservoir, state.scale_m, state.Wt_out_m,
        y_cp_d.reshape(B * D, n_rx, T), x_cp_d.reshape(B * D, n_tx, T),
        delay, cp, ofdm.isi_duration,
        fold_key(bkeys[0], _K_DETECT, 2)).reshape(B, D).mean(axis=1))

    for name, pred in test_preds.items():
        pred_flat = pred.reshape(B * D, -1, 2 * n_tx)
        Xh = _td_to_symbols(pred_flat, delay, cp, N, sqrt_pi)
        X_hat[name] = Xh.reshape(B, D, N, n_tx)

    bit_errors = {}
    for name, Xh in X_hat.items():
        z = jnp.moveaxis(Xh, -1, -2)
        rx = symbols_to_bits_hard(z, m)
        bit_errors[name] = jnp.sum((rx != code_bits).astype(jnp.int32))

    return ZooCounts(bit_errors=bit_errors,
                     total_bits=jnp.asarray(code_bits.size, jnp.int32),
                     train_nmse=train_nmse, test_nmse=test_nmse,
                     n_blocks=jnp.asarray(B, jnp.int32))
