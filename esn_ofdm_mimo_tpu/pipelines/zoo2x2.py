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
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..models import zoo
from ..models.elm import init_elm, elm_fit
from ..models.esn_mimo import build_esn_io, build_esn_input, _deinterleave_reim
from ..ops import symbols_to_bits_hard
from ..ops.fft_mxu import fft_mxu
from ..utils.rng import fold_key
from .common import (_link_budget, data_bits_for_blocks,
                     detect_data_symbols, synth_block)

_K_ZOO = 21
WINDOW = 8


class ZooCounts(NamedTuple):
    bit_errors: dict
    total_bits: jnp.ndarray
    train_nmse: dict      # per-model scalar sums (divide by n_blocks)
    n_blocks: jnp.ndarray


def _td_to_symbols(pred: jnp.ndarray, delay: int, cp: int, N: int, sqrt_pi):
    """Model TD output rows (B, T+d, 2n_tx) -> frequency symbols (B, N, n_tx).

    Row delay+cp .. delay+cp+N-1 of the target layout is the post-CP payload
    (same slice as the ESN detection path)."""
    x_td = _deinterleave_reim(pred[:, delay + cp:delay + cp + N])
    X = fft_mxu(x_td, axis=-1) / N / jnp.asarray(sqrt_pi)
    return jnp.moveaxis(X, -2, -1)


def run_zoo_blocks(cfg: SimConfig, ebno_db, bkeys, epochs: int = 50
                   ) -> ZooCounts:
    """Simulate blocks with the full detector zoo; returns BER counters."""
    ofdm = cfg.ofdm
    N, cp, m = ofdm.n_subcarriers, ofdm.cp_len, ofdm.bits_per_symbol
    n_tx, n_rx = cfg.channel.n_tx, cfg.channel.n_rx
    D = cfg.data_symbols_per_block
    B = bkeys.shape[0]
    delay = cfg.esn.shared_delay(ofdm.isi_duration)
    _, pi, sqrt_pi, _ = _link_budget(cfg, ebno_db)

    state = synth_block(cfg, ebno_db, bkeys)
    code_bits, _ = data_bits_for_blocks(cfg, bkeys, D, None)
    data = detect_data_symbols(
        cfg, state, ebno_db, bkeys, code_bits,
        detectors=("esn", "zf_perfect", "zf_ls", "mmse"))

    # ---- per-block training data: the pilot in ESN layout ----
    # re-synthesise from the state? detect path needs y/x pilot; rebuild here
    # via the stored taps is wasteful — synth_block already trained the ESN,
    # so only the extra models need the IO pairs. Recompute them cheaply from
    # the data members we kept: not stored, so re-run the pilot TX/RX chain.
    from .common import _vfold, _vawgn, _vbits, _tx_chain, _K_PBITS, _K_PNOISE
    from ..ops import bits_to_symbols, apply_fir_channel
    mp = ofdm.bits_per_pilot_symbol
    var_x = 10.0 ** (ebno_db / 10.0) * ofdm.noise_psd * N
    from ..ops.pa import clip_amplitude
    a_clip = clip_amplitude(var_x, cfg.pa.clip_level_db)
    pbits = _vbits(_vfold(bkeys, _K_PBITS), (n_tx, N * mp))
    X_p = bits_to_symbols(pbits, mp)
    x_cp = _tx_chain(X_p, cp, sqrt_pi, a_clip, cfg.pa.enabled,
                     cfg.pa.smoothness)
    noise = _vawgn(_vfold(bkeys, _K_PNOISE), (n_rx, N + cp), ofdm.noise_psd,
                   N + cp)
    y_cp = apply_fir_channel(state.taps, x_cp) + noise
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
        return res.params, res.losses[-1]

    def train_rnn(xin, xout, key):
        params = zoo.rnn_init(key, 2 * n_rx, 32, 2 * n_tx)
        res = zoo.train_regressor(zoo.rnn_apply, params, xin[None], xout[None],
                                  epochs=epochs, lr=1e-2)
        return res.params, res.losses[-1]

    def train_fnn(xin, xout, key):
        feats = zoo.window_flatten(xin[None], WINDOW)
        params = zoo.mlp_init(key, (WINDOW * 2 * n_rx, 64, 2 * n_tx))
        res = zoo.train_regressor(zoo.mlp_apply, params, feats, xout[None],
                                  epochs=epochs, lr=3e-3)
        return res.params, res.losses[-1]

    cnn_p, cnn_l = jax.vmap(train_cnn)(X_in_std, X_out, jax.random.split(kc, B))
    rnn_p, rnn_l = jax.vmap(train_rnn)(X_in_std, X_out, jax.random.split(kr, B))
    fnn_p, fnn_l = jax.vmap(train_fnn)(X_in_std, X_out, jax.random.split(kf, B))

    elm0 = init_elm(ke, WINDOW * 2 * n_rx, 128, 2 * n_tx)
    feats = zoo.window_flatten(X_in_std, WINDOW)
    elm_p = elm_fit(elm0, feats, X_out)                 # batched closed form

    # ---- data-path detection for the extra models ----
    # rebuild the per-data-symbol TD inputs the same way the ESN does
    from .common import _K_DNOISE
    dbits = code_bits
    X_d = bits_to_symbols(dbits, m)
    x_cp_d = _tx_chain(X_d, cp, sqrt_pi, a_clip, cfg.pa.enabled,
                       cfg.pa.smoothness)
    noise_d = _vawgn(_vfold(bkeys, _K_DNOISE), (D, n_rx, N + cp),
                     ofdm.noise_psd, N + cp)
    y_cp_d = apply_fir_channel(state.taps[:, None], x_cp_d) + noise_d
    Yin = build_esn_input(y_cp_d.reshape(B * D, n_rx, N + cp), delay)
    Yin = Yin.reshape(B, D, -1, 2 * n_rx)
    # apply the pilot-fitted standardisation at detection time
    Yin = (Yin - feat_mu[:, None]) / feat_sd[:, None]

    X_hat = dict(data.X_hat)

    def detect_with(apply_fn, params_b, feats_fn=lambda x: x):
        def one(params, yin):  # yin (D, T+d, 2n_rx)
            return apply_fn(params, feats_fn(yin))
        pred = jax.vmap(one)(params_b, Yin)             # (B, D, T+d, 2n_tx)
        pred_flat = pred.reshape(B * D, -1, 2 * n_tx)
        Xh = _td_to_symbols(pred_flat, delay, cp, N, sqrt_pi)
        return Xh.reshape(B, D, N, n_tx)

    X_hat["cnn"] = detect_with(zoo.cnn_apply, cnn_p)
    X_hat["rnn"] = detect_with(zoo.rnn_apply, rnn_p)
    X_hat["fnn"] = detect_with(zoo.mlp_apply, fnn_p,
                               lambda x: zoo.window_flatten(x, WINDOW))

    # ELM: shared random hidden layer, per-block readout W2 (B, nh, 2n_tx)
    feats_d = zoo.window_flatten(Yin, WINDOW)           # (B, D, T+d, W*2n_rx)
    Hd = jnp.tanh(feats_d @ elm_p.W1.T + elm_p.b1)
    pred = jnp.einsum("bdth,bho->bdto", Hd, elm_p.W2)
    X_hat["elm"] = _td_to_symbols(pred.reshape(B * D, -1, 2 * n_tx), delay,
                                  cp, N, sqrt_pi).reshape(B, D, N, n_tx)

    bit_errors = {}
    for name, Xh in X_hat.items():
        z = jnp.moveaxis(Xh, -1, -2)
        rx = symbols_to_bits_hard(z, m)
        bit_errors[name] = jnp.sum((rx != code_bits).astype(jnp.int32))

    train_nmse = {"cnn": jnp.sum(cnn_l), "rnn": jnp.sum(rnn_l),
                  "fnn": jnp.sum(fnn_l)}
    return ZooCounts(bit_errors=bit_errors,
                     total_bits=jnp.asarray(code_bits.size, jnp.int32),
                     train_nmse=train_nmse,
                     n_blocks=jnp.asarray(B, jnp.int32))
