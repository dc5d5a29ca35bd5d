"""Shared coherence-block machinery for the Monte-Carlo pipelines.

One *coherence block* = channel draw + pilot symbol + ESN training +
(L-1) data symbols (the reference's `kk % L == 1` schedule,
OFDM_SISO_NBF_LDPC.py:270). Blocks are statistically independent given their
PRNG keys, so the framework batches B blocks per call (vmapped shapes, shared
ESN reservoir per batch for MXU-shaped recurrences) and shards batches across
devices; see parallel/montecarlo.py.

RNG contract: every per-block random draw is derived from that block's own
key (folded from the global block id by the caller, utils/rng.block_keys), so
a sharded run draws the same randomness per block regardless of device count.
Two deliberate exceptions, both tied to the *first* key of the local batch:
the shared ESN reservoir and the ESN state-noise stream — sharing these
across the batch is what turns the recurrence into an MXU matmul. Sharded
runs are bit-identical to a single-device run whenever the per-device batch
decomposition matches the single-device batching; they are statistically
identical always.

All functions take `cfg` statically and Eb/N0 as a *traced* scalar, so one
compiled program serves the whole SNR grid.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..models.esn import EsnReservoir, EsnScale, init_reservoir
from ..models.esn_mimo import (train_mimo_esn, train_mimo_esn_per_block,
                               esn_detect_symbols,
                               esn_detect_symbols_per_block)
from ..ops import (
    bits_to_symbols, ofdm_modulate, ofdm_demodulate,
    draw_exp_pdp_taps, draw_cdlb_taps, draw_flat_awgn_tap,
    apply_fir_channel, taps_to_freq_response,
    estimate_channel,
)
from ..ops.equalize import equalizer_weights, apply_equalizer
from ..ops.pa import rapp_pa, clip_amplitude
from ..utils.rng import fold_key

# purpose tags for key folding (arbitrary distinct ints)
_K_CHAN, _K_PBITS, _K_PNOISE, _K_ESNFIT = 1, 2, 3, 5
_K_PNOISE_F, _K_ESNFIT_F, _K_DBITS, _K_DNOISE, _K_DETECT = 6, 7, 8, 9, 10
_K_RESERVOIR = 11


def _vfold(bkeys, *tags):
    """Fold purpose tags into each key of a (B,) key array."""
    return jax.vmap(lambda k: fold_key(k, *tags))(bkeys)


def _vbits(bkeys, shape):
    """Per-block random bits: bkeys (B,) -> (B, *shape) int8."""
    return jax.vmap(
        lambda k: jax.random.bernoulli(k, 0.5, shape).astype(jnp.int8))(bkeys)


def _vawgn(bkeys, shape, noise_psd, seq_len):
    """Per-block complex AWGN with the reference's length-scaled std
    (std per real dim = sqrt(seq_len*No/2), OFDM_SISO_NBF_LDPC.py:309,425)."""
    std = jnp.sqrt(seq_len * noise_psd / 2.0)

    def one(k):
        kr, ki = jax.random.split(k)
        return (std * (jax.random.normal(kr, shape)
                       + 1j * jax.random.normal(ki, shape))).astype(jnp.complex64)

    return jax.vmap(one)(bkeys)


class BlockState(NamedTuple):
    """Everything a data symbol needs from its coherence block (batch B)."""
    taps: jnp.ndarray        # (B, n_rx, n_tx, isi)
    H_true: jnp.ndarray      # (B, N, n_rx, n_tx)
    H_ls: jnp.ndarray        # (B, N, n_rx, n_tx)
    H_mmse: jnp.ndarray      # (B, N, n_rx, n_tx)
    reservoir: EsnReservoir  # shared across the batch
    scale_m: EsnScale        # SNR-matched input scaling
    scale_f: Optional[EsnScale]     # fixed-train-SNR scaling (None if off)
    Wt_out_m: jnp.ndarray    # (B, F, 2*n_tx) matched readout
    Wt_out_f: Optional[jnp.ndarray]  # fixed-SNR readout


def _draw_taps(cfg: SimConfig, bkeys) -> jnp.ndarray:
    ch, ofdm = cfg.channel, cfg.ofdm
    if ch.kind == "exp_pdp":
        fn = lambda k: draw_exp_pdp_taps(k, ch.n_rx, ch.n_tx, ofdm.isi_duration)
    elif ch.kind in ("cdl_a", "cdl_b", "cdl_c"):
        from ..ops.channel import draw_tdl_taps
        profile = ch.kind[-1]
        fn = lambda k: draw_tdl_taps(k, ch.n_rx, ch.n_tx, ofdm.isi_duration,
                                     ofdm.sample_rate_hz, ch.delay_spread_ns,
                                     profile=profile)
    elif ch.kind == "awgn_flat":
        fn = lambda k: draw_flat_awgn_tap(k, ch.n_rx, ch.n_tx)
    else:
        raise ValueError(f"unknown channel kind {ch.kind}")
    return jax.vmap(fn)(bkeys)


def _tx_chain(X: jnp.ndarray, cp: int, sqrt_pi, a_clip, pa_on: bool,
              smoothness: float, return_clean: bool = False):
    """Frequency symbols (..., n_tx, N) -> PA-clipped TD waveform (..., n_tx, T).

    return_clean: also return the scaled waveform BEFORE the PA (the
    reference's `x_CP`, vs the PA output `x_CP_NLD`) — the parity ESN
    training target (EsnConfig.target_waveform)."""
    x_clean = ofdm_modulate(X, cp) * jnp.asarray(sqrt_pi)
    x_cp = rapp_pa(x_clean, a_clip, smoothness) if pa_on else x_clean
    if return_clean:
        return x_cp, x_clean
    return x_cp


def _esn_target(cfg: SimConfig, x_cp: jnp.ndarray, x_clean: jnp.ndarray
                ) -> jnp.ndarray:
    """Select the ESN teacher waveform per EsnConfig.target_waveform."""
    mode = cfg.esn.target_waveform
    if mode == "pre_pa":
        return x_clean
    if mode == "post_pa":
        return x_cp
    raise ValueError(f"unknown esn target_waveform {mode!r}")


def _link_budget(cfg: SimConfig, ebno_db):
    No, N = cfg.ofdm.noise_psd, cfg.ofdm.n_subcarriers
    var_x = 10.0 ** (ebno_db / 10.0) * No * N
    pi = var_x / N
    return var_x, pi, jnp.sqrt(pi), clip_amplitude(var_x, cfg.pa.clip_level_db)


def synth_block(cfg: SimConfig, ebno_db, bkeys, esn_over=None,
                return_pilot: bool = False):
    """Simulate the coherence-block head for a batch of B blocks:
    channel draw, pilot synthesis, channel estimation, ESN training
    (reference OFDM_SISO_NBF_LDPC.py:270-384). bkeys: (B,) per-block keys.

    esn_over: optional dict of *traced* ESN hyperparameter overrides
    (spectral_radius / sparsity / noise / input_scaler / teacher_scaling) —
    lets hyperparameter sweeps reuse one compiled program per sweep.
    return_pilot: also return the pilot waveforms (y_cp, x_cp) so callers
    that train extra per-block models on the pilot (pipelines/zoo2x2) do not
    re-run the pilot TX/RX chain. Returns BlockState, or
    (BlockState, (y_cp, x_cp)) when return_pilot."""
    ofdm, esn_cfg = cfg.ofdm, cfg.esn
    N, cp, isi = ofdm.n_subcarriers, ofdm.cp_len, ofdm.isi_duration
    n_tx, n_rx = cfg.channel.n_tx, cfg.channel.n_rx
    mp = ofdm.bits_per_pilot_symbol
    No = ofdm.noise_psd
    T = N + cp

    var_x, pi, sqrt_pi, a_clip = _link_budget(cfg, ebno_db)

    taps = _draw_taps(cfg, _vfold(bkeys, _K_CHAN))
    H_true = taps_to_freq_response(taps, N)

    # ---- pilot synthesis ----
    pbits = _vbits(_vfold(bkeys, _K_PBITS), (n_tx, N * mp))
    X_p = bits_to_symbols(pbits, mp)                     # (B, n_tx, N)
    comb = (jnp.arange(N)[None, :] % n_tx) == jnp.arange(n_tx)[:, None]
    X_ls = X_p * comb                                    # comb pilot grid

    x_cp, x_clean = _tx_chain(X_p, cp, sqrt_pi, a_clip, cfg.pa.enabled,
                              cfg.pa.smoothness, return_clean=True)
    x_tgt = _esn_target(cfg, x_cp, x_clean)       # ESN teacher (ref: x_CP)
    x_ls_cp = _tx_chain(X_ls, cp, sqrt_pi, a_clip, cfg.pa.enabled,
                        cfg.pa.smoothness)

    # same noise realisation on the full and comb pilot waveforms (:309-311)
    noise = _vawgn(_vfold(bkeys, _K_PNOISE), (n_rx, T), No, T)
    y_cp = apply_fir_channel(taps, x_cp) + noise
    y_ls_cp = apply_fir_channel(taps, x_ls_cp) + noise

    Y_ls = ofdm_demodulate(y_ls_cp, cp)                  # (B, n_rx, N)
    if cfg.channel.flat_scalar_ls:
        # SISO-AWGN demo: scalar subcarrier-averaged LS estimate, and the
        # MMSE equalizer uses the TRUE channel (Demo_SISO...:213-216,260-266)
        # SISO only (n_tx == n_rx == 1): Y/(X*sqrt_pi) elementwise over N
        h_scalar = jnp.mean(Y_ls / (X_p * sqrt_pi), axis=-1)   # (B, n_rx)
        H_ls = jnp.broadcast_to(
            h_scalar[:, None, :, None], H_true.shape).astype(H_true.dtype)
        H_mmse = H_true
    else:
        H_ls, H_mmse = estimate_channel(
            Y_ls, X_ls, sqrt_pi, n_tx, isi, No, pi)

    # ---- ESN training (batch-shared reservoir by default; rng_mode="block"
    # draws one reservoir per block for layout-invariant counters) ----
    ov = esn_over or {}
    per_block = esn_cfg.rng_mode == "block"

    def _one_reservoir(k):
        return init_reservoir(
            fold_key(k, _K_RESERVOIR), 2 * n_rx, 2 * n_tx,
            esn_cfg.n_reservoir,
            ov.get("spectral_radius", esn_cfg.spectral_radius),
            ov.get("sparsity", esn_cfg.sparsity),
            ov.get("noise", esn_cfg.noise))

    # lax.map (not vmap) in block mode: the one-block body compiles once,
    # so the draw is bit-identical for any local batch size (vmap's
    # re-batched reductions are not — see train_mimo_esn_per_block)
    from ..models.esn_mimo import map_blocks_stable
    res = (map_blocks_stable(_one_reservoir, bkeys) if per_block
           else _one_reservoir(bkeys[0]))
    delay = esn_cfg.shared_delay(isi)

    def _fit(sc, y, x, tag):
        if per_block:
            return train_mimo_esn_per_block(
                res, sc, y, x, delay, cp, _vfold(bkeys, tag),
                precision=esn_cfg.recurrence_precision)
        return train_mimo_esn(res, sc, y, x, delay, cp,
                              fold_key(bkeys[0], tag),
                              precision=esn_cfg.recurrence_precision)
    in_scaler = ov.get("input_scaler", esn_cfg.input_scaler)
    t_scaling = ov.get("teacher_scaling", esn_cfg.teacher_scaling)
    scale_m = EsnScale(
        input_scaling=jnp.asarray(in_scaler) / jnp.sqrt(var_x),
        input_shift=jnp.float32(esn_cfg.input_offset / esn_cfg.input_scaler),
        teacher_scaling=jnp.asarray(t_scaling, dtype=jnp.float32))
    Wt_out_m = _fit(scale_m, y_cp, x_tgt, _K_ESNFIT)

    scale_f = None
    Wt_out_f = None
    if esn_cfg.train_ebno_fixed_db is not None:
        # re-synthesise the same pilot at the fixed training SNR (:347-357)
        var_f = 10.0 ** (esn_cfg.train_ebno_fixed_db / 10.0) * No * N
        pi_f = var_f / N
        a_clip_f = clip_amplitude(var_f, cfg.pa.clip_level_db)
        x_cp_f, x_clean_f = _tx_chain(X_p, cp, jnp.sqrt(pi_f), a_clip_f,
                                      cfg.pa.enabled, cfg.pa.smoothness,
                                      return_clean=True)
        noise_f = _vawgn(_vfold(bkeys, _K_PNOISE_F), (n_rx, T), No, T)
        y_cp_f = apply_fir_channel(taps, x_cp_f) + noise_f
        scale_f = EsnScale(
            input_scaling=jnp.asarray(in_scaler) / jnp.sqrt(var_f),
            input_shift=jnp.float32(esn_cfg.input_offset / esn_cfg.input_scaler),
            teacher_scaling=jnp.float32(esn_cfg.teacher_scaling))
        Wt_out_f = _fit(scale_f, y_cp_f,
                        _esn_target(cfg, x_cp_f, x_clean_f), _K_ESNFIT_F)

    state = BlockState(taps=taps, H_true=H_true, H_ls=H_ls, H_mmse=H_mmse,
                       reservoir=res, scale_m=scale_m, scale_f=scale_f,
                       Wt_out_m=Wt_out_m, Wt_out_f=Wt_out_f)
    if return_pilot:
        # the returned target is the same teacher the ESN trained on (the
        # reference trains ALL zoo models on (y_CP_NLD, x_CP),
        # Demo_MIMO_2x2_all_DL_model_comparion.py:310)
        return state, (y_cp, x_tgt)
    return state


class DataSymbols(NamedTuple):
    """Per-detector frequency-domain symbol estimates for D data symbols."""
    X_true: jnp.ndarray          # (B, D, N, n_tx) transmitted symbols
    Y: jnp.ndarray               # (B, D, n_rx, N) received freq symbols
    X_hat: dict                  # detector name -> (B, D, N, n_tx)


def detect_data_symbols(cfg: SimConfig, state: BlockState, ebno_db, bkeys,
                        code_bits: jnp.ndarray,
                        detectors: Tuple[str, ...] = (
                            "esn", "esn_fixed", "zf_perfect", "zf_ls", "mmse"),
                        return_td: bool = False):
    """Run D data symbols through TX -> channel -> all detectors.

    code_bits: (B, D, n_tx, N*m) bits already produced (coded or raw).
    Reference data path: OFDM_SISO_NBF_LDPC.py:387-460.
    return_td: also return the time-domain waveforms (y_cp, x_cp) — used by
    pipelines/zoo2x2 to feed the extra per-block models without re-running
    the TX/channel chain. Returns DataSymbols, or
    (DataSymbols, (y_cp, x_cp)) when return_td.
    """
    ofdm = cfg.ofdm
    N, cp, m = ofdm.n_subcarriers, ofdm.cp_len, ofdm.bits_per_symbol
    n_tx, n_rx = cfg.channel.n_tx, cfg.channel.n_rx
    No = ofdm.noise_psd
    T = N + cp
    B, D = code_bits.shape[:2]

    _, pi, sqrt_pi, a_clip = _link_budget(cfg, ebno_db)

    X = bits_to_symbols(code_bits, m)                    # (B, D, n_tx, N)
    x_cp, x_clean = _tx_chain(X, cp, sqrt_pi, a_clip, cfg.pa.enabled,
                              cfg.pa.smoothness, return_clean=True)
    noise = _vawgn(_vfold(bkeys, _K_DNOISE), (D, n_rx, T), No, T)
    y_cp = apply_fir_channel(state.taps[:, None], x_cp) + noise
    Y = ofdm_demodulate(y_cp, cp)                        # (B, D, n_rx, N)

    X_hat = {}
    delay = cfg.esn.shared_delay(ofdm.isi_duration)

    per_block = cfg.esn.rng_mode == "block"

    def _esn(scale, Wt_out, tag):
        if per_block:
            # layout-invariant mode: block b's symbols run on ITS reservoir
            # with a noise stream folded from its own key
            return esn_detect_symbols_per_block(
                state.reservoir, scale, Wt_out, y_cp, delay, cp, N, sqrt_pi,
                _vfold(bkeys, _K_DETECT, tag),
                precision=cfg.esn.recurrence_precision)
        # rows are block-major (D contiguous symbols per block), so the
        # (B, F, n_out) readout is passed grouped — esn_predict batches the
        # per-step readout contraction per block instead of re-reading a
        # D-times-repeated readout tensor from HBM every scan step.
        y_flat = y_cp.reshape(B * D, n_rx, T)
        Xh = esn_detect_symbols(state.reservoir, scale, Wt_out, y_flat, delay,
                                cp, N, sqrt_pi,
                                fold_key(bkeys[0], _K_DETECT, tag),
                                precision=cfg.esn.recurrence_precision)
        return Xh.reshape(B, D, N, n_tx)

    if "esn" in detectors:
        X_hat["esn"] = _esn(state.scale_m, state.Wt_out_m, 0)
    if "esn_fixed" in detectors and state.Wt_out_f is not None:
        X_hat["esn_fixed"] = _esn(state.scale_f, state.Wt_out_f, 1)
    # the channel is block-constant: factor each equalizer once per
    # (block, subcarrier) and apply it to all D symbols as one matmul
    if "zf_perfect" in detectors:
        We = equalizer_weights(state.H_true, jnp.float32(1e-12))
        X_hat["zf_perfect"] = apply_equalizer(We, Y, sqrt_pi)
    if "zf_ls" in detectors:
        We = equalizer_weights(state.H_ls, jnp.float32(1e-12))
        X_hat["zf_ls"] = apply_equalizer(We, Y, sqrt_pi)
    if "mmse" in detectors:
        We = equalizer_weights(state.H_mmse, No / pi)
        X_hat["mmse"] = apply_equalizer(We, Y, sqrt_pi)

    X_true = jnp.moveaxis(X, -2, -1)                     # (B, D, N, n_tx)
    data = DataSymbols(X_true=X_true, Y=Y, X_hat=X_hat)
    if return_td:
        # test-NMSE reference waveform = the same domain the models were
        # trained to emit (EsnConfig.target_waveform)
        return data, (y_cp, _esn_target(cfg, x_cp, x_clean))
    return data


def data_bits_for_blocks(cfg: SimConfig, bkeys, n_data: int, code=None):
    """Draw info bits per block and (optionally) LDPC-encode them.

    Returns (code_bits (B, D, n_tx, N*m), info_bits (B, D, n_tx, k) or None).
    """
    ofdm = cfg.ofdm
    N, m = ofdm.n_subcarriers, ofdm.bits_per_symbol
    n_tx = cfg.channel.n_tx
    kbits = _vfold(bkeys, _K_DBITS)
    if code is None:
        return _vbits(kbits, (n_data, n_tx, N * m)), None
    from ..ldpc import ldpc_encode
    u = _vbits(kbits, (n_data, n_tx, code.k))
    cw = ldpc_encode(code, u)
    return cw, u
