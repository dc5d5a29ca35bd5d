"""Block-fading (NBF) Monte-Carlo pipeline: uncoded + LDPC-coded BER for the
ESN (matched & fixed-train-SNR), Perfect-ZF, LS-ZF and MMSE detectors.

This is the generic engine behind the reference's four NBF scripts
(OFDM_SISO_NBF_LDPC.py and its 1x2 / 2x2 / 4x8 clones — they differ only in
n_tx/n_rx/N/reservoir, SURVEY.md §2.2). One call simulates B coherence blocks
at one (traced) Eb/N0 and returns pure counters, so the sharded Monte-Carlo
runner can psum them across devices.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import SimConfig
from ..ldpc import (make_code, ldpc_decode_bp_counts,
                    llr_from_yobs)
from ..ops import symbols_to_bits_hard, qam_llrs_maxlog, est_sigma2_from_decision
from ..ops.analytics import channel_svd_metrics
from .common import synth_block, detect_data_symbols, data_bits_for_blocks

_DETECTORS = ("esn", "esn_fixed", "zf_perfect", "zf_ls", "mmse")

# fixed log10 histogram bins for condition numbers (percentiles computed on
# the aggregated histogram at reporting time; psum-able unlike percentiles)
# numpy on purpose: a module-level jnp array would initialise the XLA
# backend at import time, which breaks jax.distributed.initialize()
# (it must run before any backend use — tests/distributed_worker.py)
import numpy as _np  # noqa: E402
COND_BINS = _np.asarray([10.0 ** (i / 8.0) for i in range(0, 49)],
                        dtype=_np.float32)


class NbfCounts(NamedTuple):
    bit_errors: dict          # detector -> scalar int32 (uncoded code-bit errs)
    total_bits: jnp.ndarray
    info_errors: dict         # detector -> scalar int32 (post-LDPC info errs)
    total_info_bits: jnp.ndarray
    # codeword-level failures (any info-bit error in the codeword): coded
    # errors cluster per codeword (a failed decode flips ~k/2 bits), so
    # FRAME counts, not bit counts, set the effective sample size — the
    # unit the adaptive min-error sampler stops on
    frame_errors: dict        # detector -> scalar int32 failed codewords
    capacity_sum: jnp.ndarray   # sum over blocks of mean-capacity/subcarrier
    rank_full_sum: jnp.ndarray  # #(subcarrier, block) with full rank
    rank_count: jnp.ndarray
    cond_hist: jnp.ndarray      # (len(COND_BINS)+1,) histogram counts
    n_blocks: jnp.ndarray
    # LDPC early-termination telemetry (SURVEY.md §5 observability):
    ldpc_iter_sum: dict         # detector -> sum of per-codeword BP iterations
    ldpc_unconverged: dict      # detector -> #codewords with nonzero syndrome
    ldpc_codewords: jnp.ndarray  # decoded codewords per detector


def decoded_symbol_indices(cfg: SimConfig) -> jnp.ndarray:
    """Static data-symbol indices that get LDPC-decoded (every k-th,
    reference LDPC_DECODE_EVERY, OFDM_SISO_NBF_LDPC.py:202,389)."""
    D = cfg.data_symbols_per_block
    return jnp.arange(0, D, cfg.ldpc.decode_every)


def run_nbf_blocks(cfg: SimConfig, ebno_db, bkeys,
                   detectors=_DETECTORS, esn_over=None) -> NbfCounts:
    """Simulate one coherence block per key in `bkeys` (B,); return counters."""
    ofdm = cfg.ofdm
    N, m = ofdm.n_subcarriers, ofdm.bits_per_symbol
    n_tx = cfg.channel.n_tx
    D = cfg.data_symbols_per_block
    No = ofdm.noise_psd
    var_x = 10.0 ** (ebno_db / 10.0) * No * N
    pi = var_x / N
    batch = bkeys.shape[0]

    code = (make_code(cfg.ldpc, N * m)
            if cfg.ldpc.enabled else None)

    state = synth_block(cfg, ebno_db, bkeys, esn_over)
    code_bits, info_bits = data_bits_for_blocks(cfg, bkeys, D, code)
    data = detect_data_symbols(cfg, state, ebno_db, bkeys, code_bits, detectors)

    # ---- uncoded (pre-LDPC) BER on every data symbol ----
    bit_errors = {}
    for name, Xh in data.X_hat.items():
        z = jnp.moveaxis(Xh, -1, -2)                  # (B, D, n_tx, N)
        rx_bits = symbols_to_bits_hard(z, m)          # (B, D, n_tx, N*m)
        bit_errors[name] = jnp.sum(
            (rx_bits != code_bits).astype(jnp.int32))
    total_bits = jnp.asarray(code_bits.size, dtype=jnp.int32)

    # ---- coded (post-LDPC) BER on every decode_every-th data symbol ----
    info_errors = {name: jnp.int32(0) for name in data.X_hat}
    frame_errors = {name: jnp.int32(0) for name in data.X_hat}
    iter_sum = {name: jnp.int32(0) for name in data.X_hat}
    unconv = {name: jnp.int32(0) for name in data.X_hat}
    total_info = jnp.int32(0)
    n_codewords = jnp.int32(0)
    if code is not None:
        sel = decoded_symbol_indices(cfg)
        Dd = sel.shape[0]
        u_sel = info_bits[:, sel]                     # (B, Dd, n_tx, k)
        B = u_sel.shape[0]
        max_iter = jnp.where(ebno_db >= cfg.ldpc.low_snr_double_iter_below_db,
                             cfg.ldpc.max_iter, 2 * cfg.ldpc.max_iter)
        # ALL detectors decode in ONE stacked kernel call (deterministic
        # name order): per-codeword BP is independent of batch neighbours,
        # so stacking is bit-exact, and each decode call's fixed
        # iteration-independent cost (pad/transpose, compaction sort,
        # permutations) is paid once instead of per detector
        names = sorted(data.X_hat.keys())
        Lc_all = []
        for name in names:
            Xh = data.X_hat[name]
            z = jnp.moveaxis(Xh[:, sel], -1, -2)      # (B, Dd, n_tx, N)
            if cfg.ldpc.sigma2_mode == "true_no":
                sigma2 = jnp.asarray(No)              # Demo_SISO...:283
            else:
                sigma2 = est_sigma2_from_decision(z, m)  # per-stream (:480)
            llr = qam_llrs_maxlog(z, sigma2, m)       # (B, Dd, n_tx, N, m)
            llr = llr.reshape(B, Dd, n_tx, N * m) * cfg.ldpc.llr_scale
            llr = jnp.clip(llr, -cfg.ldpc.llr_clip, cfg.ldpc.llr_clip)
            y_obs = llr / 2.0 if cfg.ldpc.yobs_half else llr
            Lc_all.append(llr_from_yobs(y_obs, snr_db=1.0)
                          .reshape(-1, N * m))
        ncw = Lc_all[0].shape[0]
        truth = jnp.concatenate([u_sel.reshape(-1, code.k)] * len(names),
                                axis=0)
        err, st = ldpc_decode_bp_counts(code, jnp.concatenate(Lc_all, axis=0),
                                        truth, max_iter,
                                        algo=cfg.ldpc.algo,
                                        minsum_scale=cfg.ldpc.minsum_scale,
                                        minsum_offset=cfg.ldpc.minsum_offset,
                                        max_iter_bound=2 * cfg.ldpc.max_iter,
                                        schedule=cfg.ldpc.schedule,
                                        pass1_iters=cfg.ldpc.pass1_iters)
        for i, name in enumerate(names):
            sl = slice(i * ncw, (i + 1) * ncw)
            info_errors[name] = jnp.sum(err[sl])
            frame_errors[name] = jnp.sum((err[sl] > 0).astype(jnp.int32))
            iter_sum[name] = jnp.sum(st["iterations"][sl])
            unconv[name] = jnp.sum((~st["converged"][sl]).astype(jnp.int32))
        total_info = jnp.asarray(u_sel.size, dtype=jnp.int32)
        n_codewords = jnp.asarray(B * Dd * n_tx, dtype=jnp.int32)

    # ---- channel analytics from true H (:369-384) ----
    met = channel_svd_metrics(state.H_true, pi, No)
    full = min(cfg.channel.n_tx, cfg.channel.n_rx)
    rank_full = jnp.sum((met.rank >= full).astype(jnp.int32))
    cond_hist = jnp.histogram(
        met.cond.reshape(-1), bins=jnp.concatenate(
            [jnp.asarray([0.0]), COND_BINS, jnp.asarray([jnp.inf])]))[0]

    return NbfCounts(
        bit_errors=bit_errors, total_bits=total_bits,
        info_errors=info_errors, total_info_bits=total_info,
        frame_errors=frame_errors,
        capacity_sum=jnp.sum(met.capacity_per_sc),
        rank_full_sum=rank_full,
        rank_count=jnp.asarray(met.rank.size, jnp.int32),
        cond_hist=cond_hist.astype(jnp.int32),
        n_blocks=jnp.asarray(batch, jnp.int32),
        ldpc_iter_sum=iter_sum, ldpc_unconverged=unconv,
        ldpc_codewords=n_codewords,
    )
