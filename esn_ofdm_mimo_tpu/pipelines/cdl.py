"""4x8 CDL-B coded/uncoded pipeline with per-bit LLR calibration.

Re-design of the reference flagship experiment
(Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py, results in BASELINE.md §1):
  * CDL-B (TDL) block-fading channel, single SNR-matched ESN, MMSE baseline;
  * uncoded BER counted on every data symbol (:450-456);
  * the first `cal_fraction` of symbols accumulate (llr, bit) pairs per bit
    position (:476-482); per-bit 1-D logistic calibrators p=sigmoid(a*llr+b)
    are fit by full-batch GD (:105-119, 513-523);
  * remaining symbols decode with calibrated LLRs
    clip(-(a*llr+b), ±clip), y_obs = llr/2, pyldpc contract snr=1 (:483-506).

Phase split is by coherence *blocks* here (the reference splits by symbol
index; blocks are i.i.d. so the statistics are identical) which keeps every
phase a clean batched/sharded computation.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ldpc import (make_code, ldpc_decode_bp_counts,
                    llr_from_yobs)
from ..ops import symbols_to_bits_hard, qam_llrs_maxlog, est_sigma2_from_decision
from .common import synth_block, detect_data_symbols, data_bits_for_blocks

CDL_DETECTORS = ("esn", "mmse")


class CdlCalData(NamedTuple):
    bit_errors: dict            # uncoded code-bit errors per detector
    total_bits: jnp.ndarray
    llr: dict                   # detector -> (B, D, n_tx, N, m) raw LLRs
    bits: jnp.ndarray           # (B, D, n_tx, N, m) true code bits


class CdlCounts(NamedTuple):
    bit_errors: dict
    total_bits: jnp.ndarray
    info_errors: dict
    total_info_bits: jnp.ndarray
    # codeword-level failures — the adaptive sampler's stopping unit (coded
    # errors cluster per codeword; see NbfCounts.frame_errors)
    frame_errors: dict
    # BP early-termination telemetry (same convention as NbfCounts):
    # per-detector sum of per-codeword iterations-to-convergence (budget for
    # unconverged), #codewords with nonzero final syndrome, #codewords
    ldpc_iter_sum: dict
    ldpc_unconverged: dict
    ldpc_codewords: jnp.ndarray


def _llrs_for(cfg: SimConfig, Xh: jnp.ndarray, m: int) -> jnp.ndarray:
    """Raw max-log LLRs with the v2 script's stream-averaged sigma^2 (:459)."""
    z = jnp.moveaxis(Xh, -1, -2)                       # (B, D, n_tx, N)
    sigma2 = jnp.mean(est_sigma2_from_decision(z, m), axis=-1)  # (B, D)
    return qam_llrs_maxlog(z, sigma2[..., None], m)    # (B, D, n_tx, N, m)


def _uncoded_counts(code_bits, X_hat, m):
    errs = {}
    for name, Xh in X_hat.items():
        z = jnp.moveaxis(Xh, -1, -2)
        rx = symbols_to_bits_hard(z, m)
        errs[name] = jnp.sum((rx != code_bits).astype(jnp.int32))
    return errs


def run_cdl_cal_blocks(cfg: SimConfig, ebno_db, bkeys) -> CdlCalData:
    """Phase A: simulate blocks, return uncoded counts + calibration data."""
    N, m = cfg.ofdm.n_subcarriers, cfg.ofdm.bits_per_symbol
    n_tx = cfg.channel.n_tx
    D = cfg.data_symbols_per_block
    code = make_code(cfg.ldpc, N * m)

    state = synth_block(cfg, ebno_db, bkeys)
    code_bits, _ = data_bits_for_blocks(cfg, bkeys, D, code)
    data = detect_data_symbols(cfg, state, ebno_db, bkeys, code_bits,
                               CDL_DETECTORS)
    errs = _uncoded_counts(code_bits, data.X_hat, m)
    llr = {name: _llrs_for(cfg, Xh, m) for name, Xh in data.X_hat.items()}
    B = code_bits.shape[0]
    bits = code_bits.reshape(B, D, n_tx, N, m)
    return CdlCalData(bit_errors=errs,
                      total_bits=jnp.asarray(code_bits.size, jnp.int32),
                      llr=llr, bits=bits)


def run_cdl_cal_counters_chunks(cfg: SimConfig, ebno_db,
                                bkeys2d) -> Tuple[dict, jnp.ndarray]:
    """Uncoded counters over R x B blocks in ONE dispatch.

    bkeys2d: (R, B) per-block keys; lax.scan over the R chunk axis reuses one
    traced chunk program and accumulates counters on-device. The axon relay
    costs ~35 ms per dispatch+sync (docs/ENVIRONMENT.md) — scanning R rounds
    per call amortises that fixed latency, which at B=128 would otherwise be
    ~35% of wall time. The calibration LLR tensors are not computed here
    (XLA DCEs them) — this is the detection-throughput path bench.py times.
    """
    zero = {name: jnp.zeros((), jnp.int32) for name in CDL_DETECTORS}

    def body(acc, bkeys):
        out = run_cdl_cal_blocks(cfg, ebno_db, bkeys)
        errs, tot = acc
        errs = {k: errs[k] + out.bit_errors[k] for k in errs}
        return (errs, tot + out.total_bits), None

    (errs, tot), _ = jax.lax.scan(
        body, (zero, jnp.zeros((), jnp.int32)), bkeys2d)
    return errs, tot


def fit_logreg_1d(x: jnp.ndarray, y: jnp.ndarray, steps: int = 400,
                  lr: float = 0.1, l2: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-bit 1-D logistic regression by full-batch GD (reference :108-119).

    x, y: (..., S) — vectorised over leading axes; returns (a, b) of shape (...)."""
    a0 = jnp.ones(x.shape[:-1], dtype=jnp.float32)
    b0 = jnp.zeros(x.shape[:-1], dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)

    def body(_, ab):
        a, b = ab
        p = jax.nn.sigmoid(a[..., None] * xf + b[..., None])
        ga = jnp.mean((p - yf) * xf, axis=-1) + l2 * a
        gb = jnp.mean(p - yf, axis=-1)
        return a - lr * ga, b - lr * gb

    return jax.lax.fori_loop(0, steps, body, (a0, b0))


def fit_logreg_1d_newton(x: jnp.ndarray, y: jnp.ndarray, steps: int = 8,
                         l2: float = 1e-3,
                         max_step: float = 8.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backtracking Newton-Raphson on the SAME penalized logistic MLE as
    fit_logreg_1d (l2 on the slope only, matching the GD gradient).

    The 2x2 per-bit Hessian [[mean(w x^2)+l2, mean(w x)], [mean(w x),
    mean(w)]] (w = p(1-p)) is solved closed-form; each iteration tries the
    full Newton step and three halvings and keeps the best penalized-NLL
    candidate (monotone descent — a saturated start, where w ~= 0 makes
    the raw Newton step overshoot wildly, backtracks instead of
    oscillating; measured on wide max-log-LLR inputs). ~8 iterations
    x 5 data passes replace GD's 400 sequential passes — and in the
    multi-chip model ~40 small all-reduces replace 400 (docs/SCALING.md
    latency term)."""
    a0 = jnp.ones(x.shape[:-1], dtype=jnp.float32)
    b0 = jnp.zeros(x.shape[:-1], dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)

    def pnll(a, b):
        z = a[..., None] * xf + b[..., None]
        ce = jnp.maximum(z, 0.0) - yf * z + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.mean(ce, axis=-1) + 0.5 * l2 * a * a

    def body(_, ab):
        a, b = ab
        z = a[..., None] * xf + b[..., None]
        p = jax.nn.sigmoid(z)
        ga = jnp.mean((p - yf) * xf, axis=-1) + l2 * a
        gb = jnp.mean(p - yf, axis=-1)
        w = p * (1.0 - p)
        haa = jnp.mean(w * xf * xf, axis=-1) + l2
        hab = jnp.mean(w * xf, axis=-1)
        hbb = jnp.mean(w, axis=-1)
        det = jnp.maximum(haa * hbb - hab * hab, 1e-12)
        da = jnp.clip((hbb * ga - hab * gb) / det, -max_step, max_step)
        db = jnp.clip((haa * gb - hab * ga) / det, -max_step, max_step)
        best_a, best_b, best_f = a, b, pnll(a, b)
        for t in (1.0, 0.5, 0.25, 0.125):
            ca, cb = a - t * da, b - t * db
            cf = pnll(ca, cb)
            take = cf < best_f
            best_a = jnp.where(take, ca, best_a)
            best_b = jnp.where(take, cb, best_b)
            best_f = jnp.minimum(cf, best_f)
        return best_a, best_b

    return jax.lax.fori_loop(0, steps, body, (a0, b0))


def fit_calibrators(cfg: SimConfig, cal: dict, bits) -> dict:
    """cal: detector -> (S_total, m) LLRs; bits (S_total, m). Returns
    detector -> (a (m,), b (m,)).

    When the stacked cal set exceeds calib.max_fit_samples per bit, a
    deterministic stride subsample feeds the GD — the reference's own fit
    uses ~154k samples (Demo_..._v2.py:476-482), so a >=1M-sample fit is
    statistically identical while the full-batch GD cost stays bounded
    (the fit is memory-bound; see CalibConfig.max_fit_samples)."""
    cap = cfg.calib.max_fit_samples
    out = {}
    for name, llr in cal.items():
        x, y = llr.T, bits.T                      # (m, S)
        if cap is not None and x.shape[-1] > cap:
            stride = -(-x.shape[-1] // int(cap))
            x, y = x[..., ::stride], y[..., ::stride]
        if cfg.calib.fit_method == "newton":
            a, b = fit_logreg_1d_newton(x, y, l2=cfg.calib.l2)
        else:
            a, b = fit_logreg_1d(x, y, steps=cfg.calib.gd_steps,
                                 lr=cfg.calib.lr, l2=cfg.calib.l2)
        out[name] = (a, b)
    return out


def run_cdl_detect_llrs(cfg: SimConfig, ebno_db, bkeys, calib: dict):
    """Phase-B detection only: uncoded counters + calibrated channel LLRs.

    Returns (uncoded errs dict, total_bits, Lc dict detector -> (ncw, n),
    info_bits (ncw, k)) with ncw = B*D*n_tx codewords. Split out of the
    decode so the Monte-Carlo engine can scan detection per round but
    decode ALL rounds in ONE batched kernel call (round-4 re-measurement:
    with decode hoisted out of the scan the kernel runs at its
    flat-dispatch rate in every context — PARITY.md round-4 decode study)."""
    N, m = cfg.ofdm.n_subcarriers, cfg.ofdm.bits_per_symbol
    n_tx = cfg.channel.n_tx
    D = cfg.data_symbols_per_block

    state = synth_block(cfg, ebno_db, bkeys)
    code = make_code(cfg.ldpc, N * m)
    code_bits, info_bits = data_bits_for_blocks(cfg, bkeys, D, code)
    data = detect_data_symbols(cfg, state, ebno_db, bkeys, code_bits,
                               CDL_DETECTORS)
    errs = _uncoded_counts(code_bits, data.X_hat, m)

    B = code_bits.shape[0]
    Lcs = {}
    for name, Xh in data.X_hat.items():
        llr = _llrs_for(cfg, Xh, m)                     # (B, D, n_tx, N, m)
        a, b = calib[name]                              # (m,), (m,)
        llr_cal = jnp.clip(-(a * llr + b), -cfg.ldpc.llr_clip,
                           cfg.ldpc.llr_clip)
        y_obs = 0.5 * llr_cal.reshape(B, D, n_tx, N * m)
        Lcs[name] = llr_from_yobs(y_obs, snr_db=1.0).reshape(-1, N * m)
    return (errs, jnp.asarray(code_bits.size, jnp.int32), Lcs,
            info_bits.reshape(-1, code.k))


def cdl_decode_counters(cfg: SimConfig, Lcs: dict, info_bits) -> dict:
    """Batched decode of stacked calibrated LLRs: detector -> counters.

    Lcs: detector -> (ncw, n); info_bits (ncw, k). Per-codeword results are
    independent, so decoding the round-stacked batch is bit-identical to
    per-round decoding — only the kernel context changes. ALL detectors are
    stacked into ONE decode call (deterministic name order): each decode
    call pays a fixed iteration-independent cost (pad/transpose, the
    compaction sort + gathers, the natural-order permutations) measured at
    ~50-100 ms at flagship batches, so one call on the doubled batch
    halves that overhead and fills a single larger grid. Per-detector
    counters come from slicing the stacked results back apart."""
    N, m = cfg.ofdm.n_subcarriers, cfg.ofdm.bits_per_symbol
    code = make_code(cfg.ldpc, N * m)
    names = sorted(Lcs.keys())
    ncw = Lcs[names[0]].shape[0]
    truth = jnp.concatenate([info_bits] * len(names), axis=0)
    err, st = ldpc_decode_bp_counts(
        code, jnp.concatenate([Lcs[n] for n in names], axis=0), truth,
        cfg.ldpc.max_iter, algo=cfg.ldpc.algo,
        minsum_scale=cfg.ldpc.minsum_scale,
        minsum_offset=cfg.ldpc.minsum_offset,
        schedule=cfg.ldpc.schedule, pass1_iters=cfg.ldpc.pass1_iters)
    info_errors, frame_errors, iter_sum, unconv = {}, {}, {}, {}
    for i, name in enumerate(names):
        sl = slice(i * ncw, (i + 1) * ncw)
        info_errors[name] = jnp.sum(err[sl])
        frame_errors[name] = jnp.sum((err[sl] > 0).astype(jnp.int32))
        iter_sum[name] = jnp.sum(st["iterations"][sl])
        unconv[name] = jnp.sum((~st["converged"][sl]).astype(jnp.int32))
    return {"info_errors": info_errors, "frame_errors": frame_errors,
            "iter_sum": iter_sum, "unconv": unconv}


def run_cdl_decode_blocks(cfg: SimConfig, ebno_db, bkeys,
                          calib: dict) -> CdlCounts:
    """Phase B: uncoded counts on every symbol + calibrated-LLR decode of
    every symbol (reference :483-511)."""
    errs, total_bits, Lcs, u = run_cdl_detect_llrs(cfg, ebno_db, bkeys,
                                                   calib)
    dec = cdl_decode_counters(cfg, Lcs, u)
    return CdlCounts(bit_errors=errs, total_bits=total_bits,
                     info_errors=dec["info_errors"],
                     total_info_bits=jnp.asarray(u.size, jnp.int32),
                     frame_errors=dec["frame_errors"],
                     ldpc_iter_sum=dec["iter_sum"],
                     ldpc_unconverged=dec["unconv"],
                     ldpc_codewords=jnp.asarray(u.shape[0], jnp.int32))
