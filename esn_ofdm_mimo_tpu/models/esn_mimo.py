"""MIMO-OFDM ESN detection harness.

Re-design of the reference's `trainMIMOESN_generic`
(libs/helper_mimo_esn_generic.py:5-86) and the per-symbol detection path
(OFDM_SISO_NBF_LDPC.py:430-448), batched over coherence blocks:

  * ESN input layout: 2*n_rx real channels = per-RX (re, im) of the received
    time-domain waveform y_cp, zero-padded by `delay` samples at the end;
  * ESN target layout: 2*n_tx channels = per-TX (re, im) of the transmitted
    waveform x_cp delayed by `delay` samples;
  * n_forget = delay + cp_len (the reference's overlap-discard warmup);
  * detection: predict, take rows [0:N) (they correspond to absolute samples
    delay+cp .. delay+cp+N-1, i.e. the post-CP payload), recombine re+im,
    FFT/N, divide by sqrt(Pi).

The shared-delay path (DelayFlag=0, the configuration used by every reference
experiment) trains a single fit at d = (min+max)//2; the delay-scan variant
(DelayFlag!=0) is provided as `select_delay_by_nmse` for capability parity.
The reference fits twice at the chosen delay (helper:44 and :84) — the second
fit differs only in the state-noise realisation, so we fit once.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .esn import EsnReservoir, EsnScale, esn_fit, esn_predict, esn_states, \
    _readout_lstsq, _scale_inputs
from ..ops.fft_mxu import fft_mxu

# ESN recurrence implementation (ESN_TPU_IMPL env var):
#   auto (default) — detect/predict routes to the fused Pallas kernel on TPU
#     backends when its working set fits VMEM (models/esn_pallas): with the
#     state-recurrence dot at the validated bf16 recurrence precision it
#     runs the flagship detect phase ~25% faster than the XLA scan
#     (26 ms vs 35 ms at 128 blocks). The fit/states path stays on the XLA
#     scan — at fit batch sizes the fused kernel measured slower.
#   xla / pallas — force one implementation for both paths (A/B).
ESN_IMPL = os.environ.get("ESN_TPU_IMPL", "auto")


def _use_pallas(kind: str, B, T, n_res, n_in, n_out,
                precision=None) -> bool:
    if ESN_IMPL == "xla":
        return False
    if precision is not None:
        # the fused kernels hard-cast the recurrence to bf16 (Mosaic has no
        # multi-pass dot precisions); a per-preset precision override means
        # "this preset's floor is below bf16 noise" -> XLA f32 path
        return False
    import jax as _jax
    on_tpu = _jax.default_backend() not in ("cpu",)
    if ESN_IMPL == "pallas":
        return True
    if not on_tpu or kind == "states":
        return False
    from .esn_pallas import predict_viable
    return predict_viable(B, T, n_res, n_in, n_out)


def _interleave_reim(z: jnp.ndarray) -> jnp.ndarray:
    """(B, A, T) complex -> (B, T, 2A) real with cols (re0, im0, re1, im1, ...)."""
    parts = jnp.stack([z.real, z.imag], axis=-2)  # (B, A, 2, T)
    B, A, _, T = parts.shape
    return jnp.moveaxis(parts.reshape(B, 2 * A, T), -1, -2).astype(jnp.float32)


def _deinterleave_reim(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 2A) real -> (B, A, T) complex."""
    B, T, twoA = x.shape
    z = x.reshape(B, T, twoA // 2, 2)
    return jnp.moveaxis(z[..., 0] + 1j * z[..., 1], -1, -2)


def build_esn_io(y_cp: jnp.ndarray, x_cp: jnp.ndarray, delay: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (X_in, X_out) for a shared delay.

    y_cp (B, n_rx, T) complex, x_cp (B, n_tx, T) complex ->
    X_in (B, T+delay, 2*n_rx), X_out (B, T+delay, 2*n_tx) real.
    """
    yin = _interleave_reim(y_cp)
    xout = _interleave_reim(x_cp)
    pad_t = [(0, 0), (0, delay), (0, 0)]
    X_in = jnp.pad(yin, pad_t)
    X_out = jnp.pad(xout, [(0, 0), (delay, 0), (0, 0)])
    return X_in, X_out


def build_esn_input(y_cp: jnp.ndarray, delay: int) -> jnp.ndarray:
    """Inference-time input: y_cp (B, n_rx, T) -> (B, T+delay, 2*n_rx)."""
    return jnp.pad(_interleave_reim(y_cp), [(0, 0), (0, delay), (0, 0)])


def train_mimo_esn(res: EsnReservoir, scale: EsnScale, y_cp: jnp.ndarray,
                   x_cp: jnp.ndarray, delay: int, cp_len: int, key,
                   precision=None) -> jnp.ndarray:
    """Fit readouts for B coherence blocks; returns Wt_out (B, F, 2*n_tx)."""
    X_in, X_out = build_esn_io(y_cp, x_cp, delay)
    n_forget = delay + cp_len
    B, T, n_in = X_in.shape
    n_res = res.Wt.shape[0]
    if _use_pallas("states", B, T, n_res, n_in, X_out.shape[-1], precision):
        from .esn_pallas import esn_states_pallas
        teachers_scaled = X_out * scale.teacher_scaling
        states = esn_states_pallas(res, scale, X_in, teachers_scaled, key)
        ext = jnp.concatenate([states, _scale_inputs(scale, X_in)], axis=-1)
        return _readout_lstsq(ext[:, n_forget:],
                              teachers_scaled[:, n_forget:])
    return esn_fit(res, scale, X_in, X_out, n_forget, key,
                   precision=precision)


def esn_detect_symbols(res: EsnReservoir, scale: EsnScale, Wt_out: jnp.ndarray,
                       y_cp: jnp.ndarray, delay: int, cp_len: int,
                       n_subcarriers: int, power_scale, key,
                       precision=None) -> jnp.ndarray:
    """Detect one OFDM symbol per batch row.

    y_cp (B, n_rx, N+cp) complex -> X_hat (B, N, n_tx) frequency symbols.
    Wt_out may be grouped, (G, F, n_out) with B % G == 0 (readout g serves
    the contiguous run of B//G rows) — see esn_predict.
    """
    N = n_subcarriers
    X_in = build_esn_input(y_cp, delay)
    n_forget = delay + cp_len
    B, T, n_in = X_in.shape
    n_res = res.Wt.shape[0]
    if _use_pallas("predict", B, T, n_res, n_in, Wt_out.shape[-1], precision):
        from .esn_pallas import esn_predict_pallas
        # grouped Wt_out passes through: the kernel turns the shared-readout
        # structure into masked MXU dots instead of per-lane VPU reduces
        pred = esn_predict_pallas(res, scale, Wt_out, X_in, n_forget, key)
    else:
        pred = esn_predict(res, scale, Wt_out, X_in, n_forget, key,
                           precision=precision)
    x_hat_td = _deinterleave_reim(pred[:, :N])       # (B, n_tx, N)
    X_hat = fft_mxu(x_hat_td, axis=-1) / N
    X_hat = X_hat / jnp.asarray(power_scale)[..., None, None]
    return jnp.moveaxis(X_hat, -2, -1)               # (B, N, n_tx)


def map_blocks_stable(fn, xs):
    """lax.map with a guaranteed trip count >= 2.

    XLA's while-loop simplifier fully unrolls single-trip loops and
    re-fuses the body into the surrounding program, producing bit-DIFFERENT
    results than the same body executed inside a real loop (measured:
    trip 1 vs 8 differ in the last ulp, trips 2/4/8 are bit-identical).
    A one-block local batch (e.g. blocks_per_device=1 on a full mesh) is
    exactly the layout the rng_mode="block" bit-invariance contract must
    cover, so pad with a duplicate entry and drop its output."""
    B = jax.tree.leaves(xs)[0].shape[0]
    if B >= 2:
        return jax.lax.map(fn, xs)
    xs_p = jax.tree.map(lambda x: jnp.concatenate([x, x[:1]], axis=0), xs)
    out = jax.lax.map(fn, xs_p)
    return jax.tree.map(lambda x: x[:B], out)


def train_mimo_esn_per_block(res_b: EsnReservoir, scale: EsnScale,
                             y_cp: jnp.ndarray, x_cp: jnp.ndarray,
                             delay: int, cp_len: int, keys,
                             precision=None) -> jnp.ndarray:
    """Layout-invariant fit (EsnConfig.rng_mode="block"): res_b is a
    vmapped-batched reservoir (leaves with leading B) and `keys` (B,) are
    per-block noise keys, so every block's reservoir AND state-noise stream
    fold from its own key — sharded counters become bit-identical to a
    single-device run for any batching (SURVEY.md §4). Routes through the
    XLA scan (the fused Pallas kernels assume a batch-shared reservoir).

    lax.map, not vmap, on purpose: vmap re-batches the per-block program,
    and XLA reassociates its reductions differently at different batch
    sizes — bit-different last-ulp results per batch count (measured:
    power-iteration radius already differs). lax.map compiles the ONE-block
    body once, so every block runs the identical program whatever the
    local batch size — the bit-invariance this mode exists for."""
    def one(args):
        res, y, x, k = args
        X_in, X_out = build_esn_io(y[None], x[None], delay)
        return esn_fit(res, scale, X_in, X_out, delay + cp_len, k,
                       precision=precision)[0]

    return map_blocks_stable(one, (res_b, y_cp, x_cp, keys))


def esn_detect_symbols_per_block(res_b: EsnReservoir, scale: EsnScale,
                                 Wt_out: jnp.ndarray, y_cp: jnp.ndarray,
                                 delay: int, cp_len: int, n_subcarriers: int,
                                 power_scale, keys,
                                 precision=None) -> jnp.ndarray:
    """Layout-invariant detect: y_cp (B, D, n_rx, N+cp) — block b's D data
    symbols run against ITS reservoir/readout with a noise stream folded
    from its own key. Returns X_hat (B, D, N, n_tx). lax.map (not vmap)
    for the same bit-invariance reason as train_mimo_esn_per_block."""
    N = n_subcarriers

    def one(args):
        res, W, y, k = args
        X_in = build_esn_input(y, delay)          # (D, T+delay, 2*n_rx)
        pred = esn_predict(res, scale, W[None], X_in, delay + cp_len, k,
                           precision=precision)
        x_hat_td = _deinterleave_reim(pred[:, :N])   # (D, n_tx, N)
        X_hat = fft_mxu(x_hat_td, axis=-1) / N
        X_hat = X_hat / jnp.asarray(power_scale)[..., None, None]
        return jnp.moveaxis(X_hat, -2, -1)           # (D, N, n_tx)

    return map_blocks_stable(one, (res_b, Wt_out, y_cp, keys))


def esn_nmse(res: EsnReservoir, scale: EsnScale, Wt_out: jnp.ndarray,
             y_cp: jnp.ndarray, x_cp: jnp.ndarray, delay: int, cp_len: int,
             isi_duration: int, key) -> jnp.ndarray:
    """Train-set NMSE as defined by the reference's nmse_for_delay
    (helper_mimo_esn_generic.py:40-56): per-TX squared error on the first N
    predicted samples vs x_cp[isi-1:], summed over TX. Returns (B,)."""
    X_in = build_esn_input(y_cp, delay)
    n_forget = delay + cp_len
    pred = esn_predict(res, scale, Wt_out, X_in, n_forget, key)
    x_true = x_cp[:, :, isi_duration - 1:]           # (B, n_tx, T-isi+1)
    M = x_true.shape[-1]
    x_hat = _deinterleave_reim(pred)[:, :, :M]
    err = jnp.sum(jnp.abs(x_hat - x_true) ** 2, axis=-1)
    ref = jnp.sum(jnp.abs(x_true) ** 2, axis=-1) + 1e-12
    return jnp.sum(err / ref, axis=-1)


def select_delay_by_nmse(res: EsnReservoir, scale: EsnScale, y_cp, x_cp,
                         min_delay: int, max_delay: int, cp_len: int,
                         isi_duration: int, key) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DelayFlag!=0 path: scan delays in [min_delay, max_delay], pick min-NMSE.

    Delays are Python ints (static shapes per candidate); returns
    (best_delay (B,) int32, nmse_table (B, n_delays)).
    """
    nmses = []
    for d in range(min_delay, max_delay + 1):
        kf, kp, key = jax.random.split(key, 3)
        Wt_out = train_mimo_esn(res, scale, y_cp, x_cp, d, cp_len, kf)
        nmses.append(esn_nmse(res, scale, Wt_out, y_cp, x_cp, d, cp_len,
                              isi_duration, kp))
    table = jnp.stack(nmses, axis=-1)
    return min_delay + jnp.argmin(table, axis=-1).astype(jnp.int32), table
