"""Echo-state network engine, TPU-first.

Semantics reproduce the reference's vendored pyESN (libs/pyESN.py) exactly —
state update, teacher forcing during fit, self-feedback during predict, the
post-tanh uniform state noise, input/teacher scaling, and the pinv readout —
but the execution model is redesigned for TPU:

  * the sequential recurrence is one `lax.scan` whose per-step work is a
    batched matmul `(B, n) @ (n, n)` over B independent sequences sharing one
    reservoir — this keeps the MXU busy instead of issuing B tiny matvecs
    (reference pyESN.py:111-125 does one Python-interpreted matvec per step);
  * the readout least-squares (reference pyESN.py:189-192, np.linalg.pinv) is
    a batched Cholesky solve of the normal equations with a small relative
    Tikhonov jitter — equivalent to pinv for the tall, full-column-rank
    regressor matrices that arise here (validated against a float64 oracle in
    tests/test_esn.py);
  * spectral-radius rescaling (reference pyESN.py:100-102, np.linalg.eigvals)
    uses power iteration with geometric-mean growth — eig is unavailable on
    TPU and only |lambda_max| is needed.

Weight convention: all weight matrices are stored transposed relative to
pyESN so that every contraction is a row-major `x @ W`:
    state'   = tanh(s @ Wt + u @ W_in_t + d @ W_fb_t) + noise*(U(0,1)-0.5)
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# State-noise generator selection (BER-neutral by design — the pyESN state
# noise is an i.i.d. uniform regularizer whose *distribution*, not stream,
# is the contract; tests pin semantics with noise=0):
#   rbg      — hardware RNG instructions (default: threefry hashing was
#              ~13 ms of the 45 ms flagship ESN-detect phase, ~390M hash
#              evaluations per call on the VPU; rbg is near-free)
#   threefry — jax.random.uniform per step (the pre-round-1 keyed stream)
#   zero     — disable (measurement only; changes semantics)
_STATE_NOISE_IMPL = os.environ.get("ESN_TPU_STATE_NOISE", "rbg")

# Precision of the sequential recurrence contraction s @ Wt ONLY (the
# dominant per-step matmul). The reservoir state passes through tanh and
# carries the deliberate 1e-3 uniform dither, so 1-pass bf16 ("default",
# ~0.4% relative error — the same order as the dither) was validated
# BER-neutral at identical RNG keys on the flagship grid, unlike the data
# path, where "default" shifts curves (docs/ENVIRONMENT.md). The readout
# solve stays pinned HIGHEST; drive/readout projections keep the global
# default ("high").
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
_RECURRENCE_PRECISION = _PRECISIONS[
    os.environ.get("ESN_TPU_RECURRENCE_PRECISION", "default")]


def resolve_recurrence_precision(name=None):
    """Per-call recurrence precision: None inherits the env/module default
    (1-pass bf16). Presets whose true ESN floor sits BELOW the bf16
    recurrence noise floor (~8e-4 uncoded on SISO-QPSK-AWGN, measured on
    TPU round 3) pin this via EsnConfig.recurrence_precision — the bf16
    default was validated BER-neutral only down to the flagship's ~0.1
    floors."""
    return _RECURRENCE_PRECISION if name is None else _PRECISIONS[name]

# Readout solver selection (ESN_TPU_READOUT):
#   ridge (default) — ridge-regularised Newton-Schulz normal equations
#       (_readout_lstsq), the TPU-native production solver.
#   pinv — reference-faithful unregularised float64 SVD pseudo-inverse,
#       exactly pyESN.fit's `np.linalg.pinv(ext) @ teachers`
#       (pyESN.py:189-192) via a NumPy host callback. CPU ablation runs
#       only. Ablation RESULT (round 2, PARITY.md "ESN deviation"):
#       full-grid 64-block A/B at identical block keys shows pinv == ridge
#       to 5 decimals in uncoded BER at every SNR — the readout solver is
#       NOT the source of the flagship ESN curve's improvement over the
#       reference (ruling out both the round-1 "ridge generalises better"
#       narrative and any readout-side scaling bug).
_READOUT_IMPL = os.environ.get("ESN_TPU_READOUT", "ridge")


def _noise_key(key):
    """Convert a threefry key to the selected impl's key (stream-compatible
    folding happens upstream; only the draw implementation changes)."""
    if _STATE_NOISE_IMPL != "rbg":
        return key
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    kd4 = jnp.concatenate([kd, kd])[:4]
    return jax.random.wrap_key_data(kd4, impl="rbg")


class EsnReservoir(NamedTuple):
    """Fixed (untrained) reservoir weights, stored transposed."""
    Wt: jnp.ndarray        # (n_res, n_res)
    W_in_t: jnp.ndarray    # (n_in, n_res)
    W_fb_t: jnp.ndarray    # (n_out, n_res)
    noise: jnp.ndarray     # scalar state-noise amplitude


class EsnScale(NamedTuple):
    """Input/teacher affine scalings (pyESN input_scaling/teacher_scaling)."""
    input_scaling: jnp.ndarray   # scalar or (n_in,)
    input_shift: jnp.ndarray     # scalar or (n_in,)
    teacher_scaling: jnp.ndarray  # scalar


def spectral_radius_power_iter(W: jnp.ndarray, key, iters: int = 96,
                               tail: int = 32) -> jnp.ndarray:
    """Estimate |lambda_max(W)| by power iteration with geometric-mean growth.

    Complex eigenpairs make per-step norm growth oscillate; the geometric mean
    of the last `tail` growth factors averages the oscillation out.
    """
    n = W.shape[0]
    v0 = jax.random.normal(key, (n,), dtype=W.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def step(v, _):
        w = v @ W.T
        nw = jnp.linalg.norm(w)
        return w / jnp.maximum(nw, 1e-30), jnp.log(jnp.maximum(nw, 1e-30))

    _, logs = jax.lax.scan(step, v0, None, length=iters)
    return jnp.exp(jnp.mean(logs[-tail:]))


def init_reservoir(key, n_in: int, n_out: int, n_res: int,
                   spectral_radius: float = 0.9, sparsity: float = 0.1,
                   noise: float = 1e-3, dtype=jnp.float32) -> EsnReservoir:
    """Draw reservoir weights with pyESN's distributions (pyESN.py:93-109):
    W ~ U(-0.5, 0.5) zeroed w.p. sparsity then rescaled to `spectral_radius`;
    W_in, W_fb ~ U(-1, 1).
    """
    kw, km, ki, kf, kp = jax.random.split(key, 5)
    W = jax.random.uniform(kw, (n_res, n_res), dtype=dtype, minval=-0.5, maxval=0.5)
    # traced-sparsity-safe: mask is a no-op when sparsity == 0
    mask = jax.random.uniform(km, (n_res, n_res), dtype=dtype) >= sparsity
    W = W * mask
    radius = spectral_radius_power_iter(W, kp)
    W = W * (spectral_radius / jnp.maximum(radius, 1e-12))
    W_in = jax.random.uniform(ki, (n_res, n_in), dtype=dtype, minval=-1.0, maxval=1.0)
    W_fb = jax.random.uniform(kf, (n_res, n_out), dtype=dtype, minval=-1.0, maxval=1.0)
    return EsnReservoir(Wt=W.T, W_in_t=W_in.T, W_fb_t=W_fb.T,
                        noise=jnp.asarray(noise, dtype=dtype))


def _scale_inputs(scale: EsnScale, x: jnp.ndarray) -> jnp.ndarray:
    return x * scale.input_scaling + scale.input_shift


def esn_states(res: EsnReservoir, scale: EsnScale, inputs: jnp.ndarray,
               teachers_scaled: jnp.ndarray, noise_key,
               precision=None) -> jnp.ndarray:
    """Harvest reservoir states with teacher forcing (pyESN.fit:179-182).

    inputs:          (B, T, n_in) — raw (unscaled) inputs
    teachers_scaled: (B, T, n_out) — already in the scaled teacher domain
    returns states   (B, T, n_res); states[:, 0] == 0 as in pyESN.
    """
    B, T, _ = inputs.shape
    n_res = res.Wt.shape[0]
    u = _scale_inputs(scale, inputs)
    s0 = jnp.zeros((B, n_res), dtype=res.Wt.dtype)

    # hoist the input/teacher projections out of the sequential loop: one
    # large (B*(T-1), n_in+n_out) matmul instead of two small ones per step —
    # the scan body is left with a single matvec chain + tanh
    drive = (u[:, 1:] @ res.W_in_t
             + teachers_scaled[:, :-1] @ res.W_fb_t)  # (B, T-1, n_res)
    # pre-generate the per-step state noise as one batched uniform draw
    if _STATE_NOISE_IMPL == "zero":
        noise = jnp.zeros((T - 1, B, n_res), dtype=s0.dtype)
    else:
        noise = res.noise * (jax.random.uniform(
            _noise_key(noise_key), (T - 1, B, n_res), dtype=s0.dtype) - 0.5)

    prec = resolve_recurrence_precision(precision)

    def step(s, inp):
        c_n, z_n = inp
        sw = jnp.matmul(s, res.Wt, precision=prec)
        s_next = jnp.tanh(sw + c_n) + z_n
        return s_next, s_next

    xs = (jnp.swapaxes(drive, 0, 1), noise)
    _, states_tail = jax.lax.scan(step, s0, xs, unroll=4)
    states = jnp.concatenate([s0[None], states_tail], axis=0)  # (T, B, n_res)
    return jnp.swapaxes(states, 0, 1)


def _readout_lstsq(ext: jnp.ndarray, tgt: jnp.ndarray,
                   rel_jitter: float = 1e-7) -> jnp.ndarray:
    """Batched least-squares readout: solve ext @ Wt_out ≈ tgt.

    ext (B, R, F), tgt (B, R, n_out) -> Wt_out (B, F, n_out).

    Ridge-regularised normal equations solved by Newton-Schulz iteration
    (ops/linalg_mxu.pd_solve_ns — pure matmuls, no Cholesky custom call, the
    right lowering for both the axon backend and MXU throughput), plus one
    step of iterative refinement against the original LS operator. When the
    system is wide (F > R, e.g. the 4x8@N=512 config with a 600-unit
    reservoir and only ~512 training rows) the *dual* form
    ext^T (ext ext^T + λI)^{-1} tgt is used — as λ→0 both forms converge to
    the minimum-norm pinv solution pyESN computes (pyESN.py:191).
    """
    from ..ops.linalg_mxu import ns_prepare
    _, R, F = ext.shape
    if _READOUT_IMPL == "pinv":
        # reference-faithful ablation mode: unregularised float64 SVD pinv
        # exactly like pyESN.fit (np.linalg.pinv(ext) @ teachers,
        # pyESN.py:189-192), via a host callback so the reference's f64
        # precision is reproduced without enabling global x64 (which breaks
        # the int-counter scan carries) — CPU ablation runs only. NOTE: a
        # float32 jnp.linalg.pinv is NOT faithful: its default SVD cutoff
        # (~max(R,F)*1.2e-7*s_max) truncates the small singular values and
        # acts as regularisation, landing near the ridge curve instead of
        # the reference's (measured, PARITY.md ESN-ablation section).
        def _np_pinv(e, t):
            import numpy as _np
            e64 = _np.asarray(e, dtype=_np.float64)
            t64 = _np.asarray(t, dtype=_np.float64)
            return (_np.linalg.pinv(e64) @ t64).astype(_np.float32)

        out_sd = jax.ShapeDtypeStruct(
            (ext.shape[0], F, tgt.shape[-1]), jnp.float32)
        W = jax.pure_callback(_np_pinv, out_sd, ext, tgt, vmap_method="legacy_vectorized")
        return W.astype(ext.dtype)
    # gram formation + refinement are precision-critical (pinned HIGHEST
    # like the Newton-Schulz iteration itself) so the data path's global
    # matmul precision can be lowered without touching the readout solve
    es = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

    def _jittered(A):
        n = A.shape[-1]
        tr = jnp.trace(A, axis1=-2, axis2=-1) / n
        return A + (rel_jitter * tr)[:, None, None] * jnp.eye(n, dtype=A.dtype)

    if F <= R:  # tall: primal normal equations (F x F gram)
        A = _jittered(es("brf,brg->bfg", ext, ext))
        solve = ns_prepare(A, iters=40)  # one inverse shared by both solves
        b = es("brf,bro->bfo", ext, tgt)
        x = solve(b)
        # one refinement step against the *original* LS operator (recomputing
        # ext products instead of reusing the rounded gram) recovers most of
        # the precision the f32 normal equations lose
        resid = es("brf,bro->bfo", ext,
                   tgt - es("brf,bfo->bro", ext, x))
        return x + solve(resid)

    # wide: dual/kernel form (R x R gram), min-norm solution
    K = _jittered(es("brf,bsf->brs", ext, ext))
    solve = ns_prepare(K, iters=40)

    def apply_K(z):  # K @ z recomputed from ext to dodge gram rounding
        return es("brf,bso,bsf->bro", ext, z, ext)

    z = solve(tgt)
    z = z + solve(tgt - apply_K(z))
    return es("brf,bro->bfo", ext, z)


def esn_fit(res: EsnReservoir, scale: EsnScale, inputs: jnp.ndarray,
            outputs: jnp.ndarray, n_forget: int, noise_key,
            rel_jitter: float = 1e-7, return_carry: bool = False,
            precision=None):
    """Train the readout on B sequences sharing one reservoir.

    inputs (B, T, n_in), outputs (B, T, n_out) raw; returns Wt_out
    (B, n_res + n_in, n_out) — transposed pyESN W_out.
    The first `n_forget` rows are discarded from the solve (pyESN `transient`,
    the reference's overlap-discard warmup).

    With return_carry=True also returns (laststate, lastoutput_scaled) — the
    pyESN `laststate`/`lastoutput` pair (pyESN.fit:194-197) that seeds
    `esn_predict(..., init_carry=...)` for continuation=True semantics.
    (pyESN's `lastinput` is stored too but never enters the update math:
    pyESN.predict:249-253 reads inputs[n+1], so row 0 — the stored last
    input — is only padding.)
    """
    teachers_scaled = outputs * scale.teacher_scaling
    states = esn_states(res, scale, inputs, teachers_scaled, noise_key,
                        precision=precision)
    u = _scale_inputs(scale, inputs)
    ext = jnp.concatenate([states, u], axis=-1)  # (B, T, F)
    Wt_out = _readout_lstsq(ext[:, n_forget:], teachers_scaled[:, n_forget:],
                            rel_jitter)
    if return_carry:
        return Wt_out, (states[:, -1], teachers_scaled[:, -1])
    return Wt_out


def esn_predict(res: EsnReservoir, scale: EsnScale, Wt_out: jnp.ndarray,
                inputs: jnp.ndarray, n_forget: int, noise_key,
                init_carry=None, precision=None) -> jnp.ndarray:
    """Generate outputs with self-feedback (pyESN.predict).

    init_carry=None reproduces continuation=False (zero initial state/output,
    pyESN.predict:238-241); passing the (laststate, lastoutput_scaled) pair
    from `esn_fit(..., return_carry=True)` reproduces continuation=True
    (pyESN.predict:234-237), resuming the reservoir from where fit left it.

    inputs (B, T, n_in) raw; Wt_out (G, F, n_out) with B % G == 0: readout g
    serves the contiguous group of B//G sequences starting at g*(B//G) — the
    detect path runs D data symbols per coherence block against that block's
    readout, and keeping the readout un-repeated turns the per-step readout
    contraction into a G-batched (D, F) @ (F, n_out) matmul instead of B
    broadcast matvecs re-reading a D-times-repeated readout tensor from HBM
    every step. G == B is the fully-general case. Returns (B, T - n_forget,
    n_out) unscaled outputs — row r corresponds to input sample n_forget + r.

    The state at step n sees the model's own previous (scaled-domain) output
    through W_fb, exactly like pyESN.predict:249-253 with zero initial state.
    """
    B, T, n_in = inputs.shape
    n_res = res.Wt.shape[0]
    G, _, n_out = Wt_out.shape
    assert B % G == 0, (B, G)
    Dg = B // G
    u = _scale_inputs(scale, inputs)
    Wt_s = Wt_out[:, :n_res, :]   # (G, n_res, n_out) state part of the readout
    Wt_u = Wt_out[:, n_res:, :]   # (G, n_in, n_out) input part

    if init_carry is None:
        s0 = jnp.zeros((B, n_res), dtype=res.Wt.dtype)
        o0 = jnp.zeros((B, n_out), dtype=res.Wt.dtype)
    else:
        s0, o0 = init_carry
        s0 = jnp.broadcast_to(s0, (B, n_res)).astype(res.Wt.dtype)
        o0 = jnp.broadcast_to(o0, (B, n_out)).astype(res.Wt.dtype)

    def read_states(s):
        """(B, n_res) @ grouped readout -> (B, n_out)."""
        o = jnp.einsum("gdf,gfo->gdo", s.reshape(G, Dg, n_res), Wt_s)
        return o.reshape(B, n_out)

    # hoist what the feedback loop permits: the input projection (one big
    # matmul) and the input part of the readout. State noise is generated
    # inside the loop from per-step keys — pre-drawing (T, B, n_res) noise
    # would stream ~100 MB of HBM per call at detect batch sizes.
    drive = u @ res.W_in_t                            # (B, T, n_res)
    o_in = jnp.einsum("gtf,gfo->gto",
                      u.reshape(G, Dg * T, n_in), Wt_u).reshape(B, T, n_out)
    keys = jax.random.split(_noise_key(noise_key), T)

    prec = resolve_recurrence_precision(precision)

    def step(carry, inp):
        s, o_prev = carry
        c_n, oi_n, k = inp
        if _STATE_NOISE_IMPL == "zero":
            z_n = 0.0
        else:
            z_n = res.noise * (jax.random.uniform(k, s.shape,
                                                  dtype=s.dtype) - 0.5)
        sw = jnp.matmul(s, res.Wt, precision=prec)
        s_next = jnp.tanh(sw + c_n + o_prev @ res.W_fb_t) + z_n
        o_next = read_states(s_next) + oi_n
        return (s_next, o_next), o_next

    xs = (jnp.swapaxes(drive, 0, 1), jnp.swapaxes(o_in, 0, 1), keys)
    _, outs = jax.lax.scan(step, (s0, o0), xs, unroll=4)
    outs = jnp.swapaxes(outs, 0, 1)  # (B, T, n_out), row n ↔ input sample n
    return outs[:, n_forget:] / scale.teacher_scaling
