"""Fused Pallas TPU kernels for the ESN recurrence.

The sequential reservoir update is the one part of the framework XLA cannot
fuse into a single kernel: a `lax.scan` pays per-step loop overhead and
re-stages weights every iteration. These kernels keep the reservoir weights,
state and per-row readouts resident in VMEM and run the whole T-step
recurrence in one kernel launch (SURVEY.md §7 hard-part #1).

Two kernels with different layouts, matched to where each runs:

  * `esn_states_pallas` (fit path, small batch): row-major — batch on
    sublanes, features on lanes; the state update is one
    (B_p, n_p) @ (n_p, n_p) MXU matmul per step and the state sequence
    streams into a (T, B_p, n_p) VMEM output.
  * `esn_predict_pallas` (detect path, large batch): *feature-major* —
    batch on the LAST (lane) axis in BC=128-wide grid chunks; the update is
    (n_p, n_p) @ (n_p, BC) and the per-row readout
    o[k, b] = sum_f Wof[f, k, b] * s[f, b] is a VPU multiply-reduce with
    lanes intact (a row-major layout would pad the n_out=8 lane axis 16x).

Feature dims are zero-padded to hardware multiples on the host; padding
contributes exact zeros. State noise (pyESN's noise * (U(0,1)-0.5)) is drawn
with the on-core PRNG, seeded per grid program.

Both are validated against the XLA-scan reference implementations in
tests/test_esn_pallas.py (interpret mode on CPU, compiled on TPU);
models/esn_mimo routes through them when `*_viable` says the working set
fits VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .esn import EsnReservoir, EsnScale, _RECURRENCE_PRECISION

# In XLA, a DEFAULT-precision f32 matmul lowers to one bf16 MXU pass — the
# validated-BER-neutral recurrence mode (models/esn.py). Mosaic does NOT make
# that substitution: an f32 jnp.dot inside a Pallas kernel runs at the f32
# MXU rate (~4x slower). Mirror XLA's semantics by explicitly casting the
# recurrence operands to bf16 (f32 accumulate) when DEFAULT is selected —
# compiled TPU kernels only: interpret mode (CPU tests) stays f32 to match
# the CPU XLA-scan reference, whose DEFAULT is true f32.
_RECURRENCE_BF16 = _RECURRENCE_PRECISION == jax.lax.Precision.DEFAULT


def _rec_dot(a, b, bf16: bool):
    """Recurrence contraction at the configured precision (see above)."""
    if bf16:
        # precision must be explicit: the package-global default ("high")
        # is not a Mosaic-lowerable dot precision
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_RECURRENCE_PRECISION)

import os

_LANE = 128       # TPU lane width (feature-dim padding granularity)
# predict kernel: batch rows per grid program. Wider chunks amortise the
# per-step fixed costs (loop control, readout setup) over more lanes at the
# same sequential depth; must be a multiple of _LANE. Measured on the
# flagship detect shape (B=9472, T=138, n_res=300): 128 -> 442k sym/s,
# 256 -> 458k, 512 -> 443k; 256 also divides the flagship batch exactly.
BC = int(os.environ.get("ESN_TPU_PREDICT_BC", "256"))
_SUB = 8          # f32 sublane multiple
# Working-set ceiling for routing to the fused kernels. v5e has 128 MiB of
# VMEM per core; we pass an explicit vmem_limit_bytes to the Mosaic compiler
# when the (double-buffered) estimate exceeds its 16 MiB scoped default, so
# the budget here is a routing choice, not a hardware bound. Beyond ~1/2 of
# physical VMEM the XLA scan path is the safer bet.
_VMEM_BUDGET = 64 * 1024 * 1024
_VMEM_SCOPED_DEFAULT = 16 * 1024 * 1024


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _uniform_from_bits(shape):
    """U(0,1) f32 from raw PRNG bits (24-bit mantissa trick)."""
    bits = pltpu.prng_random_bits(shape)
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _seed_arg(noise_key):
    return jax.random.randint(noise_key, (1, 1), 0, np.int32(2**31 - 1),
                              dtype=jnp.int32)


# --------------------------------------------------------------------------
# predict kernel (feature-major, grid over batch chunks)
# --------------------------------------------------------------------------

def _predict_kernel(u_ref, wt_ref, wio_ref, wofs_ref, wofu_ref,
                    seed_ref, noise_ref, out_ref, *, T, n_p, n_rs, with_prng,
                    rec_bf16, ilv=1):
    """ilv > 1: software-pipelining experiment (round-2 stretch item /
    VERDICT r03 #7) — each program carries `ilv` INDEPENDENT BC-lane
    recurrence chains and issues their step bodies back-to-back inside one
    loop trip, so one chain's serial-dependency stalls (the ~0.7 us/step
    Mosaic loop/VMEM floor measured in tools/bench_micro.py) can overlap
    the other's MXU/VPU work. Lane blocks are ilv*BC wide; chain c owns
    lanes [c*BC, (c+1)*BC). Noise streams differ from ilv=1 (same
    per-program PRNG, interleaved draws) — statistically identical."""
    if with_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    def chain(t, s, o, lo):
        u_t = u_ref[t][:, lo:lo + BC]                       # (n_in_p, BC)
        # ONE merged dot for input + feedback: wio = [Win | Wfb] against
        # z = [u_t; o]. Identical f32 math to two separate dots, but each
        # small MXU dot carries ~0.3 us of fixed issue cost per step —
        # merging measured 14.2 -> 11.3 ms on the flagship detect shape
        # (tools/bench_micro.py).
        z = jnp.concatenate([u_t, o], axis=0)
        pre = (_rec_dot(wt_ref[:], s, rec_bf16)
               + jnp.dot(wio_ref[:], z,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))
        s_new = jnp.tanh(pre)
        if with_prng:
            s_new = s_new + noise_ref[0, 0] * (
                _uniform_from_bits(s_new.shape) - 0.5)
        # per-row readout: o[k, b] = sum_f wofs[f, k, b] * s[f, b] + ...
        # Only the first n_rs (= n_res padded to sublanes) state rows carry
        # signal — wofs is shipped pre-sliced, so the VPU multiply-reduce
        # skips the zero lane-padding rows (n_p - n_rs of them).
        o_new = (jnp.sum(wofs_ref[:, :, lo:lo + BC]
                         * s_new[:n_rs][:, None, :], axis=0)
                 + jnp.sum(wofu_ref[:, :, lo:lo + BC]
                           * u_t[:, None, :], axis=0))
        out_ref[t, :, lo:lo + BC] = o_new
        return s_new, o_new

    def step(t, chains):
        return tuple(chain(t, s, o, c * BC)
                     for c, (s, o) in enumerate(chains))

    init = tuple((jnp.zeros((n_p, BC), jnp.float32),
                  jnp.zeros((out_ref.shape[1], BC), jnp.float32))
                 for _ in range(ilv))
    jax.lax.fori_loop(0, T, step, init)


def _predict_kernel_grouped(u_ref, wt_ref, wio_ref, wofs_ref,
                            wofu_ref, mask_ref, seed_ref, noise_ref, out_ref,
                            *, T, n_p, P, with_prng, rec_bf16):
    """Grouped-readout variant: when Dg consecutive rows share a readout
    (detect runs D data symbols per coherence block), a BC-lane program
    spans at most P = BC//Dg + 2 distinct readouts. The per-lane VPU
    multiply-reduce (~2*n_p vector ops per step) collapses to P tiny MXU
    dots masked by lane-membership — the dominant VPU cost of the loop.

    wofs_ref (P, n_out_p, n_p), wofu_ref (P, n_out_p, n_in_p): transposed
    readouts of the P group slots this program's lanes can belong to;
    mask_ref (P, n_out_p, BC): 1.0 where the lane belongs to slot p (zero
    on padding lanes, so they emit o = 0).
    """
    if with_prng:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

    def step(t, so):
        s, o = so
        u_t = u_ref[t]                                      # (n_in_p, BC)
        z = jnp.concatenate([u_t, o], axis=0)   # merged dot (see above)
        pre = (_rec_dot(wt_ref[:], s, rec_bf16)
               + jnp.dot(wio_ref[:], z,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))
        s_new = jnp.tanh(pre)
        if with_prng:
            s_new = s_new + noise_ref[0, 0] * (
                _uniform_from_bits(s_new.shape) - 0.5)
        o_new = jnp.zeros_like(out_ref[0])
        for p in range(P):
            op = (jnp.dot(wofs_ref[p], s_new,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
                  + jnp.dot(wofu_ref[p], u_t,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
            o_new = o_new + mask_ref[p] * op
        out_ref[t] = o_new
        return s_new, o_new

    s0 = jnp.zeros((n_p, BC), dtype=jnp.float32)
    o0 = jnp.zeros_like(out_ref[0])
    jax.lax.fori_loop(0, T, step, (s0, o0))


def esn_predict_pallas(res: EsnReservoir, scale: EsnScale,
                       Wt_out: jnp.ndarray, inputs: jnp.ndarray,
                       n_forget: int, noise_key,
                       interpret: bool = False) -> jnp.ndarray:
    """Drop-in for models/esn.esn_predict (continuation=False semantics).

    inputs (B, T, n_in) raw; Wt_out (G, n_res+n_in, n_out) with B % G == 0:
    readout g serves the contiguous run of Dg = B//G rows (esn_predict's
    grouping convention; G == B is the fully-general per-row case). Returns
    (B, T-n_forget, n_out) unscaled outputs.
    """
    B, T, n_in = inputs.shape
    n_res = res.Wt.shape[0]
    n_out = Wt_out.shape[-1]
    G = Wt_out.shape[0]
    assert B % G == 0, (B, G)
    Dg = B // G
    # state rows pad to sublanes only (Mosaic pads dot operands to lane
    # tiles internally, so the MXU work is the same either way, but every
    # VPU op on the state — tanh, noise, adds, readout — shrinks: 304 vs
    # 384 rows at n_res=300)
    n_p = _pad_to(n_res, _SUB)
    n_rs = n_p                    # readout rows == state rows
    n_in_p = _pad_to(n_in, _SUB)
    # interleave experiment (see _predict_kernel docstring): ilv independent
    # chains per program; batch pads to whole ilv*BC windows
    ilv = max(1, int(os.environ.get("ESN_TPU_PREDICT_ILV", "1")))
    B_p = _pad_to(B, BC * ilv)
    n_out_p = _pad_to(n_out, _SUB)

    u = inputs * scale.input_scaling + scale.input_shift       # (B, T, n_in)
    u_fm = jnp.zeros((T, n_in_p, B_p), dtype=jnp.float32)
    u_fm = u_fm.at[:, :n_in, :B].set(jnp.transpose(u, (1, 2, 0)))
    # reservoir weights are loop-invariant: ship them already in the
    # recurrence dtype so the kernel doesn't re-cast (n_p, n_p) every step
    w_dtype = (jnp.bfloat16 if _RECURRENCE_BF16 and not interpret
               else jnp.float32)
    W = jnp.zeros((n_p, n_p), dtype=w_dtype)
    W = W.at[:n_res, :n_res].set(res.Wt.T.astype(w_dtype))     # s' = W @ s
    # merged input+feedback weights: one (n_p, n_in_p + n_out_p) operand for
    # the per-step z = [u_t; o] dot (kernel comment)
    Wio = jnp.zeros((n_p, n_in_p + n_out_p), dtype=jnp.float32)
    Wio = Wio.at[:n_res, :n_in].set(res.W_in_t.T)
    Wio = Wio.at[:n_res, n_in_p:n_in_p + n_out].set(res.W_fb_t.T)

    noise_amp = jnp.reshape(res.noise.astype(jnp.float32), (1, 1))
    # Mosaic's scoped-vmem default (16 MiB) undersizes big-reservoir configs
    # (e.g. 4x8 NBF: n_res=600, T=522 needs ~17.4 MiB with double buffering);
    # raise the per-kernel limit to the actual estimate plus headroom.
    need = _predict_vmem_bytes(T, n_p, n_in_p, n_out_p) * ilv
    params = {}
    if need > _VMEM_SCOPED_DEFAULT and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(int(need * 1.25), 100 * 1024 * 1024))

    n_prog = B_p // BC
    # A BC-lane window over rows grouped in runs of Dg spans at most
    # BC//Dg + 2 distinct readouts; when that is small, the per-lane VPU
    # readout can collapse to P masked MXU dots (kernel docstring).
    # MEASURED SLOWER on v5e (272k vs 286k sym/s on the flagship): the
    # M=8 dots serialize on the MXU port behind the recurrence matmul,
    # while the per-lane VPU reduce overlaps with it — so the grouped
    # kernel is opt-in (it may win where n_out is large).
    P = min(G, BC // Dg + 2) if Dg > 1 else B_p
    grouped = (Dg > 1 and P <= 4
               and os.environ.get("ESN_TPU_PREDICT_READOUT") == "grouped")

    if grouped:
        # transposed readout stacks per program slot + lane-membership masks
        WsT = jnp.zeros((G, n_out_p, n_p), dtype=jnp.float32)
        WsT = WsT.at[:, :n_out, :n_res].set(
            jnp.swapaxes(Wt_out[:, :n_res, :], -1, -2))
        WuT = jnp.zeros((G, n_out_p, n_in_p), dtype=jnp.float32)
        WuT = WuT.at[:, :n_out, :n_in].set(
            jnp.swapaxes(Wt_out[:, n_res:, :], -1, -2))
        base = (jnp.arange(n_prog) * BC) // Dg                 # (n_prog,)
        slot = base[:, None] + jnp.arange(P)                   # may exceed G-1
        gidx = jnp.minimum(slot, G - 1)                        # safe gather
        wofs = WsT[gidx].reshape(n_prog * P, n_out_p, n_p)
        wofu = WuT[gidx].reshape(n_prog * P, n_out_p, n_in_p)
        row = jnp.arange(n_prog)[:, None] * BC + jnp.arange(BC)[None, :]
        # membership tests the UNCLAMPED slot id: clamped duplicates would
        # match (and double-count) the same lane in several slots
        memb = (row[:, None, :] // Dg == slot[:, :, None]) & (
            row[:, None, :] < B)                               # (n_prog,P,BC)
        mask = jnp.broadcast_to(
            memb[:, :, None, :].astype(jnp.float32),
            (n_prog, P, n_out_p, BC)).reshape(n_prog * P, n_out_p, BC)
        kernel = functools.partial(
            _predict_kernel_grouped, T=T, n_p=n_p, P=P,
            with_prng=not interpret,
            rec_bf16=_RECURRENCE_BF16 and not interpret)
        ro_specs = [
            pl.BlockSpec((P, n_out_p, n_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((P, n_out_p, n_in_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((P, n_out_p, BC), lambda i: (i, 0, 0)),
        ]
        ro_args = (wofs, wofu, mask)
    else:
        wofs = jnp.zeros((n_rs, n_out_p, B_p), dtype=jnp.float32)
        wofs = wofs.at[:n_res, :n_out, :B].set(jnp.transpose(
            jnp.repeat(Wt_out[:, :n_res, :], Dg, axis=0), (1, 2, 0)))
        wofu = jnp.zeros((n_in_p, n_out_p, B_p), dtype=jnp.float32)
        wofu = wofu.at[:n_in, :n_out, :B].set(jnp.transpose(
            jnp.repeat(Wt_out[:, n_res:, :], Dg, axis=0), (1, 2, 0)))
        # interpret mode (CPU tests) lacks the TPU PRNG primitive; the
        # reference parity tests run with noise amplitude 0 anyway
        n_prog = B_p // (ilv * BC)
        WBC = ilv * BC
        kernel = functools.partial(_predict_kernel, T=T, n_p=n_p, n_rs=n_rs,
                                   with_prng=not interpret,
                                   rec_bf16=_RECURRENCE_BF16 and not interpret,
                                   ilv=ilv)
        ro_specs = [
            pl.BlockSpec((n_rs, n_out_p, WBC), lambda i: (0, 0, i)),
            pl.BlockSpec((n_in_p, n_out_p, WBC), lambda i: (0, 0, i)),
        ]
        ro_args = (wofs, wofu)

    WBC = BC if grouped else WBC

    out = pl.pallas_call(
        kernel,
        **params,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((T, n_in_p, WBC), lambda i: (0, 0, i)),
            pl.BlockSpec((n_p, n_p), lambda i: (0, 0)),
            pl.BlockSpec((n_p, n_in_p + n_out_p), lambda i: (0, 0)),
            *ro_specs,
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T, n_out_p, WBC), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((T, n_out_p, B_p), jnp.float32),
        interpret=interpret,
    )(u_fm, W, Wio, *ro_args, _seed_arg(noise_key), noise_amp)

    outs = jnp.transpose(out[:, :n_out, :B], (2, 0, 1))        # (B, T, n_out)
    return outs[:, n_forget:] / scale.teacher_scaling


# --------------------------------------------------------------------------
# states kernel (row-major, single program — fit batches are small)
# --------------------------------------------------------------------------

def _states_kernel(u_ref, d_ref, wt_ref, wio_ref, seed_ref,
                   noise_ref, out_ref, *, T, with_prng, rec_bf16):
    if with_prng:
        pltpu.prng_seed(seed_ref[0, 0])
    out_ref[0] = jnp.zeros_like(out_ref[0])

    def step(t, s):
        # merged [u_t | d_{t-1}] @ [Win; Wfb] dot (same rationale as the
        # predict kernel: one small MXU dot instead of two per step)
        z = jnp.concatenate([u_ref[t], d_ref[t - 1]], axis=1)
        pre = (_rec_dot(s, wt_ref[:], rec_bf16)
               + jnp.dot(z, wio_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))
        s_new = jnp.tanh(pre)
        if with_prng:
            s_new = s_new + noise_ref[0, 0] * (
                _uniform_from_bits(s_new.shape) - 0.5)
        out_ref[t] = s_new
        return s_new

    jax.lax.fori_loop(1, T, step, jnp.zeros_like(out_ref[0]))


def esn_states_pallas(res: EsnReservoir, scale: EsnScale, inputs: jnp.ndarray,
                      teachers_scaled: jnp.ndarray, noise_key,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in for models/esn.esn_states. Returns (B, T, n_res)."""
    B, T, n_in = inputs.shape
    n_res = res.Wt.shape[0]
    n_out = teachers_scaled.shape[-1]
    n_p = _pad_to(n_res, _LANE)
    n_in_p = _pad_to(n_in, _LANE)  # lane axis of u
    n_out_p = _pad_to(n_out, _LANE)  # lane axis of d
    B_p = _pad_to(B, _SUB)

    u = inputs * scale.input_scaling + scale.input_shift
    u_rm = jnp.zeros((T, B_p, n_in_p), dtype=jnp.float32)
    u_rm = u_rm.at[:, :B, :n_in].set(jnp.transpose(u, (1, 0, 2)))
    d_rm = jnp.zeros((T, B_p, n_out_p), dtype=jnp.float32)
    d_rm = d_rm.at[:, :B, :n_out].set(
        jnp.transpose(teachers_scaled, (1, 0, 2)))
    w_dtype = (jnp.bfloat16 if _RECURRENCE_BF16 and not interpret
               else jnp.float32)
    W = jnp.zeros((n_p, n_p), dtype=w_dtype)
    W = W.at[:n_res, :n_res].set(res.Wt.astype(w_dtype))       # s @ Wt form
    Wio = jnp.zeros((n_in_p + n_out_p, n_p), dtype=jnp.float32)
    Wio = Wio.at[:n_in, :n_res].set(res.W_in_t)
    Wio = Wio.at[n_in_p:n_in_p + n_out, :n_res].set(res.W_fb_t)

    kernel = functools.partial(_states_kernel, T=T, with_prng=not interpret,
                               rec_bf16=_RECURRENCE_BF16 and not interpret)
    noise_amp = jnp.reshape(res.noise.astype(jnp.float32), (1, 1))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B_p, n_p), jnp.float32),
        interpret=interpret,
    )(u_rm, d_rm, W, Wio, _seed_arg(noise_key), noise_amp)
    return jnp.transpose(out[:, :B, :n_res], (1, 0, 2))


# --------------------------------------------------------------------------
# viability checks (VMEM working set)
# --------------------------------------------------------------------------

def _predict_vmem_bytes(T: int, n_p: int, n_in_p: int, n_out_p: int) -> int:
    """Estimated VMEM working set of one predict-kernel grid program.

    Grid-indexed blocks (u, wofs, wofu, out) are double-buffered by the
    Mosaic pipeliner across grid steps, hence the factor 2; the broadcast
    weights (W, Win, Wfb) live once. Validated against a compiler-reported
    17.36 MiB for (T=522, n_p=640, n_in_p=16, n_out_p=8) — this estimate
    gives 21.2 MiB (conservative by design).
    """
    dbuf = (T * n_in_p * BC               # u block
            + n_p * n_out_p * BC          # wofs block
            + n_in_p * n_out_p * BC       # wofu block
            + T * n_out_p * BC)           # out block
    single = n_p * n_p + n_p * (n_in_p + n_out_p)
    scratch = 4 * n_p * BC                # state/pre/tanh temporaries
    return 4 * (2 * dbuf + single + scratch)


def predict_viable(B: int, T: int, n_res: int, n_in: int, n_out: int,
                   vmem_budget: int = _VMEM_BUDGET) -> bool:
    n_p = _pad_to(n_res, _LANE)
    n_in_p = _pad_to(n_in, _SUB)
    n_out_p = _pad_to(n_out, _SUB)
    return _predict_vmem_bytes(T, n_p, n_in_p, n_out_p) < vmem_budget


def states_viable(B: int, T: int, n_res: int, n_in: int, n_out: int,
                  vmem_budget: int = _VMEM_BUDGET) -> bool:
    n_p = _pad_to(n_res, _LANE)
    B_p = _pad_to(B, _SUB)
    bytes_needed = 4 * (T * B_p * (_pad_to(n_in, _LANE) + _pad_to(n_out, _LANE))
                        + 3 * n_p * n_p
                        + T * B_p * n_p
                        + 4 * B_p * n_p)
    return bytes_needed < vmem_budget
