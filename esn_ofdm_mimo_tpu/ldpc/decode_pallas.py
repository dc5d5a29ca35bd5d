"""Fused Pallas TPU BP decoder for quasi-cyclic LDPC codes.

The XLA flooding decoder (ldpc/decode.py) re-streams the (B, m, dc) message
tensor and its gather/scatter temporaries through HBM on every iteration —
~2 GB of traffic per iteration at flagship decode batches, and TPU gathers
lower poorly besides. This kernel exploits the QC structure built by
`make_qc_ldpc` (ldpc/code.py): the variable-major -> check-major edge
relabeling is a *static cyclic shift per base cell*, so one BP iteration is
pure VPU arithmetic plus dv*dc static sublane rolls, with the full message
state resident in VMEM across ALL iterations:

  layout    codewords on lanes (W=128 per grid program), lifted indices on
            sublanes; messages r[(i, j)] live as a (dv, dc, Z, W) scratch
  routing   check (i, z') sees variable (j, z) iff z' == (z + s[i,j]) % Z
            -> roll((Z, W) block, s[i,j]) along sublanes, shift static
  traffic   one read of the channel LLRs + one write of the hard bits per
            codeword, independent of iteration count
  early exit per grid program: each 128-codeword tile stops iterating when
            all its lanes have a zero syndrome (the per-detector decode
            batches separate well: near-converged MMSE tiles stop in a few
            iterations while ESN tiles run long)

Semantics match ldpc_decode_bp on the same graph: flooding schedule,
sum-product (tanh rule) or normalized min-sum, per-codeword decision freeze
at first zero syndrome, unconverged codewords keep the final posterior.
Decoding runs on the FULL dv*Z-check lifted graph (including the dv-1
redundant checks the row-trimmed encoder view drops — they preserve the
cyclic structure and only help BP). Validated against the XLA decoder on
the same graph in tests/test_ldpc_qc.py.

Reference contract being accelerated: pyldpc BP maxiter loop
(reference OFDM_SISO_NBF_LDPC.py:484, Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:496).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .code import LdpcCode

# codewords per grid program (lane width). 256 doubles the per-program
# batch (fewer grid programs, coarser early-exit granularity) — only
# feasible with bf16 message storage (f32 messages at W=256 need a 16 MB
# scratch, the whole VMEM). A/B knob; see LDPC_PALLAS_MSG_DTYPE.
W = int(os.environ.get("LDPC_PALLAS_W", "128"))
MSG_CLIP = 16.0     # same clip as the XLA decoder
_PAD_LLR = 40.0     # padding lanes decode to all-zeros at iteration 0

# A/B knobs (read at import; one process per setting — the compiled kernel
# is cached per static shape, not per env):
#   LDPC_PALLAS_ATANH: "log" (default) = 2*atanh(p) as log((1+p)/(1-p)),
#     one transcendental; "log1p" = the log1p(p)-log1p(-p) pair (round-2
#     form). Same math, different op count — tools A/B only. Numerics note
#     (ADVICE r03): the "log" form computes 1.0+p in f32, so |p| below
#     ~1e-7 rounds to 1.0 and the weakest messages quantize to 0, where
#     log1p kept full relative accuracy. Measured BER-neutral (the 2.9x
#     speedup ships), but Pallas-vs-XLA bit agreement is a >0.9 band, not
#     exact equality — keep cross-backend tests on agreement bands.
#   LDPC_PALLAS_SYN_EVERY: check the syndrome every k-th iteration.
#     DIAGNOSTIC ONLY for cost attribution — k>1 changes the freeze
#     semantics (pyldpc checks every iteration) and must never ship.
#   LDPC_PALLAS_MSG_DTYPE: "f32" (default) | "bf16" — check->var message
#     scratch storage dtype. bf16 halves the (dv, dc, Z, W) VMEM footprint
#     (8 -> 4 MB at Z=64, W=128) enabling W=256 lanes/program; arithmetic
#     stays f32 (upcast on read, downcast on write), so the only numeric
#     change is ~8-bit-mantissa message quantization — a round-4 A/B
#     candidate (VERDICT r03 #2), BER-validated before any default change.
_ATANH_IMPL = os.environ.get("LDPC_PALLAS_ATANH", "log")
_SYN_EVERY = int(os.environ.get("LDPC_PALLAS_SYN_EVERY", "1"))
_MSG_DTYPE = (jnp.bfloat16
              if os.environ.get("LDPC_PALLAS_MSG_DTYPE", "f32") == "bf16"
              else jnp.float32)


def _roll(x: jnp.ndarray, s: int, Z: int) -> jnp.ndarray:
    """out[z'] = x[(z' - s) % Z] along sublanes; s is a Python int."""
    s = s % Z
    if s == 0:
        return x
    return pltpu.roll(x, shift=s, axis=0)


def _bp_kernel(Z: int, dv: int, dc: int, shifts, max_iter: int, algo: str,
               minsum_scale: float, schedule: str = "flooding",
               msg_dtype=None, minsum_offset: float = 0.625):
    """Build the kernel body with all structure baked in statically.

    `max_iter` is the STATIC trip count the kernel compiles with; the
    `cap_ref` SMEM scalar is a runtime iteration cap <= max_iter, so one
    compiled kernel serves traced per-SNR iteration budgets (the NBF
    pipelines double the cap below 6 dB with Eb/N0 traced,
    pipelines/blockfading.py; reference DEC_MAXITER rule
    OFDM_SISO_NBF_LDPC.py:196). Iterations past the cap are skipped by the
    same predication that implements per-tile convergence early exit.

    schedule="flooding" reproduces pyldpc's parallel message updates;
    "layered" is the serial-C (row-layered) schedule: the dv lifted base
    rows update in sequence within one sweep, each seeing the posteriors
    already refreshed by the previous layers. Layered BP propagates
    information ~2x faster per sweep, so half the iteration budget reaches
    the flooding fixed point at equal BER (validated in
    tests/test_ldpc_qc.py + the TPU parity reruns) — the decode-bound
    e2e path runs layered at max_iter/2 by LdpcConfig.schedule."""
    shifts = [[int(shifts[i][j]) for j in range(dc)] for i in range(dv)]
    msg_dtype = _MSG_DTYPE if msg_dtype is None else msg_dtype

    def kernel(lc_ref, cap_ref, bits_ref, stats_ref, r_ref, lt_ref):
        one = jnp.ones((Z, W), jnp.float32)
        cap = cap_ref[0]

        def lc(j):
            return lc_ref[j * Z:(j + 1) * Z, :]

        def r(i, j):
            return r_ref[i, j].astype(jnp.float32)

        def r_sum(j):
            t = r(0, j)
            for i in range(1, dv):
                t = t + r(i, j)
            return t

        def posterior(j):
            """Total per-variable LLR, always read from the lt_ref scratch:
            layered maintains it incrementally; flooding refreshes it once
            per iteration after the message updates — the same value the
            next iteration needs as its Ltot, so the old two-per-iteration
            posterior computations (body start + decide) collapse to one
            (bit-identical: same expression, same op order)."""
            return lt_ref[j]

        def decide_and_check():
            """Posterior decision per variable + per-lane syndrome-ok flag."""
            d = [(posterior(j) < 0.0).astype(jnp.float32)
                 for j in range(dc)]
            bad = jnp.zeros((1, W), jnp.float32)
            for i in range(dv):
                acc = _roll(d[0], shifts[i][0], Z)
                for j in range(1, dc):
                    acc = acc + _roll(d[j], shifts[i][j], Z)
                par = acc - 2.0 * jnp.floor(acc * 0.5)   # mod 2
                bad = jnp.maximum(bad, jnp.max(par, axis=0, keepdims=True))
            return d, (bad < 0.5).astype(jnp.float32)    # ok: (1, W)

        def freeze(d, ok, it_val, force=None):
            """Write decisions for not-yet-frozen lanes; update stats.

            The dc block writes only run when a lane just froze or this is
            the last executed iteration (force): frozen lanes never change,
            and unfrozen lanes only need their FINAL posterior decision
            (pyldpc keeps the final message for unconverged codewords), so
            intermediate writes are dead — skipping them saves 8 masked
            (Z, W) stores per tile-iteration, bit-identically."""
            prev_done = stats_ref[1:2, :]
            upd = 1.0 - prev_done                         # (1, W)
            just = upd * ok

            def write_bits():
                for j in range(dc):
                    blk = bits_ref[j * Z:(j + 1) * Z, :]
                    bits_ref[j * Z:(j + 1) * Z, :] = jnp.where(
                        upd > 0.5, d[j], blk)

            if force is None:
                write_bits()
            else:
                @pl.when(force | (jnp.max(just) > 0.5))
                def _w():
                    write_bits()
            stats_ref[0:1, :] = jnp.where(just > 0.5, jnp.full((1, W), it_val,
                                                               jnp.float32),
                                          stats_ref[0:1, :])
            stats_ref[1:2, :] = jnp.maximum(prev_done, ok)

        def check_update_row(i, q):
            """Leave-one-out check update of base row i from var->check
            inputs q[j] (clipped, variable domain). Returns the new
            check->var messages r_new[j] rolled back to the var domain."""
            if algo in ("minsum", "offset-minsum"):
                tc = [_roll(q[j], shifts[i][j], Z) for j in range(dc)]
                # online (min, second-min, first-argmin) over j
                sgn = [jnp.where(tc[j] < 0, -one, one) for j in range(dc)]
                sprod = sgn[0]
                for j in range(1, dc):
                    sprod = sprod * sgn[j]
                m1 = jnp.abs(tc[0])
                m2 = jnp.full((Z, W), jnp.inf, jnp.float32)
                arg1 = jnp.zeros((Z, W), jnp.float32)
                for j in range(1, dc):
                    a = jnp.abs(tc[j])
                    is_new = a < m1
                    m2 = jnp.where(is_new, m1, jnp.minimum(m2, a))
                    arg1 = jnp.where(is_new, float(j), arg1)
                    m1 = jnp.minimum(m1, a)
                out = []
                for j in range(dc):
                    loo = jnp.where(arg1 == float(j), m2, m1)
                    if algo == "offset-minsum":
                        # offset (λ-subtract) variant: same op budget as
                        # normalized min-sum, minsum_scale ignored
                        rc = sprod * sgn[j] * jnp.maximum(
                            jnp.minimum(loo, MSG_CLIP) - minsum_offset, 0.0)
                    else:
                        rc = (minsum_scale * sprod * sgn[j]
                              * jnp.minimum(loo, MSG_CLIP))
                    out.append(_roll(rc, -shifts[i][j], Z))
                return out
            tc = [_roll(jnp.tanh(0.5 * q[j]), shifts[i][j], Z)
                  for j in range(dc)]
            # leave-one-out product via forward/backward partials
            fwd = [one]
            for j in range(dc - 1):
                fwd.append(fwd[-1] * tc[j])
            bwd = one
            out = [None] * dc
            for j in range(dc - 1, -1, -1):
                prod = jnp.clip(fwd[j] * bwd, -0.9999999, 0.9999999)
                if _ATANH_IMPL == "log2":
                    # two plain logs, no divide — A/B vs the log+div form
                    rc = jnp.log(1.0 + prod) - jnp.log(1.0 - prod)
                elif _ATANH_IMPL == "log":
                    # 2*atanh(p) = log((1+p)/(1-p)): ONE transcendental +
                    # a divide instead of two log1p calls — same math
                    # (A/B: tools/bench_bp_itercost.py)
                    rc = jnp.log((1.0 + prod) / (1.0 - prod))
                else:
                    rc = jnp.log1p(prod) - jnp.log1p(-prod)
                out[j] = _roll(rc, -shifts[i][j], Z)
                bwd = bwd * tc[j]
            return out

        # --- iteration 0: zero messages, channel-only decision -------------
        r_ref[...] = jnp.zeros((dv, dc, Z, W), msg_dtype)
        for j in range(dc):
            lt_ref[j] = lc(j)               # posterior with zero messages
        stats_ref[...] = jnp.zeros((8, W), jnp.float32)
        # unconverged lanes report the *effective* iteration budget
        stats_ref[0:1, :] = jnp.full((1, W), 1.0, jnp.float32) * cap.astype(jnp.float32)
        d0, ok0 = decide_and_check()
        freeze(d0, ok0, 0.0)

        # --- BP iterations ---------------------------------------------------
        def body(it, carry):
            all_done = jnp.min(stats_ref[1:2, :]) > 0.5

            @pl.when(jnp.logical_not(all_done) & (it < cap))
            def _iter():
                if schedule == "layered":
                    # serial-C sweep: each base row sees the posteriors the
                    # previous rows just refreshed. The posterior update
                    # uses the UNclipped q (flooding never clips Ltot
                    # either); only the message entering the check clips.
                    for i in range(dv):
                        q = [lt_ref[j] - r(i, j) for j in range(dc)]
                        qc = [jnp.clip(q[j], -MSG_CLIP, MSG_CLIP)
                              for j in range(dc)]
                        r_new = check_update_row(i, qc)
                        for j in range(dc):
                            # add the ROUNDED message into the posterior so
                            # Ltot == lc + sum(r_stored) holds exactly under
                            # bf16 message storage too (ADVICE r04 #2: the
                            # unrounded add drifts by accumulated rounding
                            # residuals over dv*iterations); f32 storage is
                            # bit-identical (the casts are no-ops)
                            r_stored = r_new[j].astype(msg_dtype)
                            r_ref[i, j] = r_stored
                            lt_ref[j] = q[j] + r_stored.astype(jnp.float32)
                else:
                    # flooding: all rows update from the same pre-iteration
                    # posteriors (lt_ref, refreshed at the end of the
                    # previous iteration — identical to recomputing
                    # lc + r_sum here)
                    Ltot = [lt_ref[j] for j in range(dc)]
                    for i in range(dv):
                        q = [jnp.clip(Ltot[j] - r(i, j),
                                      -MSG_CLIP, MSG_CLIP)
                             for j in range(dc)]
                        r_new = check_update_row(i, q)
                        for j in range(dc):
                            r_ref[i, j] = r_new[j].astype(msg_dtype)
                    for j in range(dc):
                        lt_ref[j] = lc(j) + r_sum(j)
                if _SYN_EVERY > 1:
                    # diagnostic cost-attribution mode only (see knob doc)
                    @pl.when(jnp.mod(it, _SYN_EVERY) == _SYN_EVERY - 1)
                    def _check():
                        d, ok = decide_and_check()
                        freeze(d, ok, jnp.float32(it) + 1.0)
                else:
                    d, ok = decide_and_check()
                    is_last = (it + 1) >= cap
                    freeze(d, ok, jnp.float32(it) + 1.0, force=is_last)
            return carry

        jax.lax.fori_loop(0, max_iter, body, None)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7, 8, 9))
def _decode_padded(shape_key, lc_nat_T: jnp.ndarray, iter_cap: jnp.ndarray,
                   max_iter: int, algo: str, minsum_scale: float, qc_static,
                   schedule: str = "flooding", msg_dtype=None,
                   minsum_offset: float = 0.625):
    Z, dv, dc, shifts = qc_static
    n, Bp = lc_nat_T.shape
    kernel = _bp_kernel(Z, dv, dc, shifts, max_iter, algo, minsum_scale,
                        schedule, msg_dtype, minsum_offset)
    scratch = [pltpu.VMEM((dv, dc, Z, W),
                          _MSG_DTYPE if msg_dtype is None else msg_dtype),
               # posterior scratch (both schedules; see posterior())
               pltpu.VMEM((dc, Z, W), jnp.float32)]
    bits_T, stats = pl.pallas_call(
        kernel,
        grid=(Bp // W,),
        in_specs=[pl.BlockSpec((n, W), lambda w: (0, w),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((n, W), lambda w: (0, w),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, W), lambda w: (0, w),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((8, Bp), jnp.float32)),
        scratch_shapes=scratch,
    )(lc_nat_T, iter_cap)
    return bits_T, stats


def ldpc_decode_bp_pallas(code: LdpcCode, llr: jnp.ndarray,
                          max_iter: int = 100, algo: str = "sumprod",
                          minsum_scale: float = 0.75,
                          return_stats: bool = False,
                          iter_cap=None, schedule: str = "flooding",
                          pass1_iters=None, msg_dtype=None,
                          minsum_offset: float = 0.625):
    """Drop-in fast path for ldpc_decode_bp on QC codes (TPU backends).

    llr (B, n) channel LLRs in pipeline bit order; returns hard bits (B, n)
    int8 (+ the same stats dict as the XLA decoder when return_stats).
    `max_iter` must be a static int (the compiled trip count); `iter_cap`
    may be a TRACED scalar <= max_iter limiting the executed iterations —
    the NBF pipelines' per-SNR doubled budget rides one compiled kernel.
    schedule="layered" runs the serial-C row-layered sweep (see _bp_kernel).

    pass1_iters=K1 enables BIT-EXACT two-pass straggler compaction: the
    kernel's early exit is per 128-lane tile, so one unconverged codeword
    pins its whole tile to the full budget (at 99.8% convergence ~1 tile in
    4 still holds a straggler). Pass 1 decodes everything at budget K1;
    codewords that converged are replaced by their decided bits as +-PAD
    LLRs (zero syndrome at iteration 0 => the tile freezes before any BP
    work) and a stable sort packs the stragglers into a few dense tiles,
    which re-run FROM SCRATCH at the full budget. BP trajectories are
    per-codeword deterministic, so re-running a straggler from iteration 0
    reproduces the single-pass result exactly — bits AND iteration stats
    are bit-identical to the single-pass decode (asserted in
    tests/test_ldpc_qc.py), only the wasted straggler-tile iterations
    disappear. Pyldpc parity is therefore untouched (reference maxiter
    loop: OFDM_SISO_NBF_LDPC.py:484).
    """
    bits, stats = _decode_impl(code, llr, max_iter, algo, minsum_scale,
                               iter_cap, schedule, pass1_iters, None,
                               msg_dtype, minsum_offset)
    if return_stats:
        return bits, stats
    return bits


def ldpc_decode_bp_pallas_counts(code: LdpcCode, llr: jnp.ndarray,
                                 info_bits: jnp.ndarray,
                                 max_iter: int = 100, algo: str = "sumprod",
                                 minsum_scale: float = 0.75,
                                 iter_cap=None, schedule: str = "flooding",
                                 pass1_iters=None, msg_dtype=None,
                                 minsum_offset: float = 0.625):
    """Decode + count info-bit errors WITHOUT materialising natural-order
    bits: the Monte-Carlo pipelines only consume per-codeword error counts,
    and transposing the (n, B) kernel output back to (B, n) plus the
    natural->pipeline permutation costs ~30 ms per GB at flagship batches
    (tools/bench_decode_pieces.py — XLA transposes run ~30 GB/s). Counting
    happens in the kernel's own transposed domain: a k-row gather of the
    info rows compared against the (k, B) transposed truth.

    info_bits (B, k) in pipeline order. Returns (err (B,) int32 info-bit
    errors per codeword, stats dict) — decode results identical to
    ldpc_decode_bp_pallas (same kernel passes; asserted in
    tests/test_ldpc_qc.py)."""
    return _decode_impl(code, llr, max_iter, algo, minsum_scale,
                        iter_cap, schedule, pass1_iters, info_bits,
                        msg_dtype, minsum_offset)


def _decode_impl(code, llr, max_iter, algo, minsum_scale, iter_cap,
                 schedule, pass1_iters, count_against, msg_dtype=None,
                 minsum_offset: float = 0.625):
    qc = code.qc
    assert qc is not None, "pallas decoder requires a QC code (make_qc_ldpc)"
    # Contract: `max_iter` (the compiled trip count) must dominate every
    # runtime value of `iter_cap` — a larger traced cap is silently clamped
    # to max_iter by the jnp.minimum below (the kernel cannot run more
    # iterations than it was compiled for). Callers with a traced budget
    # must size max_iter_bound at the worst case (the NBF pipelines use
    # 2*max_iter for the doubled-below-6dB rule). Concrete caps are checked
    # eagerly here; traced caps are the caller's promise.
    if iter_cap is not None and not isinstance(iter_cap, jax.core.Tracer):
        assert int(iter_cap) <= int(max_iter), (
            f"iter_cap={int(iter_cap)} exceeds the compiled max_iter="
            f"{int(max_iter)}; raise max_iter (or max_iter_bound)")
    B, n = llr.shape
    Bp = -(-B // W) * W
    lc_nat = llr.astype(jnp.float32)[:, jnp.asarray(qc.inv_perm)]
    qc_static = (int(qc.Z), int(code.dv), int(code.dc),
                 tuple(tuple(int(s) for s in row) for row in qc.shifts))
    cap = max_iter if iter_cap is None else iter_cap
    cap = jnp.minimum(jnp.asarray(cap, jnp.int32), jnp.int32(max_iter))
    counts_mode = count_against is not None
    if counts_mode:
        # natural-order rows holding the pipeline info columns m..n-1
        info_rows = jnp.asarray(qc.perm[code.m:])

    def _run(lc_rows, run_cap, trips):
        """trips = the kernel's STATIC fori_loop count. Iterations past the
        runtime cap are predicated off but still pay the loop-trip check,
        so each pass compiles at its own worst case (pass 1 at pass1_iters,
        not max_iter — at the flagship decode batch the difference is
        ~84 empty trips x 1776 tiles per detector)."""
        lc_T = jnp.full((n, Bp), _PAD_LLR, jnp.float32)
        lc_T = jax.lax.dynamic_update_slice(lc_T, lc_rows.T, (0, 0))
        bits_T, stats = _decode_padded(None, lc_T, run_cap.reshape(1),
                                       int(trips), algo,
                                       float(minsum_scale), qc_static,
                                       schedule, msg_dtype,
                                       float(minsum_offset))
        it = stats[0, :B].astype(jnp.int32)
        conv = stats[1, :B] > 0.5
        return bits_T, it, conv

    def _result(bits_T, truth):
        """Counts mode: per-codeword info-bit errors straight from the
        transposed kernel output (k-row gather, no (n, B) transpose).
        Bits mode: the (B, n) pipeline-order hard bits."""
        if counts_mode:
            sub = bits_T[info_rows][:, :B]                 # (k, B)
            bad = sub != truth.T.astype(bits_T.dtype)
            return jnp.sum(bad.astype(jnp.int32), axis=0)  # (B,)
        return bits_T[:, :B].T[:, jnp.asarray(qc.perm)].astype(jnp.int8)

    if pass1_iters is not None and int(pass1_iters) < int(max_iter):
        k1 = jnp.minimum(jnp.int32(int(pass1_iters)), cap)
        bT1, it1, cv1 = _run(lc_nat, k1, int(pass1_iters))
        r1 = _result(bT1, count_against)
        # Converged rows re-enter pass 2 as rows that freeze at iteration 0
        # (zero syndrome before any BP work); a stable sort packs the
        # stragglers (False first) into dense tiles which re-run FROM
        # SCRATCH at the full budget. Converged lanes' pass-2 results are
        # DISCARDED (the final merge takes pass-1 values for them), so the
        # re-entry content only needs to freeze instantly: constant +PAD
        # (the all-zeros codeword) does, without hauling pass-1's decoded
        # bits back to row-major order. Straggler lanes' rows, tile
        # packing, and budgets are unchanged, so their trajectories — and
        # the merged result — stay bit-identical to the single-pass decode.
        order = jnp.argsort(cv1, stable=True)
        lc2 = jnp.where(cv1[:, None], _PAD_LLR, lc_nat)
        bT2, it2, cv2 = _run(lc2[order], cap, int(max_iter))
        r2 = _result(bT2, count_against[order] if counts_mode else None)
        inv = jnp.argsort(order, stable=True)
        r2, it2, cv2 = r2[inv], it2[inv], cv2[inv]
        if counts_mode:
            result = jnp.where(cv1, r1, r2)
        else:
            result = jnp.where(cv1[:, None], r1, r2)
        it = jnp.where(cv1, it1, it2)
        conv = cv1 | cv2
    else:
        bT, it, conv = _run(lc_nat, cap, int(max_iter))
        result = _result(bT, count_against)

    return result, {"iterations": it, "converged": conv}
