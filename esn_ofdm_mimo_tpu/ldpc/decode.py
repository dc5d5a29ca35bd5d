"""Batched log-domain belief-propagation LDPC decoder, TPU layout.

Replaces the reference's per-codeword pyldpc `decode(H, y_obs, snr, maxiter)`
(reference OFDM_SISO_NBF_LDPC.py:484). pyldpc semantics reproduced:
  * channel LLR from its BPSK observation model: Lc = 2*y/sigma^2 with
    sigma^2 = 10^(-snr/10); the reference always passes snr=1.0 and
    y_obs = llr/2, so Lc = llr / 10^(-0.1) ≈ 1.2589 * llr
    (`llr_from_yobs` packages exactly that contract);
  * positive LLR <=> bit 0; flooding-schedule sum-product updates;
  * early exit on zero syndrome — per codeword: each codeword's decision
    freezes at its first zero-syndrome iteration; the batch-level
    `lax.while_loop` exits when every codeword froze or maxiter is reached.

TPU design: the irregular sparse connectivity is laid out as two dense int32
gather maps built at construction time (code.ck_cols (m, dc): variables in
each check; code.var_edge (n, dv): incident edge slots of each variable).
One BP iteration is then a handful of dense gathers/scatter-free segment sums
over (B, m, dc) / (B, n, dv) tensors — no host control flow, no dynamic
shapes, vmap-free batching over codewords.

Leave-one-out check products use forward/backward cumulative products along
the (static, tiny) dc axis — exact, division-free, saturation-safe with the
±MSG_CLIP message clip.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .code import LdpcCode

MSG_CLIP = 16.0  # |tanh(x/2)| stays < 1 in f32 up to ~x=16

# QC codes (make_qc_ldpc) have a fused Pallas decoder (decode_pallas.py):
#   auto   — Pallas on TPU backends, XLA elsewhere (default)
#   xla    — always the XLA flooding decoder (on the same full QC graph)
#   pallas — force the kernel (interpret-mode capable on CPU for tests)
LDPC_TPU_IMPL = os.environ.get("LDPC_TPU_IMPL", "auto")


def llr_from_yobs(y_obs: jnp.ndarray, snr_db: float = 1.0) -> jnp.ndarray:
    """pyldpc channel-LLR contract: Lc = 2*y/10^(-snr/10)."""
    var = 10.0 ** (-snr_db / 10.0)
    return 2.0 * y_obs / var


def _leave_one_out_prod(t: jnp.ndarray) -> jnp.ndarray:
    """Exact leave-one-out product along the last (small, static) axis."""
    dc = t.shape[-1]
    ones = jnp.ones_like(t[..., :1])
    fwd = jnp.concatenate([ones, jnp.cumprod(t[..., :-1], axis=-1)], axis=-1)
    bwd_rev = jnp.cumprod(t[..., ::-1][..., :-1], axis=-1)[..., ::-1]
    bwd = jnp.concatenate([bwd_rev, ones], axis=-1)
    return fwd * bwd


def ldpc_decode_bp(code: LdpcCode, llr: jnp.ndarray, max_iter: int = 100,
                   algo: str = "sumprod", minsum_scale: float = 0.75,
                   return_stats: bool = False, max_iter_bound=None,
                   schedule: str = "flooding", pass1_iters=None,
                   minsum_offset: float = 0.625):
    """Decode B codewords. llr (B, n) channel LLRs (positive <=> bit 0).

    algo="sumprod" reproduces pyldpc's tanh-rule updates (the parity
    default); algo="minsum" is the normalised min-sum approximation
    (sign-product x scaled second-min magnitude) — cheaper per iteration,
    the classic hardware decoder; ~0.1-0.2 dB from sum-product at rate 1/2;
    algo="offset-minsum" is the offset (λ-subtract) variant:
    sign-product x max(second-min - minsum_offset, 0) — same op budget as
    minsum, often closer to sum-product on short low-dv codes
    (VERDICT r04 #3 A/B; minsum_scale is ignored in this mode).

    schedule="flooding" is pyldpc's parallel update (the parity default);
    schedule="layered" (QC codes only) is the serial-C row-layered sweep:
    the dv base rows update in sequence within one iteration, each seeing
    posteriors the previous rows just refreshed. Layered converges in about
    half the flooding iterations at equal BER (standard result, validated
    in tests/test_ldpc_qc.py), so a layered max_iter=K budget replaces a
    flooding 2K budget — the decode-bound pipelines exploit this through
    LdpcConfig.schedule.

    QC codes decode on their full lifted graph (the same graph on every
    backend): through the fused Pallas kernel on TPU, or through this XLA
    decoder with the natural-order index tensors elsewhere.

    pass1_iters=K1 (Pallas path only; ignored elsewhere) enables the
    bit-exact two-pass straggler compaction documented in
    ldpc_decode_bp_pallas — identical bits and stats, ~2-4x less decode
    time whenever stragglers pin tiles to the full budget.

    Returns hard codeword bits (B, n) int8. With return_stats=True also
    returns {"iterations": (B,) int32 first zero-syndrome iteration (0 =
    already clean, max_iter = never converged), "converged": (B,) bool} —
    the early-termination telemetry the decode phase is profiled by
    (SURVEY.md §5 observability; reference has only a maxiter knob).
    """
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown BP schedule {schedule!r}")
    if schedule == "layered" and code.qc is None:
        raise ValueError("schedule='layered' requires a QC code "
                         "(LdpcConfig.family='qc')")
    if code.qc is not None:
        impl = LDPC_TPU_IMPL
        if impl == "auto":
            impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        iter_cap = None
        if isinstance(max_iter, jax.core.Tracer):
            # the fused kernel bakes its trip count in statically; a traced
            # iteration budget (the NBF pipelines' doubled-below-6dB rule
            # with Eb/N0 traced) runs as a runtime cap inside a kernel
            # compiled at the static `max_iter_bound` worst case. Without a
            # bound, fall back to the XLA decoder, whose while_loop accepts
            # a dynamic bound directly.
            if impl == "pallas" and max_iter_bound is not None:
                iter_cap, max_iter = max_iter, int(max_iter_bound)
            else:
                impl = "xla"
        if impl == "pallas":
            from .decode_pallas import ldpc_decode_bp_pallas
            return ldpc_decode_bp_pallas(code, llr, max_iter, algo,
                                         minsum_scale, return_stats,
                                         iter_cap=iter_cap,
                                         schedule=schedule,
                                         pass1_iters=pass1_iters,
                                         minsum_offset=minsum_offset)
        # XLA path on the identical full QC graph, in natural column order
        llr_nat = llr[:, jnp.asarray(code.qc.inv_perm)]
        if schedule == "layered":
            out = _decode_bp_qc_layered(code, llr_nat, max_iter, algo,
                                        minsum_scale, return_stats,
                                        minsum_offset)
        else:
            out = _decode_bp_graph(jnp.asarray(code.qc.ck_cols_nat),
                                   jnp.asarray(code.qc.var_edge_nat),
                                   llr_nat, max_iter, algo, minsum_scale,
                                   return_stats, minsum_offset)
        perm = jnp.asarray(code.qc.perm)
        if return_stats:
            bits, stats = out
            return bits[:, perm], stats
        return out[:, perm]
    return _decode_bp_graph(jnp.asarray(code.ck_cols),
                            jnp.asarray(code.var_edge), llr, max_iter,
                            algo, minsum_scale, return_stats,
                            minsum_offset)


def ldpc_decode_bp_counts(code: LdpcCode, llr: jnp.ndarray,
                          info_bits: jnp.ndarray, max_iter: int = 100,
                          algo: str = "sumprod", minsum_scale: float = 0.75,
                          max_iter_bound=None, schedule: str = "flooding",
                          pass1_iters=None, minsum_offset: float = 0.625):
    """Decode + per-codeword info-bit error counts, skipping the bits
    round-trip where the backend allows.

    The Monte-Carlo pipelines only consume error COUNTS; on the Pallas path
    the comparison happens in the kernel's transposed domain
    (ldpc_decode_bp_pallas_counts — saves the (n, B) transpose + column
    permutation, ~60-90 ms per fused SNR dispatch at flagship batches).
    Elsewhere this decodes normally and compares — results are identical
    by construction (asserted in tests/test_ldpc_qc.py).

    info_bits (B, k) pipeline order. Returns (err (B,) int32, stats)."""
    if schedule not in ("flooding", "layered"):
        raise ValueError(f"unknown BP schedule {schedule!r}")
    if code.qc is not None:
        impl = LDPC_TPU_IMPL
        if impl == "auto":
            impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
        iter_cap = None
        if isinstance(max_iter, jax.core.Tracer):
            if impl == "pallas" and max_iter_bound is not None:
                iter_cap, max_iter = max_iter, int(max_iter_bound)
            else:
                impl = "xla"
        if impl == "pallas":
            from .decode_pallas import ldpc_decode_bp_pallas_counts
            return ldpc_decode_bp_pallas_counts(
                code, llr, info_bits, max_iter, algo, minsum_scale,
                iter_cap=iter_cap, schedule=schedule,
                pass1_iters=pass1_iters, minsum_offset=minsum_offset)
    d_hat, st = ldpc_decode_bp(code, llr, max_iter, algo, minsum_scale,
                               return_stats=True,
                               max_iter_bound=max_iter_bound,
                               schedule=schedule, pass1_iters=pass1_iters,
                               minsum_offset=minsum_offset)
    bad = d_hat[:, code.m:] != info_bits
    return jnp.sum(bad.astype(jnp.int32), axis=-1), st


def _decode_bp_qc_layered(code: LdpcCode, llr_nat: jnp.ndarray, max_iter,
                          algo: str, minsum_scale: float,
                          return_stats: bool, minsum_offset: float = 0.625):
    """Serial-C (row-layered) BP on the full lifted QC graph, natural order.

    The QC structure makes layers trivial: base row i touches every
    variable exactly once, and its check (i, z') sees variable (j, z) iff
    z' == (z + shifts[i, j]) % Z — so the whole layer update is dc static
    `jnp.roll`s per direction, no gathers (the XLA mirror of the Pallas
    kernel's sublane-roll routing, decode_pallas.py). One iteration = one
    full sweep over the dv layers, each layer reading the posteriors the
    previous layers just refreshed. Accepts a traced `max_iter` (the
    while_loop bound is dynamic).
    """
    qc = code.qc
    Z, dv, dc = int(qc.Z), int(code.dv), int(code.dc)
    shifts = [[int(s) for s in row] for row in np.asarray(qc.shifts)]
    B = llr_nat.shape[0]
    Lc = llr_nat.astype(jnp.float32).reshape(B, dc, Z)

    def syndrome_ok(lt):
        d = (lt < 0.0).astype(jnp.float32)               # (B, dc, Z)
        ok = jnp.ones((B,), bool)
        for i in range(dv):
            acc = d[:, 0] * 0.0
            for j in range(dc):
                acc = acc + jnp.roll(d[:, j], shifts[i][j], axis=-1)
            ok = ok & jnp.all(jnp.mod(acc, 2.0) == 0.0, axis=-1)
        return ok

    def sweep(r, lt):
        """One full layered iteration. r (B, dv, dc, Z), lt (B, dc, Z)."""
        for i in range(dv):
            # q feeds the posterior update UNclipped (the posterior is
            # never clipped in flooding BP either: Ltot = Lc + sum r);
            # only the var->check message entering the check update clips
            q = lt - r[:, i]                                  # (B, dc, Z)
            qc = jnp.clip(q, -MSG_CLIP, MSG_CLIP)
            t = jnp.stack([jnp.roll(qc[:, j], shifts[i][j], axis=-1)
                           for j in range(dc)], axis=-1)       # (B, Z, dc)
            if algo in ("minsum", "offset-minsum"):
                sgn = jnp.where(t < 0, -1.0, 1.0)
                sprod = _leave_one_out_prod(sgn)
                mag = jnp.abs(t)
                m1 = jnp.min(mag, axis=-1, keepdims=True)
                is_min = mag == m1
                first_min = jnp.logical_and(
                    jnp.cumsum(is_min.astype(jnp.int32), axis=-1) == 1,
                    is_min)
                m2 = jnp.min(jnp.where(first_min, jnp.inf, mag), axis=-1,
                             keepdims=True)
                loo = jnp.where(first_min, m2, m1)
                if algo == "offset-minsum":
                    rc = sprod * jnp.maximum(
                        jnp.minimum(loo, MSG_CLIP) - minsum_offset, 0.0)
                else:
                    rc = minsum_scale * sprod * jnp.minimum(loo, MSG_CLIP)
            else:
                th = jnp.tanh(0.5 * t)
                prod = jnp.clip(_leave_one_out_prod(th),
                                -0.9999999, 0.9999999)
                rc = 2.0 * jnp.arctanh(prod)
            r_new = jnp.stack([jnp.roll(rc[..., j], -shifts[i][j], axis=-1)
                               for j in range(dc)], axis=1)    # (B, dc, Z)
            lt = q + r_new
            r = r.at[:, i].set(r_new)
        return r, lt

    lt0 = Lc
    r0 = jnp.zeros((B, dv, dc, Z), jnp.float32)
    d0 = (lt0.reshape(B, -1) < 0).astype(jnp.int8)
    done0 = syndrome_ok(lt0)
    conv0 = jnp.where(done0, 0, max_iter).astype(jnp.int32)

    def cond(state):
        it, _, _, _, done, _ = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(jnp.all(done)))

    def body(state):
        it, r, lt, d_final, done, conv_it = state
        r, lt = sweep(r, lt)
        d_new = (lt.reshape(B, -1) < 0).astype(jnp.int8)
        ok = syndrome_ok(lt)
        just = ~done & ok
        d_final = jnp.where(just[:, None], d_new, d_final)
        conv_it = jnp.where(just, it + 1, conv_it)
        return it + 1, r, lt, d_final, done | ok, conv_it

    it, r, lt, d_final, done, conv_it = jax.lax.while_loop(
        cond, body, (jnp.int32(0), r0, lt0, d0, done0, conv0))
    d_last = (lt.reshape(B, -1) < 0).astype(jnp.int8)
    bits = jnp.where(done[:, None], d_final, d_last)
    if return_stats:
        return bits, {"iterations": conv_it, "converged": done}
    return bits


def _decode_bp_graph(ck_cols: jnp.ndarray, var_edge: jnp.ndarray,
                     llr: jnp.ndarray, max_iter: int, algo: str,
                     minsum_scale: float, return_stats: bool,
                     minsum_offset: float = 0.625):
    """Flooding BP on an explicit (ck_cols, var_edge) gather-map graph."""
    B, n = llr.shape
    m, dc = ck_cols.shape
    dv = var_edge.shape[1]
    valid = (ck_cols < n)                      # (m, dc)
    Lc = llr.astype(jnp.float32)

    def gather_var(x_bn, pad_val):
        """(B, n) -> (B, m, dc) values at each check's variables."""
        xp = jnp.pad(x_bn, ((0, 0), (0, 1)), constant_values=pad_val)
        return xp[:, ck_cols]

    def sum_r_per_var(r):
        """r (B, m, dc) -> per-variable sum of incoming check messages."""
        rf = jnp.pad(r.reshape(B, m * dc), ((0, 0), (0, 1)))
        return jnp.sum(rf[:, var_edge], axis=-1)  # (B, n)

    def syndrome_ok(d):
        """d (B, n) hard bits -> (B,) all-checks-satisfied flag."""
        db = gather_var(d.astype(jnp.float32), 0.0)
        par = jnp.mod(jnp.sum(jnp.where(valid, db, 0.0), axis=-1), 2.0)
        return jnp.all(par == 0.0, axis=-1)

    def bp_iter(r):
        """One flooding iteration. r (B, m, dc) check->var messages."""
        L_tot = Lc + sum_r_per_var(r)                 # (B, n)
        q = gather_var(L_tot, 0.0) - r                # var->check, (B, m, dc)
        q = jnp.clip(q, -MSG_CLIP, MSG_CLIP)
        if algo in ("minsum", "offset-minsum"):
            sgn = jnp.where(valid, jnp.sign(q), 1.0)
            sgn = jnp.where(sgn == 0, 1.0, sgn)
            sprod = _leave_one_out_prod(sgn)
            mag = jnp.where(valid, jnp.abs(q), jnp.inf)
            # leave-one-out min via (min, second-min)
            m1 = jnp.min(mag, axis=-1, keepdims=True)
            is_min = mag == m1
            # mask exactly one occurrence of the minimum
            first_min = jnp.cumsum(is_min.astype(jnp.int32), axis=-1) == 1
            first_min = jnp.logical_and(first_min, is_min)
            mag2 = jnp.where(first_min, jnp.inf, mag)
            m2 = jnp.min(mag2, axis=-1, keepdims=True)
            loo_min = jnp.where(first_min, m2, m1)
            if algo == "offset-minsum":
                r_new = sprod * jnp.maximum(
                    jnp.minimum(loo_min, MSG_CLIP) - minsum_offset, 0.0)
            else:
                r_new = minsum_scale * sprod * jnp.minimum(loo_min, MSG_CLIP)
            r_new = jnp.where(valid, r_new, 0.0)
            return r_new, L_tot
        t = jnp.where(valid, jnp.tanh(0.5 * q), 1.0)
        prod = _leave_one_out_prod(t)
        prod = jnp.clip(prod, -0.9999999, 0.9999999)
        r_new = 2.0 * jnp.arctanh(prod)
        r_new = jnp.where(valid, r_new, 0.0)
        return r_new, L_tot

    r0 = jnp.zeros((B, m, dc), dtype=jnp.float32)
    d0 = (Lc < 0).astype(jnp.int8)
    done0 = syndrome_ok(d0)
    conv0 = jnp.where(done0, 0, max_iter).astype(jnp.int32)

    def cond(state):
        it, _, _, done, _ = state
        return jnp.logical_and(it < max_iter, jnp.logical_not(jnp.all(done)))

    def body(state):
        it, r, d_final, done, conv_it = state
        r_new, _ = bp_iter(r)
        L_post = Lc + sum_r_per_var(r_new)
        d_new = (L_post < 0).astype(jnp.int8)
        ok = syndrome_ok(d_new)
        just = ~done & ok
        # freeze the decision of codewords that just converged
        d_final = jnp.where(just[:, None], d_new, d_final)
        conv_it = jnp.where(just, it + 1, conv_it)
        return it + 1, r_new, d_final, done | ok, conv_it

    it, r, d_final, done, conv_it = jax.lax.while_loop(
        cond, body, (jnp.int32(0), r0, d0, done0, conv0))
    # codewords that never converged keep their final-iteration posterior
    L_last = Lc + sum_r_per_var(r)
    d_last = (L_last < 0).astype(jnp.int8)
    bits = jnp.where(done[:, None], d_final, d_last)
    if return_stats:
        return bits, {"iterations": conv_it, "converged": done}
    return bits
