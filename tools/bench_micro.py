"""Micro-benchmarks for the flagship hot phases, each isolated.

profile_flagship.py attributes wall time by ablating whole pipeline variants;
this tool goes one level down: dispatch/scan floor, tap draw, random bits,
the Pallas predict kernel (with readout / feedback / noise / input-projection
ablations), and the equalizer apply — on the exact flagship shapes
(B=128 blocks, D=74 symbols, n_res=300, T=138). Every variant is scanned
ROUNDS x inside one dispatch and reported as best-of-iters per round
(docs/ENVIRONMENT.md: the axon relay adds ~35 ms/dispatch of jitter).

Run: python tools/bench_micro.py [group ...]   groups: base bits pred eq
"""
from __future__ import annotations

import functools
import os
import sys
import time

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and os.environ.get("_BENCH_REEXEC") != "1"):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _BENCH_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROUNDS = 8
ITERS = 3


def timed(name, fn, *args):
    @jax.jit
    def g(*a):
        def body(acc, _):
            return acc + fn(*a), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ROUNDS)
        return out

    jax.device_get(g(*args))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.device_get(g(*args))
        best = min(best, (time.perf_counter() - t0) / ROUNDS)
    print(f"{name:28s} {best*1e3:8.2f} ms/round", flush=True)
    return best


# ---------------------------------------------------------------- shapes
NB, D = 128, 74            # blocks, data symbols per block
N, CP, DELAY = 128, 7, 3
N_TX, N_RX, M = 4, 8, 4
N_RES = 300
T = N + CP + DELAY
B = NB * D
N_IN, N_OUT = 2 * N_RX, 2 * N_TX


def main():
    groups = set(sys.argv[1:]) or {"base", "bits", "pred", "eq"}
    from esn_ofdm_mimo_tpu.utils.rng import block_keys, fold_key
    from esn_ofdm_mimo_tpu.pipelines import common as c
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    cfg = mimo_4x8_cdl()

    root = jax.random.PRNGKey(0)
    bkeys = block_keys(root, 0, jnp.arange(NB, dtype=jnp.uint32))
    print(f"B={NB} blocks x D={D} syms, T={T}, n_res={N_RES}, "
          f"rounds={ROUNDS} iters={ITERS} dev={jax.devices()[0]}")

    if "base" in groups:
        def v_empty(bk):
            return jnp.sum(c._vfold(bk, 1)[..., 0].astype(jnp.float32))
        timed("empty (fold only)", v_empty, bkeys)

        def v_taps(bk):
            return jnp.sum(jnp.abs(c._draw_taps(cfg, c._vfold(bk, 1))))
        timed("taps draw", v_taps, bkeys)

        def v_tapsfr(bk):
            from esn_ofdm_mimo_tpu.ops import taps_to_freq_response
            t = c._draw_taps(cfg, c._vfold(bk, 1))
            return jnp.sum(jnp.abs(taps_to_freq_response(t, N)))
        timed("taps + freq response", v_tapsfr, bkeys)

    if "bits" in groups:
        K = N * M // 2   # info bits per codeword (rate 1/2)
        shape = (D, N_TX, K)

        def v_bern(bk):
            return jnp.sum(c._vbits(c._vfold(bk, 8), shape)
                           .astype(jnp.float32))
        timed(f"bits bernoulli {shape}", v_bern, bkeys)

        def v_unpack(bk):
            ks = c._vfold(bk, 8)
            n = int(np.prod(shape))
            nw = -(-n // 32)

            def one(k):
                w = jax.random.bits(k, (nw,), jnp.uint32)
                b = (w[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
                return b.reshape(-1)[:n].reshape(shape).astype(jnp.int8)
            return jnp.sum(jax.vmap(one)(ks).astype(jnp.float32))
        timed(f"bits unpack32 {shape}", v_unpack, bkeys)

        def v_awgn(bk):
            y = c._vawgn(c._vfold(bk, 9), (D, N_RX, N + CP), 1e-5, N + CP)
            return jnp.sum(jnp.abs(y))
        timed("awgn draw (D,8,135)", v_awgn, bkeys)

    if "pred" in groups:
        run_pred_variants()

    if "eq" in groups:
        run_eq_variants()

    if "eqw" in groups:
        run_eqw_variants()


# ------------------------------------------------------- predict variants

BC = 128
SUB = 8


def _pad(x, m):
    return -(-x // m) * m


def _u01(shape):
    bits = pltpu.prng_random_bits(shape)
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _mk_kernel(readout: bool, wfb: bool, noise: bool, hoist_win: bool,
               n_p, n_in_p, n_out_p, merged: bool = False, tanh: bool = True,
               bigdot: bool = True, unroll: int = 1):
    def kernel(*refs):
        if hoist_win:
            (u_ref, pre_ref, wt_ref, wfb_ref, wofs_ref, wofu_ref, seed_ref,
             noise_ref, out_ref) = refs
        elif merged:
            (u_ref, wt_ref, wio_ref, wofs_ref, wofu_ref, seed_ref,
             noise_ref, out_ref) = refs
        else:
            (u_ref, wt_ref, win_ref, wfb_ref, wofs_ref, wofu_ref, seed_ref,
             noise_ref, out_ref) = refs
        if noise:
            pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))

        def step(t, so):
            s, o = so
            u_t = u_ref[t]
            if bigdot:
                pre = jnp.dot(wt_ref[:].astype(jnp.bfloat16),
                              s.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
            else:
                pre = s
            if merged:
                z = jnp.concatenate([u_t, o], axis=0)
                pre = pre + jnp.dot(wio_ref[:], z,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            elif hoist_win:
                pre = pre + pre_ref[t]
            else:
                pre = pre + jnp.dot(win_ref[:], u_t,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            if wfb and not merged:
                pre = pre + jnp.dot(wfb_ref[:], o,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            s_new = jnp.tanh(pre) if tanh else pre * 0.5
            if noise:
                s_new = s_new + noise_ref[0, 0] * (_u01(s_new.shape) - 0.5)
            if readout:
                o_new = (jnp.sum(wofs_ref[:] * s_new[:, None, :], axis=0)
                         + jnp.sum(wofu_ref[:] * u_t[:, None, :], axis=0))
            else:
                o_new = s_new[:n_out_p]
            out_ref[t] = o_new
            return s_new, o_new

        s0 = jnp.zeros((n_p, BC), jnp.float32)
        o0 = jnp.zeros((n_out_p, BC), jnp.float32)
        if unroll == 1:
            jax.lax.fori_loop(0, T, step, (s0, o0))
        else:
            def multi(i, so):
                for k in range(unroll):
                    so = step(i * unroll + k, so)
                return so
            so = jax.lax.fori_loop(0, T // unroll, multi, (s0, o0))
            for k in range(T - (T // unroll) * unroll):
                so = step((T // unroll) * unroll + k, so)
    return kernel


def run_pred_variants():
    n_p = _pad(N_RES, SUB)
    n_in_p = _pad(N_IN, SUB)
    n_out_p = _pad(N_OUT, SUB)
    B_p = _pad(B, BC)
    n_prog = B_p // BC
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (T, n_in_p, B_p), jnp.float32)
    W = (jax.random.normal(ks[1], (n_p, n_p), jnp.float32) * 0.05
         ).astype(jnp.bfloat16)
    Win = jax.random.normal(ks[2], (n_p, n_in_p), jnp.float32) * 0.01
    Wfb = jax.random.normal(ks[3], (n_p, n_out_p), jnp.float32) * 1e-6
    wofs = jax.random.normal(ks[4], (n_p, n_out_p, B_p), jnp.float32)
    wofu = jax.random.normal(ks[5], (n_in_p, n_out_p, B_p), jnp.float32)
    seed = jnp.zeros((1, 1), jnp.int32)
    namp = jnp.full((1, 1), 1e-3, jnp.float32)

    vmem = {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}

    def call(readout=True, wfb=True, noise=True, hoist_win=False,
             merged=False, tanh=True, bigdot=True, unroll=1):
        kern = _mk_kernel(readout, wfb, noise, hoist_win, n_p, n_in_p,
                          n_out_p, merged=merged, tanh=tanh, bigdot=bigdot,
                          unroll=unroll)
        in_specs = [pl.BlockSpec((T, n_in_p, BC), lambda i: (0, 0, i))]
        if hoist_win:
            in_specs.append(pl.BlockSpec((T, n_p, BC), lambda i: (0, 0, i)))
        in_specs += [
            pl.BlockSpec((n_p, n_p), lambda i: (0, 0)),
        ]
        if merged:
            in_specs.append(
                pl.BlockSpec((n_p, n_in_p + n_out_p), lambda i: (0, 0)))
        elif not hoist_win:
            in_specs.insert(2, pl.BlockSpec((n_p, n_in_p), lambda i: (0, 0)))
        if not merged:
            in_specs.append(pl.BlockSpec((n_p, n_out_p), lambda i: (0, 0)))
        in_specs += [
            pl.BlockSpec((n_p, n_out_p, BC), lambda i: (0, 0, i)),
            pl.BlockSpec((n_in_p, n_out_p, BC), lambda i: (0, 0, i)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        # order args to match kernel ref order
        def f():
            pc = pl.pallas_call(
                kern, **vmem, grid=(n_prog,), in_specs=in_specs,
                out_specs=pl.BlockSpec((T, n_out_p, BC), lambda i: (0, 0, i)),
                out_shape=jax.ShapeDtypeStruct((T, n_out_p, B_p), jnp.float32))
            if hoist_win:
                preu = jnp.einsum("pf,tfb->tpb", Win, u)
                out = pc(u, preu, W, Wfb, wofs, wofu, seed, namp)
            elif merged:
                Wio = jnp.concatenate([Win, Wfb], axis=1)
                out = pc(u, W, Wio, wofs, wofu, seed, namp)
            else:
                out = pc(u, W, Win, Wfb, wofs, wofu, seed, namp)
            return jnp.sum(out)
        return f

    timed("pred merged io-dot", call(merged=True))
    timed("pred merged unroll2", call(merged=True, unroll=2))
    timed("pred merged unroll4", call(merged=True, unroll=4))
    timed("pred merged unroll8", call(merged=True, unroll=8))
    timed("pred floor unroll4", call(readout=False, wfb=False, noise=False,
                                     tanh=False, bigdot=False, unroll=4))
    timed("pred cur unroll4", call(unroll=4))


# ------------------------------------------------------- equalizer variants

def run_eq_variants():
    rng = np.random.default_rng(2)
    We = jnp.asarray(rng.standard_normal((NB, N, 2 * N_TX, 2 * N_RX)),
                     dtype=jnp.float32)
    Yr = jnp.asarray(rng.standard_normal((NB, D, N_RX, N)), jnp.float32)
    Yi = jnp.asarray(rng.standard_normal((NB, D, N_RX, N)), jnp.float32)

    def v_cur(We, Yr, Yi):
        from esn_ofdm_mimo_tpu.ops.equalize import apply_equalizer
        return jnp.sum(jnp.abs(apply_equalizer(We, Yr + 1j * Yi, 1.0)))
    timed("eq apply (vpu reduce)", v_cur, We, Yr, Yi)

    def v_dot(We, Yr, Yi):
        Yk = jnp.moveaxis(Yr + 1j * Yi, -2, -1)
        ye = jnp.concatenate([jnp.real(Yk), jnp.imag(Yk)], axis=-1)
        xe = jnp.einsum("bnij,bdnj->bdni", We, ye)
        x = xe[..., :N_TX] + 1j * xe[..., N_TX:]
        return jnp.sum(jnp.abs(x))
    timed("eq apply (einsum)", v_dot, We, Yr, Yi)

    def v_dot2(We, Yr, Yi):
        # contract over (n_rx) with D folded into the M dim: per (b,n) a
        # (D, 2nr) @ (2nr, 2nt) dot -> dot_general batch (b,n), M=D, K=16, N=8
        Yk = jnp.moveaxis(Yr + 1j * Yi, -2, -1)         # (B, D, N, n_rx)
        ye = jnp.concatenate([jnp.real(Yk), jnp.imag(Yk)], axis=-1)
        ye2 = jnp.moveaxis(ye, 1, 2)                    # (B, N, D, 2nr)
        xe = jnp.einsum("bndj,bnij->bndi", ye2, We)     # (B, N, D, 2nt)
        x = xe[..., :N_TX] + 1j * xe[..., N_TX:]
        return jnp.sum(jnp.abs(x))
    timed("eq apply (bn-batched dot)", v_dot2, We, Yr, Yi)


def run_eqw_variants():
    """equalizer_weights decomposition: Gram build vs Cholesky solve."""
    from esn_ofdm_mimo_tpu.ops.equalize import _embed_H, equalizer_weights
    from esn_ofdm_mimo_tpu.ops.linalg_mxu import chol_solve_small
    rng = np.random.default_rng(3)
    Hr = jnp.asarray(rng.standard_normal((NB, N, N_RX, N_TX)), jnp.float32)
    Hi = jnp.asarray(rng.standard_normal((NB, N, N_RX, N_TX)), jnp.float32)
    reg = jnp.float32(0.05)

    def v_full(Hr, Hi, reg):
        return jnp.sum(equalizer_weights(Hr + 1j * Hi, reg))
    timed("eqw full (gram+chol)", v_full, Hr, Hi, reg)

    def v_gram(Hr, Hi, reg):
        He = _embed_H(Hr + 1j * Hi)
        G = jnp.einsum("...ij,...ik->...jk", He, He)
        G = G + reg * jnp.eye(2 * N_TX, dtype=G.dtype)
        return jnp.sum(G) + jnp.sum(He)
    timed("eqw gram only", v_gram, Hr, Hi, reg)

    def v_3x(Hr, Hi, reg):
        # the cal round factors THREE equalizer sets only in the NBF
        # pipelines; CDL cal uses one (mmse). This bounds the NBF cost.
        s = jnp.float32(0.0)
        for r in (1e-12, 1e-12, 0.05):
            s = s + jnp.sum(equalizer_weights(Hr + 1j * Hi, jnp.float32(r)))
        return s
    timed("eqw x3 (zf+zf+mmse)", v_3x, Hr, Hi, reg)


if __name__ == "__main__":
    main()
