"""Bisect the fused-context Pallas BP slowdown (round-3 open finding).

Round 3 measured the BP kernel at ~1.0 us/tile-iteration standalone but
~2.6-3.6 us/tile-iteration inside the fused CDL SNR-point program at
identical shapes (PARITY.md decode-phase study #3). This tool times the SAME
decode workload — bench-scale stacked CDL LLRs, 2 detectors x dec_rounds x
128 blocks x 74 symbols x 4 streams codewords of n=512 — in three contexts:

  flat     decode-only jitted dispatch on a device-resident LLR array
  twodisp  detection dispatch (scanned rounds, stacked LLR outputs stay on
           device) -> decode-only dispatch; only the decode dispatch varies
  fused    detection scan + stacked decode in ONE jitted shard_map program
           (the round-3 dec_local structure, parallel/montecarlo.py)

All contexts decode through ONE compiled kernel with a TRACED iteration cap
(iter_cap), so the marginal per-iteration cost is (t_hi - t_lo)/(hi - lo)
from the SAME program — no cross-compile confounds, and every
iteration-independent cost (detection, transfers, relay latency, transpose,
padding) cancels in the delta. LLRs are taken at 0 dB where no codeword
converges (verified from the returned telemetry), so executed tile-iters =
tiles x cap exactly. Timings are best-of-N interleaved across caps because
the axon relay adds heavy-tailed external latency (docs/ENVIRONMENT.md).

Usage:
    python tools/bench_bp_context.py [--contexts flat,twodisp,fused]
        [--dec-rounds 6] [--blocks 128] [--lo 25] [--hi 100] [--iters 5]
"""
from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contexts", default="flat,twodisp,fused")
    ap.add_argument("--dec-rounds", type=int, default=6)
    ap.add_argument("--blocks", type=int, default=128)
    ap.add_argument("--lo", type=int, default=25)
    ap.add_argument("--hi", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ebno", type=float, default=0.0,
                    help="0 dB: no codeword converges -> executed "
                         "tile-iters == tiles * cap")
    args = ap.parse_args()

    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.ldpc import make_code
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas as dp
    from esn_ofdm_mimo_tpu.parallel.mesh import TRIALS_AXIS, trials_mesh
    from esn_ofdm_mimo_tpu.pipelines.cdl import (CDL_DETECTORS,
                                                 run_cdl_detect_llrs)
    from esn_ofdm_mimo_tpu.utils.rng import block_keys
    from jax.sharding import PartitionSpec as P

    cfg = mimo_4x8_cdl()
    code = make_code(cfg.ldpc, cfg.ofdm.n_subcarriers
                     * cfg.ofdm.bits_per_symbol)
    mesh = trials_mesh()
    n_dev = mesh.devices.size
    G = n_dev * args.blocks
    R = args.dec_rounds
    D = cfg.data_symbols_per_block
    n_tx = cfg.channel.n_tx
    m = cfg.ofdm.bits_per_symbol
    ncw = R * G * D * n_tx                      # per detector
    tiles = -(-ncw // dp.W) * len(CDL_DETECTORS)
    print(f"[cfg] {ncw} cw/detector, {tiles} total tiles, "
          f"caps {args.lo}/{args.hi}", flush=True)

    root = jax.random.PRNGKey(7)
    ids = jnp.arange(R * G, dtype=jnp.uint32)
    dkeys = block_keys(root, 0, ids).reshape(R, G, -1)
    # identity-ish calibrators: llr_cal = clip(-(a*llr+b)) with a=-1 keeps
    # the LLR sign convention (fitted a is negative, BASELINE.md §2)
    calib = {d: (-jnp.ones((m,), jnp.float32), jnp.zeros((m,), jnp.float32))
             for d in CDL_DETECTORS}
    ebno = jnp.float32(args.ebno)

    def decode_counters(Lc, cap):
        """Sum of iterations/converged/bits — tiny outputs, keeps transfers
        out of the timings."""
        bits, st = dp.ldpc_decode_bp_pallas(
            code, Lc, int(cfg.ldpc.max_iter), "sumprod", 0.75,
            return_stats=True, iter_cap=cap)
        return (jnp.sum(st["iterations"]),
                jnp.sum(st["converged"].astype(jnp.int32)),
                jnp.sum(bits.astype(jnp.int32)))

    # --- detection program (shared by twodisp + fused LLR synthesis) ------
    def detect_local(ebno_db, bkeys2d):
        def body(_, bkeys):
            errs, tot, Lcs, u = run_cdl_detect_llrs(cfg, ebno_db, bkeys,
                                                    calib)
            return None, Lcs
        _, Lcs_st = jax.lax.scan(body, None, bkeys2d)
        return {d: v.reshape(-1, v.shape[-1]) for d, v in Lcs_st.items()}

    detect_sm = jax.jit(jax.shard_map(
        detect_local, mesh=mesh, in_specs=(P(), P(None, TRIALS_AXIS)),
        out_specs=P(TRIALS_AXIS), check_vma=False))

    def timed(fn, fn_args, label):
        """Best-of-N at each cap, interleaved; returns dict cap -> best s."""
        best = {args.lo: float("inf"), args.hi: float("inf")}
        out = None
        for it in range(args.iters):
            for cap in (args.lo, args.hi):
                t0 = time.perf_counter()
                out = jax.device_get(fn(*fn_args, jnp.int32(cap)))
                dt = time.perf_counter() - t0
                best[cap] = min(best[cap], dt)
        per_it = (best[args.hi] - best[args.lo]) / (args.hi - args.lo)
        print(f"[{label}] t({args.lo})={best[args.lo]*1e3:8.1f} ms  "
              f"t({args.hi})={best[args.hi]*1e3:8.1f} ms  "
              f"marginal {per_it/tiles*1e6:6.3f} us/tile-iter  "
              f"(iter_sum={int(out[0])}, conv={int(out[1])})", flush=True)
        return best

    contexts = args.contexts.split(",")

    # device-resident LLRs for the flat context (synthesized once)
    print("[setup] detection dispatch for LLRs...", flush=True)
    t0 = time.perf_counter()
    Lcs = detect_sm(ebno, dkeys)
    Lcs = {d: v for d, v in Lcs.items()}
    _ = jax.device_get(jax.tree.map(lambda x: x[0, 0], Lcs))
    print(f"[setup] detection done in {time.perf_counter()-t0:.1f} s",
          flush=True)

    if "flat" in contexts:
        @jax.jit
        def flat(L_esn, L_mmse, cap):
            a = decode_counters(L_esn, cap)
            b = decode_counters(L_mmse, cap)
            return jax.tree.map(lambda x, y: x + y, a, b)

        out = jax.device_get(flat(Lcs["esn"], Lcs["mmse"], jnp.int32(args.hi)))
        nconv = int(out[1])
        print(f"[flat] warm; converged={nconv}/{2*ncw}", flush=True)
        timed(flat, (Lcs["esn"], Lcs["mmse"]), "flat")

    if "twodisp" in contexts:
        @jax.jit
        def dec_only(L_esn, L_mmse, cap):
            a = decode_counters(L_esn, cap)
            b = decode_counters(L_mmse, cap)
            return jax.tree.map(lambda x, y: x + y, a, b)

        def two(ebno_db, keys, cap):
            L = detect_sm(ebno_db, keys)
            return dec_only(L["esn"], L["mmse"], cap)

        jax.device_get(two(ebno, dkeys, jnp.int32(args.hi)))
        timed(two, (ebno, dkeys), "twodisp")

    if "fused" in contexts:
        def fused_local(ebno_db, bkeys2d, cap):
            def body(_, bkeys):
                errs, tot, Lcs, u = run_cdl_detect_llrs(cfg, ebno_db, bkeys,
                                                        calib)
                return None, Lcs
            _, Lcs_st = jax.lax.scan(body, None, bkeys2d)
            a = decode_counters(
                Lcs_st["esn"].reshape(-1, Lcs_st["esn"].shape[-1]), cap)
            b = decode_counters(
                Lcs_st["mmse"].reshape(-1, Lcs_st["mmse"].shape[-1]), cap)
            out = jax.tree.map(lambda x, y: x + y, a, b)
            return jax.tree.map(
                lambda x: jax.lax.psum(x, TRIALS_AXIS), out)

        fused = jax.jit(jax.shard_map(
            fused_local, mesh=mesh, in_specs=(P(), P(None, TRIALS_AXIS), P()),
            out_specs=P(), check_vma=False))
        print("[fused] compiling (relay compiles are slow cold)...",
              flush=True)
        t0 = time.perf_counter()
        jax.device_get(fused(ebno, dkeys, jnp.int32(args.hi)))
        print(f"[fused] warm in {time.perf_counter()-t0:.1f} s", flush=True)
        timed(fused, (ebno, dkeys), "fused")


if __name__ == "__main__":
    main()
