"""Decompose the fused CDL SNR-point dispatch (the bench e2e program).

Times make_fused_cdl_snr_step at the bench operating point (Eb/N0 12 dB,
cal 2 + dec 6 rounds x 128 blocks) for LDPC config variants:

  maxit0    max_iter=0, no compaction — detection + calibrator fit + the
            decode path's iteration-INDEPENDENT cost (pad/transpose,
            iteration-0 decide/freeze, natural-order permutations, psum)
  nopass1   max_iter=100, compaction off — adds the full BP iterations
  default   max_iter=100, pass1_iters=16 — adds the two-pass compaction
            (sort + gathers + pass-1 budget) and removes straggler-tile
            waste; the production/bench configuration

Derived quantities printed at the end:
  decode fixed cost     = t(maxit0) - t(detect+fit estimate)
  in-context iter cost  = (t(nopass1) - t(maxit0)) / executed tile-iters
  compaction delta      = t(default) - t(nopass1)

Each variant is its own compiled program; timings are best-of-N because the
axon relay adds heavy-tailed latency (docs/ENVIRONMENT.md).
"""
from __future__ import annotations

import dataclasses
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
    blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cal_r, dec_r, iters = 2, 6, 4

    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.parallel.mesh import trials_mesh
    from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_cdl_snr_step
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    base = mimo_4x8_cdl()
    mesh = trials_mesh()
    D = base.data_symbols_per_block
    R = cal_r + dec_r
    root = jax.random.PRNGKey(0)

    def keys_for(i):
        ids = jnp.arange(i * R * blocks, (i + 1) * R * blocks,
                         dtype=jnp.uint32)
        keys = block_keys(root, 1, ids).reshape(R, blocks, -1)
        return keys[:cal_r], keys[cal_r:]

    variants = {
        "nodec": base,      # decode stubbed out entirely (see below)
        "maxit0": dataclasses.replace(
            base, ldpc=dataclasses.replace(base.ldpc, max_iter=0,
                                           pass1_iters=None)),
        "nopass1": dataclasses.replace(
            base, ldpc=dataclasses.replace(base.ldpc, pass1_iters=None)),
        "default": base,
    }
    from esn_ofdm_mimo_tpu.parallel import montecarlo as mc
    from esn_ofdm_mimo_tpu.pipelines.cdl import CDL_DETECTORS
    real_counters = mc.cdl_decode_counters

    def stub_counters(cfg, Lcs, info_bits):
        z = {d: jnp.sum(Lcs[d][:1, :1]).astype(jnp.int32) * 0
             for d in CDL_DETECTORS}
        return {"info_errors": z, "frame_errors": dict(z),
                "iter_sum": dict(z), "unconv": dict(z)}

    ebno = jnp.float32(12.0)
    times, decs = {}, {}
    for name, cfg in variants.items():
        mc.cdl_decode_counters = (stub_counters if name == "nodec"
                                  else real_counters)
        step = make_fused_cdl_snr_step(cfg, mesh)
        ck, dk = keys_for(0)
        t0 = time.perf_counter()
        out = jax.device_get(step(ebno, ck, dk))
        print(f"[{name}] warm in {time.perf_counter()-t0:.1f} s", flush=True)
        best = float("inf")
        for i in range(iters):
            ck, dk = keys_for(i + 1)
            t0 = time.perf_counter()
            out = jax.device_get(step(ebno, ck, dk))
            best = min(best, time.perf_counter() - t0)
        times[name] = best
        decs[name] = out[2]
        it_sum = sum(int(v) for v in out[2].ldpc_iter_sum.values())
        unconv = {d: int(v) for d, v in out[2].ldpc_unconverged.items()}
        print(f"[{name}] best {best*1e3:8.1f} ms  iter_sum={it_sum} "
              f"unconv={unconv}", flush=True)

    ncw = int(decs["default"].ldpc_codewords)        # per detector total
    tiles = -(-ncw // 128) * 2
    # executed tile-iters in nopass1: unconverged tiles run the full 100;
    # estimate from the per-detector unconverged fractions (esn=1.0 -> all
    # tiles full; mmse tiles hold >=1 straggler with high probability at
    # fr~0.08, so ~all tiles run long too — print both bounds)
    d_unc = {d: int(v) for d, v in decs["nopass1"].ldpc_unconverged.items()}
    full = times["nopass1"] - times["maxit0"]
    print(f"\ntiles/detector={tiles//2}  t_maxit0={times['maxit0']*1e3:.0f} "
          f"ms  iter-part(nopass1)={full*1e3:.0f} ms  "
          f"compaction_delta={(times['default']-times['nopass1'])*1e3:+.0f} "
          f"ms")
    print(f"upper-bound in-context cost (all {tiles} tiles full budget): "
          f"{full/(tiles*100)*1e6:.3f} us/tile-iter")


if __name__ == "__main__":
    main()
