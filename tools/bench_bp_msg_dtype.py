"""INTERLEAVED f32-vs-bf16 BP message-storage A/B (one process, one window).

The axon relay's external latency drifts on minute scales, so per-variant
numbers from different processes disagree (f32 measured 2.35 / 0.65 / 1.7
us/tile-iter across three sessions while bf16 pinned at ~1.6). This tool
compiles BOTH kernels (msg_dtype is a per-call static arg) and times the
four (variant, cap) cells round-robin in one window — relay drift hits all
cells equally, so the marginal-cost RATIO is trustworthy.
"""
from __future__ import annotations

import json
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

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 227328
    lo, hi, rounds = 25, 100, 6

    from esn_ofdm_mimo_tpu.ldpc import make_qc_ldpc
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas as dp

    code = make_qc_ldpc(512)
    rng = np.random.default_rng(0)
    llr = jnp.asarray(
        rng.normal(scale=3.0, size=(B, code.n)).astype(np.float32))
    tiles = -(-B // dp.W)

    fns = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fns[name] = jax.jit(lambda x, cap, dt=dt: jax.tree.map(
            jnp.sum, dp.ldpc_decode_bp_pallas_counts(
                code, x, jnp.zeros((x.shape[0], code.k), jnp.int8),
                hi, "sumprod", 0.75, iter_cap=cap, msg_dtype=dt)[1]
            ["iterations"]))
        out = jax.device_get(fns[name](llr, jnp.int32(hi)))
        print(f"[{name}] warm, iter_sum={int(out)}", flush=True)

    best = {(v, c): float("inf") for v in fns for c in (lo, hi)}
    for r in range(rounds):
        for v in fns:
            for c in (lo, hi):
                t0 = time.perf_counter()
                jax.device_get(fns[v](llr, jnp.int32(c)))
                best[(v, c)] = min(best[(v, c)],
                                   time.perf_counter() - t0)
    res = {}
    for v in fns:
        per = (best[(v, hi)] - best[(v, lo)]) / (hi - lo) / tiles
        res[v] = {"us_per_tile_iter": round(per * 1e6, 3),
                  "t_lo_ms": round(best[(v, lo)] * 1e3, 1),
                  "t_hi_ms": round(best[(v, hi)] * 1e3, 1)}
    res["speedup_f32_over_bf16"] = round(
        res["f32"]["us_per_tile_iter"] / res["bf16"]["us_per_tile_iter"], 3)
    print(json.dumps({"B": B, "tiles": tiles, **res}))


if __name__ == "__main__":
    main()
