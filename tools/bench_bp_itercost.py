"""Per-iteration cost of the fused Pallas BP kernel (transfer-cancelled).

Standalone decode wall time through the axon relay is transfer-dominated
(docs/ENVIRONMENT.md), so a single timing says nothing about the kernel.
This tool times the SAME batch at two budget-bound iteration counts and
reports (t_hi - t_lo) / (hi - lo) — the marginal per-iteration cost, with
the transfer and fixed dispatch costs cancelled. LLRs are drawn at 1.5 dB
where no 128-lane tile ever fully converges, so the executed trip count
equals the budget exactly.

Run one process per kernel variant:
    python tools/bench_bp_itercost.py
    LDPC_PALLAS_ATANH=log1p python tools/bench_bp_itercost.py
    LDPC_PALLAS_SYN_EVERY=4 python tools/bench_bp_itercost.py   # diagnostic
"""
from __future__ import annotations

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from esn_ofdm_mimo_tpu.ldpc import make_qc_ldpc, ldpc_encode
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas as dp

    code = make_qc_ldpc(512)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (1.5 / 10)))
    y = 1.0 - 2.0 * cw + sigma * rng.normal(size=cw.shape)
    llr = jnp.asarray((2.0 * y / sigma ** 2).astype(np.float32))

    fns = {m: jax.jit(lambda x, mi=m: dp.ldpc_decode_bp_pallas(
        code, x, mi, "sumprod", 0.75, True)) for m in (lo, hi)}
    times = {}
    for m, fn in fns.items():
        bits, st = jax.device_get(fn(llr))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            bits, st = jax.device_get(fn(llr))
            best = min(best, time.perf_counter() - t0)
        conv = st["converged"].mean()
        times[m] = best
        print(f"max_iter {m:3d}: best {best*1e3:8.1f} ms  conv {conv:.4f}",
              flush=True)
    tiles = -(-B // dp.W)
    per_it = (times[hi] - times[lo]) / (hi - lo)
    print(f"atanh={dp._ATANH_IMPL} syn_every={dp._SYN_EVERY}  "
          f"marginal per-iteration: {per_it*1e6:8.1f} us total "
          f"({per_it/tiles*1e6:6.3f} us/tile-iter, {tiles} tiles)")


if __name__ == "__main__":
    main()
