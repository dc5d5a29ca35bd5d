"""TPU A/B of BP schedules on the fused Pallas QC kernel.

flooding@K vs layered@K/2 at flagship-like decode batches: wall time,
throughput, info-BER and mean iterations-to-convergence, across a few Eb/N0
points around the waterfall. This is the measurement backing the preset flip
LdpcConfig(schedule="layered", max_iter=K/2) (VERDICT r02 item 1a).

Run: python tools/bench_ldpc_sched.py [n_codewords] [max_iter]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    max_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from esn_ofdm_mimo_tpu.ldpc import make_qc_ldpc, ldpc_encode
    from esn_ofdm_mimo_tpu.ldpc.decode_pallas import ldpc_decode_bp_pallas

    code = make_qc_ldpc(512)
    rng = np.random.default_rng(0)

    def llrs_for(ebno):
        u = rng.integers(0, 2, size=(B, code.k))
        cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
        rate = code.k / code.n
        sigma = np.sqrt(1.0 / (2 * rate * 10 ** (ebno / 10)))
        y = 1.0 - 2.0 * cw + sigma * rng.normal(size=cw.shape)
        return u, jnp.asarray((2.0 * y / sigma**2).astype(np.float32))

    cases = (("flooding", max_iter), ("layered", max_iter // 2),
             ("layered", max_iter))
    fns = {}
    for sched, mi in cases:
        fns[(sched, mi)] = jax.jit(
            lambda llr, s=sched, m=mi: ldpc_decode_bp_pallas(
                code, llr, m, "sumprod", 0.75, True, schedule=s))

    print(f"B={B} n=512 max_iter={max_iter} device={jax.devices()[0]}",
          flush=True)
    for ebno in (1.5, 2.0, 2.5, 3.5):
        u, llr = llrs_for(ebno)
        print(f"-- EbNo {ebno} dB", flush=True)
        for (sched, mi), fn in fns.items():
            bits, st = jax.device_get(fn(llr))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                bits, st = jax.device_get(fn(llr))
                best = min(best, time.perf_counter() - t0)
            ber = float((bits[:, code.m:] != u).mean())
            conv = st["converged"]
            it_mean = float(st["iterations"][conv].mean()) if conv.any() else float("nan")
            print(f"{sched:9s}@{mi:<3d} {best*1e3:9.1f} ms ({B/best:9.0f} cw/s)"
                  f"  info-BER {ber:.5f}  conv {conv.mean():.4f}"
                  f"  mean-iter {it_mean:6.2f}", flush=True)


if __name__ == "__main__":
    main()
