"""TPU A/B + perf for the LDPC decoders: XLA gather decoder vs fused
Pallas QC kernel, at flagship-like decode batches.

Run: python tools/bench_ldpc.py [n_codewords] [ebno_db] [max_iter]
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
    ebno = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    from esn_ofdm_mimo_tpu.ldpc import (
        make_qc_ldpc, make_regular_ldpc, ldpc_encode)
    from esn_ofdm_mimo_tpu.ldpc.decode import _decode_bp_graph
    from esn_ofdm_mimo_tpu.ldpc.decode_pallas import ldpc_decode_bp_pallas

    qc = make_qc_ldpc(512)
    g = make_regular_ldpc(512)
    rng = np.random.default_rng(0)

    def llrs_for(code):
        u = rng.integers(0, 2, size=(B, code.k))
        cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
        rate = code.k / code.n
        sigma = np.sqrt(1.0 / (2 * rate * 10 ** (ebno / 10)))
        y = 1.0 - 2.0 * cw + sigma * rng.normal(size=cw.shape)
        return u, jnp.asarray((2.0 * y / sigma**2).astype(np.float32))

    u_qc, llr_qc = llrs_for(qc)
    u_g, llr_g = llrs_for(g)

    @jax.jit
    def dec_xla_gallager(llr):
        return _decode_bp_graph(jnp.asarray(g.ck_cols),
                                jnp.asarray(g.var_edge), llr,
                                max_iter, "sumprod", 0.75, False)

    @jax.jit
    def dec_xla_qc(llr):
        llr_nat = llr[:, jnp.asarray(qc.qc.inv_perm)]
        bits = _decode_bp_graph(jnp.asarray(qc.qc.ck_cols_nat),
                                jnp.asarray(qc.qc.var_edge_nat), llr_nat,
                                max_iter, "sumprod", 0.75, False)
        return bits[:, jnp.asarray(qc.qc.perm)]

    @jax.jit
    def dec_pallas(llr):
        return ldpc_decode_bp_pallas(qc, llr, max_iter, "sumprod", 0.75)

    print(f"B={B} n=512 EbNo={ebno} max_iter={max_iter} "
          f"device={jax.devices()[0]}")
    results = {}
    for name, fn, llr, u, code in (
            ("xla_gallager", dec_xla_gallager, llr_g, u_g, g),
            ("xla_qc", dec_xla_qc, llr_qc, u_qc, qc),
            ("pallas_qc", dec_pallas, llr_qc, u_qc, qc)):
        bits = jax.device_get(fn(llr))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(3):
            bits = jax.device_get(fn(llr))
        dt = (time.perf_counter() - t0) / 3
        ber = float((bits[:, code.m:] != u).mean())
        results[name] = bits
        print(f"{name:14s} {dt*1e3:9.1f} ms  ({B/dt:9.0f} cw/s)  "
              f"info-BER {ber:.5f}", flush=True)

    agree = (results["xla_qc"] == results["pallas_qc"]).mean()
    print(f"pallas vs xla_qc bit agreement: {agree:.6f}")


if __name__ == "__main__":
    main()
