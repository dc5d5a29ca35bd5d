"""Speed + BER A/B of Pallas BP kernel variants (VERDICT r03 #2).

Runs in ONE env configuration (the kernel knobs are read at import) and
prints a JSON line with:
  * marginal per-tile-iteration cost — traced-iteration-cap delta on a
    0 dB never-converging batch (fixed costs cancel; method of
    tools/bench_bp_context.py)
  * BER/FER/convergence on a FIXED AWGN BPSK workload at waterfall SNRs
    (same seed across variants -> differences are the kernel numerics)

Drive the sweep with one process per variant, e.g.:
    python tools/bench_bp_kernel_variants.py                      # base
    LDPC_PALLAS_ATANH=log2 python tools/bench_bp_kernel_variants.py
    LDPC_PALLAS_MSG_DTYPE=bf16 python tools/bench_bp_kernel_variants.py
    LDPC_PALLAS_MSG_DTYPE=bf16 LDPC_PALLAS_W=256 python tools/...
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
    B = int(os.environ.get("BP_AB_B", "16384"))
    lo, hi, iters = 25, 100, 5

    from esn_ofdm_mimo_tpu.ldpc import make_qc_ldpc, ldpc_encode
    from esn_ofdm_mimo_tpu.ldpc import decode_pallas as dp

    code = make_qc_ldpc(512)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, size=(B, code.k))
    cw = np.asarray(ldpc_encode(code, jnp.asarray(u))).astype(np.float64)
    rate = code.k / code.n

    dec = jax.jit(lambda x, cap: dp.ldpc_decode_bp_pallas(
        code, x, hi, "sumprod", 0.75, return_stats=True, iter_cap=cap))

    # --- speed: never-converging random LLRs, interleaved cap delta -------
    bad_llr = jnp.asarray(
        rng.normal(scale=3.0, size=(B, code.n)).astype(np.float32))
    jax.device_get(dec(bad_llr, jnp.int32(hi)))
    best = {lo: float("inf"), hi: float("inf")}
    for _ in range(iters):
        for cap in (lo, hi):
            t0 = time.perf_counter()
            out = jax.device_get(dec(bad_llr, jnp.int32(cap)))
            best[cap] = min(best[cap], time.perf_counter() - t0)
    conv_frac = float(np.asarray(out[1]["converged"]).mean())
    tiles = -(-B // dp.W)
    per_it = (best[hi] - best[lo]) / (hi - lo) / tiles
    # normalise to 128-lane-equivalents so W=256 runs compare per codeword
    per_it_128 = per_it * 128.0 / dp.W

    # --- BER at waterfall SNRs (fixed noise seed across variants) ---------
    ber = {}
    for snr_db in (1.5, 2.0, 2.5):
        nrng = np.random.default_rng(1234)
        sigma = np.sqrt(1.0 / (2 * rate * 10 ** (snr_db / 10)))
        y = 1.0 - 2.0 * cw + sigma * nrng.normal(size=cw.shape)
        llr = jnp.asarray((2.0 * y / sigma ** 2).astype(np.float32))
        bits, st = jax.device_get(dec(llr, jnp.int32(hi)))
        info = bits[:, code.m:]
        bad = info != u
        ber[str(snr_db)] = {
            "ber": float(bad.mean()),
            "fer": float(bad.any(axis=1).mean()),
            "conv": float(np.asarray(st["converged"]).mean()),
            "avg_iters": float(np.asarray(st["iterations"]).mean()),
        }

    print(json.dumps({
        "variant": {
            "atanh": dp._ATANH_IMPL,
            "msg_dtype": ("bf16" if dp._MSG_DTYPE == jnp.bfloat16 else "f32"),
            "W": dp.W,
        },
        "us_per_tile_iter": round(per_it * 1e6, 3),
        "us_per_128cw_iter": round(per_it_128 * 1e6, 3),
        "speed_probe_conv_frac": conv_frac,
        "ber": ber,
    }))


if __name__ == "__main__":
    main()
