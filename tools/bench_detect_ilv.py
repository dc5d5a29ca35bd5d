"""Detect-path interleave experiment (VERDICT r03 #7).

Measures the flagship detection dispatch (bench.py _bench_tpu: 64 scanned
rounds x 128 blocks at 12 dB) with ESN_TPU_PREDICT_ILV chains per Pallas
predict program. ILV=2 issues two independent 256-lane recurrence chains
back-to-back per loop trip — the software-pipelining attack on the
micro-measured ~0.7 us/step Mosaic loop overhead floor.

One process per setting (the knob is read at import):
    python tools/bench_detect_ilv.py            # ILV from env (default 1)
    ESN_TPU_PREDICT_ILV=2 python tools/bench_detect_ilv.py
"""
from __future__ import annotations

import json
import os
import sys

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and os.environ.get("_BENCH_REEXEC") != "1"):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _BENCH_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import bench


def main() -> None:
    sym_s, best, symbols = bench._bench_tpu(iters=4)
    print(json.dumps({
        "ilv": int(os.environ.get("ESN_TPU_PREDICT_ILV", "1")),
        "detect_symbols_per_s": round(sym_s, 1),
        "best_dispatch_s": round(best, 4),
    }))


if __name__ == "__main__":
    main()
