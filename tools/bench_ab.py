"""A/B bench sweep over (n_blocks, rounds) for the flagship cal step.

Usage: python tools/bench_ab.py "128:8,128:16,256:8,256:16"
Prints throughput per configuration (best-of-3 dispatches each).
"""
from __future__ import annotations

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

import importlib


def main() -> None:
    spec = sys.argv[1] if len(sys.argv) > 1 else "128:8,128:16,256:8"
    bench = importlib.import_module("bench")
    for part in spec.split(","):
        nb, r = (int(v) for v in part.split(":"))
        val, _, _ = bench._bench_tpu(n_blocks=nb, rounds=r, iters=3)
        print(f"blocks={nb:4d} rounds={r:3d}  {val:10.0f} sym/s", flush=True)


if __name__ == "__main__":
    main()
