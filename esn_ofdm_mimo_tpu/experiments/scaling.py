"""Scaling-efficiency measurement: blocks/s at 1..N devices.

BASELINE.json's north star asks for measured Monte-Carlo scaling efficiency.
On this machine only one real TPU chip is visible, so the harness measures
whatever mesh sizes the current platform exposes (the 8-device CPU mesh in
CI; a pod slice when run under jax.distributed on real hardware — the same
code path). On the CPU mesh the virtual devices share physical cores, so
the printed blocks/s are a correctness exercise, NOT an efficiency claim —
the quantified hardware prediction (complete collective inventory over
measured device-seconds, 99%/89% weak-scaling efficiency at 256 chips
over ICI/DCN) lives in tools/scaling_model.py + docs/SCALING.md, and the
measured multi-process upper bound in tests/test_distributed.py::
test_four_process_collective_overhead_fraction.

    python -m esn_ofdm_mimo_tpu.experiments.scaling [--preset mimo_4x8_cdl]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..parallel.mesh import trials_mesh
from ..parallel.montecarlo import make_sharded_nbf_step
from ..utils.rng import block_keys


def measure_scaling(cfg, device_counts=None, blocks_per_device: int = 2,
                    iters: int = 3, ebno_db: float = 12.0) -> dict:
    n_avail = jax.device_count()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]
    root = jax.random.PRNGKey(0)
    out = {}
    for nd in device_counts:
        mesh = trials_mesh(nd)
        step = make_sharded_nbf_step(cfg, mesh)
        G = nd * blocks_per_device
        keys = block_keys(root, 0, jnp.arange(G, dtype=jnp.uint32))
        jax.device_get(step(jnp.float32(ebno_db), keys))   # warm
        t0 = time.perf_counter()
        for i in range(iters):
            keys_i = block_keys(root, i + 1, jnp.arange(G, dtype=jnp.uint32))
            jax.device_get(step(jnp.float32(ebno_db), keys_i))
        dt = (time.perf_counter() - t0) / iters
        out[nd] = {"blocks_per_s": G / dt, "seconds_per_round": dt}
        print(f"[scaling] {nd} devices: {G / dt:.2f} blocks/s", flush=True)
    base = out[device_counts[0]]["blocks_per_s"] / device_counts[0]
    for nd in device_counts:
        out[nd]["efficiency"] = out[nd]["blocks_per_s"] / (nd * base)
    return out


def main(argv=None):
    from .presets import get_preset
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="mimo_2x2_nbf")
    ap.add_argument("--fast", action="store_true", default=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    cfg = get_preset(args.preset, fast=True)
    res = measure_scaling(cfg)
    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
