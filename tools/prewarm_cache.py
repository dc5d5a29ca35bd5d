"""Pre-compile the standard preset programs into the persistent cache.

The round-5 cold-wall study (docs/ENVIRONMENT.md) showed the controllable
part of a fresh environment's first-run wall is one big-program relay
compile per preset (40-50 s each in a healthy relay epoch, up to ~10 min
in a slow one) — and that the persistent compilation cache hits
cross-process, including the embedded Mosaic kernels, cutting that to a
4.8-15.4 s executable load. This tool pays all of those compiles once,
up front, via `jit(...).lower(...).compile()` — no device execution, so
it also works while the chip is busy elsewhere only if the relay permits
(on axon the compile itself goes through the device relay; run it
serially like any TPU job).

    PALLAS_AXON_REMOTE_COMPILE=1 \
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python tools/prewarm_cache.py [--presets siso_nbf,mimo_4x8_cdl]

Programs warmed per preset (the ones the run CLI dispatches at default
settings): the whole-grid fused program at the default
blocks-per-device=16 layout, plus the flagship's per-SNR step and
dec_local (used by --resume and adaptive top-ups).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and os.environ.get("_PREWARM_REEXEC") != "1"):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1",
               _PREWARM_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp


def _warm(label, jitted, *args):
    t0 = time.perf_counter()
    jitted.lower(*args).compile()
    print(f"[prewarm] {label}: {time.perf_counter() - t0:.1f} s",
          flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--presets", default=None,
                    help="comma-separated preset names (default: all)")
    ap.add_argument("--blocks-per-device", type=int, default=16)
    args = ap.parse_args(argv)

    from esn_ofdm_mimo_tpu.experiments.presets import PRESETS, get_preset
    from esn_ofdm_mimo_tpu.parallel import trials_mesh
    from esn_ofdm_mimo_tpu.parallel.montecarlo import (
        make_fused_cdl_grid, make_fused_cdl_snr_step, make_fused_nbf_grid,
        make_sharded_cdl_steps)
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    names = (args.presets.split(",") if args.presets
             else sorted(PRESETS))
    mesh = trials_mesh()
    G = mesh.devices.size * args.blocks_per_device
    root = jax.random.PRNGKey(0)

    for name in names:
        cfg = get_preset(name)
        rounds = max(1, -(-cfg.n_blocks // G))
        if cfg.calib.enabled:
            cal_r = min(max(1, round(rounds * cfg.calib.cal_fraction)),
                        max(rounds - 1, 1))
            dec_r = max(1, rounds - cal_r)
            grid = make_fused_cdl_grid(cfg, mesh, args.blocks_per_device,
                                       cal_r, dec_r)
            _warm(f"{name} grid(cal{cal_r}+dec{dec_r}x{G})",
                  jax.jit(grid), root)
            step = make_fused_cdl_snr_step(cfg, mesh)
            ck = block_keys(root, 0, jnp.arange(cal_r * G,
                                                dtype=jnp.uint32))
            ck = ck.reshape(cal_r, G, -1)
            dk = block_keys(root, 0, jnp.arange(dec_r * G,
                                                dtype=jnp.uint32))
            dk = dk.reshape(dec_r, G, -1)
            _warm(f"{name} snr_step", step, jnp.float32(12.0), ck, dk)
            _, dec = make_sharded_cdl_steps(cfg, mesh)
            keys = block_keys(root, 0, jnp.arange(4 * G,
                                                  dtype=jnp.uint32))
            calib = {d: (jnp.ones(cfg.ofdm.bits_per_symbol),
                         jnp.zeros(cfg.ofdm.bits_per_symbol))
                     for d in ("esn", "mmse")}
            _warm(f"{name} dec_local(4x{G})", dec, jnp.float32(12.0),
                  keys.reshape(4, G, -1), calib)
        else:
            grid = make_fused_nbf_grid(cfg, mesh, args.blocks_per_device,
                                       rounds)
            _warm(f"{name} grid({rounds}x{G})", jax.jit(grid), root)
    print("[prewarm] done — cache at",
          os.environ["JAX_COMPILATION_CACHE_DIR"])


if __name__ == "__main__":
    main()
