"""A/B the calibrator-fit solver inside the fused flagship SNR dispatch.

fit_method="gd" (reference semantics: 400 sequential full-batch steps) vs
"newton" (backtracking Newton, ~8 iterations x 5 data passes on the same
penalized MLE). Both programs run at identical block keys; reported:
per-dispatch best-of-N wall, the fitted (a, b) per detector, and the
decoded counters — so the speed delta and any BER consequence are read
off the same screen.

    python tools/bench_calib_fit.py          # TPU
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and os.environ.get("_BCF_REEXEC") != "1"):
    env = dict(os.environ, PALLAS_AXON_REMOTE_COMPILE="1", _BCF_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.parallel.mesh import trials_mesh
    from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_cdl_snr_step
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    n_blocks, cal_r, dec_r, iters = 128, 2, 6, 4
    mesh = trials_mesh()
    root = jax.random.PRNGKey(0)
    R = cal_r + dec_r

    def keys_for(i):
        ids = jnp.arange(i * R * n_blocks, (i + 1) * R * n_blocks,
                         dtype=jnp.uint32)
        keys = block_keys(root, 1, ids).reshape(R, n_blocks, -1)
        return keys[:cal_r], keys[cal_r:]

    ebno = jnp.float32(12.0)
    for method in ("gd", "newton"):
        cfg = mimo_4x8_cdl()
        cfg = dataclasses.replace(
            cfg, calib=dataclasses.replace(cfg.calib, fit_method=method))
        step = make_fused_cdl_snr_step(cfg, mesh)
        ck, dk = keys_for(0)
        out = jax.device_get(step(ebno, ck, dk))
        best = float("inf")
        for i in range(iters):
            ck, dk = keys_for(i + 1)
            t0 = time.perf_counter()
            out = jax.device_get(step(ebno, ck, dk))
            best = min(best, time.perf_counter() - t0)
        errs, tot, dec, calib = out
        cal_s = {d: (np.asarray(a).round(4).tolist(),
                     np.asarray(b).round(4).tolist())
                 for d, (a, b) in calib.items()}
        coded = {d: int(dec.info_errors[d]) for d in dec.info_errors}
        print(f"[{method:6s}] best {best*1e3:7.1f} ms  coded_errs={coded}")
        for d, (a, b) in sorted(cal_s.items()):
            print(f"         {d}: a={a} b={b}")


if __name__ == "__main__":
    main()
