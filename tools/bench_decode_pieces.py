"""Micro-costs of the decode path's iteration-independent pieces.

profile_e2e_decode.py measures ~460 ms of fixed (non-BP-iteration) cost in
the fused SNR-point dispatch. The candidates, timed here as individual
jitted dispatches at bench shapes ((454656, 512) f32 stacked LLRs):

  colperm    x[:, inv_perm]            — minor-dim gather (current layout)
  transpose  x.T materialized
  rowperm    x_T[inv_perm, :]          — major-dim gather on the transpose
  sortgather argsort(cv) + x[order]    — the compaction pack
  fit        logistic calibrator fit at the full stacked sample count vs a
             1M-sample stride subsample
  llrstack   qam LLR -> calibrate -> llr_from_yobs for one 128-block round

Each timing is best-of-N with the relay's ~35 ms dispatch floor riding on
top (identical for every piece, so the RELATIVE costs are what matters).
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


def timed(label, fn, *args, iters=5):
    out = jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"[{label:>10}] best {best*1e3:8.1f} ms", flush=True)
    return best


def main() -> None:
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.ldpc import make_code
    from esn_ofdm_mimo_tpu.pipelines.cdl import fit_logreg_1d

    cfg = mimo_4x8_cdl()
    n = cfg.ofdm.n_subcarriers * cfg.ofdm.bits_per_symbol
    B = 2 * 6 * 128 * cfg.data_symbols_per_block * cfg.channel.n_tx
    print(f"[cfg] B={B} n={n}", flush=True)
    code = make_code(cfg.ldpc, n)
    inv_perm = jnp.asarray(code.qc.inv_perm)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, n), jnp.float32)
    xT = jnp.asarray(np.zeros((n, B), np.float32))  # placeholder, set below
    xT = jax.jit(lambda a: a.T)(x)
    cv = jax.random.bernoulli(key, 0.5, (B,))
    _ = jax.device_get(xT[0, 0])

    timed("colperm", jax.jit(lambda a: jnp.sum(a[:, inv_perm])), x)
    timed("transpose", jax.jit(lambda a: jnp.sum(a.T, axis=0)), x)
    timed("rowperm", jax.jit(lambda a: jnp.sum(a[inv_perm, :], axis=1)), xT)
    timed("permT", jax.jit(lambda a: jnp.sum(a.T[inv_perm, :], axis=1)), x)
    timed("sortgather",
          jax.jit(lambda a, c: jnp.sum(a[jnp.argsort(c, stable=True)])),
          x, cv)
    timed("int8T", jax.jit(lambda a: jnp.sum(
        (a > 0).astype(jnp.int8).T.astype(jnp.int32))), x)

    # calibrator fit at stacked vs subsampled counts
    m = cfg.ofdm.bits_per_symbol
    S_full = 2 * 128 * cfg.data_symbols_per_block * cfg.channel.n_tx * \
        cfg.ofdm.n_subcarriers
    for S in (S_full, 1 << 20, 1 << 18):
        xs = jax.random.normal(key, (m, S), jnp.float32)
        ys = jax.random.bernoulli(key, 0.5, (m, S)).astype(jnp.float32)
        timed(f"fit{S//1000}k",
              jax.jit(lambda a, b: fit_logreg_1d(a, b, steps=400)[0]),
              xs, ys, iters=3)


if __name__ == "__main__":
    main()
