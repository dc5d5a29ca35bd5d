"""Decompose the flagship data-symbol path (TX -> channel -> AWGN -> demod).

The scanned-dispatch profiler (profile_flagship.py) attributes ~9.5 ms/round
to "datapath" at 128 blocks; this script splits that into bits+QAM+TX chain,
FIR channel, AWGN generation, and OFDM demod by timing cumulative jitted
variants (each scanned ROUNDS x per dispatch, best-of-N).

Run: python tools/profile_datapath.py [n_blocks] [iters]
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

import jax
import jax.numpy as jnp


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    ROUNDS = 8

    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.pipelines import common as c
    from esn_ofdm_mimo_tpu.ops import (bits_to_symbols, ofdm_modulate,
                                       ofdm_demodulate, apply_fir_channel,
                                       draw_cdlb_taps)
    from esn_ofdm_mimo_tpu.ops.pa import rapp_pa
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()
    ofdm = cfg.ofdm
    N, cp, m = ofdm.n_subcarriers, ofdm.cp_len, ofdm.bits_per_symbol
    n_tx, n_rx = cfg.channel.n_tx, cfg.channel.n_rx
    D = cfg.data_symbols_per_block
    T = N + cp
    ebno = jnp.float32(12.0)

    def reduce_c(x):
        return jnp.sum(jnp.abs(x).astype(jnp.float32))

    def stage(upto):
        def f(ebno_db, bkeys):
            var_x, pi, sqrt_pi, a_clip = c._link_budget(cfg, ebno_db)
            bits = c._vbits(c._vfold(bkeys, c._K_DBITS), (D, n_tx, N * m))
            if upto == "bits":
                return jnp.sum(bits.astype(jnp.float32))
            X = bits_to_symbols(bits, m)
            x_cp = ofdm_modulate(X, cp) * sqrt_pi
            x_cp = rapp_pa(x_cp, a_clip, cfg.pa.smoothness)
            if upto == "tx":
                return reduce_c(x_cp)
            taps = c._draw_taps(cfg, c._vfold(bkeys, c._K_CHAN))
            y = apply_fir_channel(taps[:, None], x_cp)
            if upto == "fir":
                return reduce_c(y)
            noise = c._vawgn(c._vfold(bkeys, c._K_DNOISE),
                             (D, n_rx, T), ofdm.noise_psd, T)
            if upto == "noise":
                return reduce_c(y + noise)
            Y = ofdm_demodulate(y + noise, cp)
            return reduce_c(Y)
        return f

    def scanned(fn):
        @jax.jit
        def g(ebno_db, keys2d):
            def body(acc, ks):
                return acc + fn(ebno_db, ks), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
            return out
        return g

    root = jax.random.PRNGKey(0)

    def keys2d(i):
        ids = (jnp.arange(ROUNDS * n_blocks, dtype=jnp.uint32)
               + i * ROUNDS * n_blocks)
        keys = block_keys(root, 0, ids)
        return keys.reshape(ROUNDS, n_blocks, *keys.shape[1:])

    print(f"batch={n_blocks} rounds/dispatch={ROUNDS} iters={iters}")
    prev = 0.0
    for name in ("bits", "tx", "fir", "noise", "demod"):
        g = scanned(stage(name))
        jax.device_get(g(ebno, keys2d(0)))
        best = float("inf")
        for i in range(iters):
            t0 = time.perf_counter()
            jax.device_get(g(ebno, keys2d(i + 1)))
            best = min(best, (time.perf_counter() - t0) / ROUNDS)
        print(f"{name:6s} {best*1e3:8.2f} ms/round  (+{(best-prev)*1e3:6.2f})",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
