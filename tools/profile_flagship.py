"""Phase-ablation profiling of the flagship 4x8 CDL step on the TPU.

Times full jitted pipeline variants (standalone kernel timing is meaningless
through the axon tunnel — docs/ENVIRONMENT.md): synth-only, synth+ESN,
synth+MMSE, full cal step, and the decode phase. Differences between variants
attribute wall time to phases. Run: python tools/profile_flagship.py [batch]
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.pipelines.cdl import (
        run_cdl_cal_blocks, run_cdl_decode_blocks)
    from esn_ofdm_mimo_tpu.pipelines.common import (
        synth_block, detect_data_symbols, data_bits_for_blocks)
    from esn_ofdm_mimo_tpu.ldpc import make_code
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()
    D = cfg.data_symbols_per_block
    N, m = cfg.ofdm.n_subcarriers, cfg.ofdm.bits_per_symbol
    code = make_code(cfg.ldpc, N * m)

    def reduce_tree(t):
        leaves = [jnp.sum(jnp.abs(x).astype(jnp.float32)) if jnp.iscomplexobj(x)
                  else jnp.sum(x.astype(jnp.float32))
                  for x in jax.tree_util.tree_leaves(t)]
        return sum(leaves)

    @jax.jit
    def v_synth(ebno_db, bkeys):
        st = synth_block(cfg, ebno_db, bkeys)
        return reduce_tree((st.H_mmse, st.Wt_out_m))

    # synth sub-phases (channel draw / chanest / ESN fit attribution)
    from esn_ofdm_mimo_tpu.pipelines import common as _c

    @jax.jit
    def v_taps(ebno_db, bkeys):
        taps = _c._draw_taps(cfg, _c._vfold(bkeys, _c._K_CHAN))
        from esn_ofdm_mimo_tpu.ops import taps_to_freq_response
        return reduce_tree(taps_to_freq_response(taps, N))

    @jax.jit
    def v_synth_nofit(ebno_db, bkeys):
        # synth_block with the ESN fit's readout solve skipped: re-run the
        # pilot/chanest part by calling synth_block on a cfg clone whose
        # reservoir is tiny (fit cost ~0)
        import dataclasses
        cfg_small = dataclasses.replace(
            cfg, esn=dataclasses.replace(cfg.esn, n_reservoir=8))
        st = synth_block(cfg_small, ebno_db, bkeys)
        return reduce_tree((st.H_mmse, st.Wt_out_m))

    def make_detect(detectors):
        @jax.jit
        def f(ebno_db, bkeys):
            st = synth_block(cfg, ebno_db, bkeys)
            bits, _ = data_bits_for_blocks(cfg, bkeys, D, code)
            data = detect_data_symbols(cfg, st, ebno_db, bkeys, bits, detectors)
            return reduce_tree((data.X_hat, data.Y))
        return f

    @jax.jit
    def v_full(ebno_db, bkeys):
        out = run_cdl_cal_blocks(cfg, ebno_db, bkeys)
        return reduce_tree((out.bit_errors, out.llr))

    calib = {n: (jnp.full((m,), -0.5, jnp.float32), jnp.zeros((m,), jnp.float32))
             for n in ("esn", "mmse")}

    @jax.jit
    def v_decode(ebno_db, bkeys):
        out = run_cdl_decode_blocks(cfg, ebno_db, bkeys, calib)
        return reduce_tree((out.bit_errors, out.info_errors))

    variants = [
        ("taps_only", v_taps),
        ("synth_tiny_esn", v_synth_nofit),
        ("synth_only", v_synth),
        ("synth+datapath", make_detect(())),
        ("synth+esn", make_detect(("esn",))),
        ("synth+mmse", make_detect(("mmse",))),
        ("full_cal (bench)", v_full),
        ("full_decode (BP)", v_decode),
    ]

    root = jax.random.PRNGKey(0)
    ebno = jnp.float32(12.0)
    # Scan ROUNDS rounds inside ONE dispatch per timing sample (the ~35 ms
    # relay round-trip and its +/-30 ms variance otherwise swamp the phase
    # differences — docs/ENVIRONMENT.md), and report the best of `iters`
    # samples (interference only ever adds time).
    ROUNDS = 8

    def scanned(fn):
        @jax.jit
        def g(ebno_db, keys2d):  # keys2d: (ROUNDS, B)
            def body(acc, ks):
                return acc + fn(ebno_db, ks), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), keys2d)
            return out
        return g

    def keys2d(i):
        ids = (jnp.arange(ROUNDS * n_blocks, dtype=jnp.uint32)
               + i * ROUNDS * n_blocks)
        keys = block_keys(root, 0, ids)           # (R*B, ...) raw key data
        return keys.reshape(ROUNDS, n_blocks, *keys.shape[1:])

    print(f"batch={n_blocks} rounds/dispatch={ROUNDS} iters={iters} "
          f"device={jax.devices()[0]}")
    results = {}
    for name, fn in variants:
        g = scanned(fn)
        jax.device_get(g(ebno, keys2d(0)))  # compile + warm
        best = float("inf")
        for i in range(iters):
            t0 = time.perf_counter()
            jax.device_get(g(ebno, keys2d(i + 1)))
            best = min(best, (time.perf_counter() - t0) / ROUNDS)
        results[name] = best
        print(f"{name:22s} {best*1e3:9.1f} ms/round  "
              f"({n_blocks*(D+1)/best:9.0f} sym/s)", flush=True)

    syn = results["synth_only"]
    dp = results["synth+datapath"]
    # NOTE: every row after `taps` is a DELTA between variants, so the
    # per-dispatch relay overhead cancels; `taps` is the absolute first
    # variant and therefore CARRIES that overhead (~35 ms / rounds-per-
    # dispatch per round, docs/ENVIRONMENT.md) — at 8 rounds/dispatch read
    # it as overhead+taps, not tap-synthesis cost (round-4 check: the real
    # taps work is <1 ms/round).
    print(f"\nattribution (ms): taps={results['taps_only']*1e3:.1f} "
          f"chanest+pilot={(results['synth_tiny_esn']-results['taps_only'])*1e3:.1f} "
          f"esn_fit={(syn-results['synth_tiny_esn'])*1e3:.1f} "
          f"datapath={(dp-syn)*1e3:.1f} "
          f"esn_detect={(results['synth+esn']-dp)*1e3:.1f} "
          f"mmse_detect={(results['synth+mmse']-dp)*1e3:.1f} "
          f"llr+counts={(results['full_cal (bench)']-results['synth+esn']-(results['synth+mmse']-dp))*1e3:.1f} "
          f"bp_decode={(results['full_decode (BP)']-results['full_cal (bench)'])*1e3:.1f}")


if __name__ == "__main__":
    main()
