"""Per-block ESN BER distribution at the high-SNR floor (flagship 4x8 CDL).

The reference's committed ESN floor (uncoded ~0.157-0.162 at 24/27/30 dB,
CDLB_run_01/results_ber.csv) is a mean over 14 coherence blocks per SNR
point (L=75, 1000 symbols, Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:315-321),
each with a FRESH reservoir draw. Our curves average 64-128 blocks. This
tool measures the per-block BER distribution on our stack — one block per
dispatch round (B=1) so every block gets its own reservoir draw, matching
the reference's variance sources — and bootstraps 14-block means to ask:
is the reference's floor inside the 14-block sampling band of the same
detector, or is there a real model difference?

Run (TPU or CPU): python tools/diag_esn_floor.py [n_blocks] [ebno ...]
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

import numpy as np


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ebnos = [float(x) for x in sys.argv[2:]] or [24.0, 30.0]

    import jax
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.pipelines.cdl import run_cdl_cal_blocks
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()

    @jax.jit
    def per_block(ebno_db, bkeys2d):
        # scan over (R, 1)-keyed singleton batches: each block draws its own
        # reservoir (synth_block folds the reservoir key from bkeys[0]),
        # reproducing the reference's per-block reservoir variance
        def body(_, bkeys):
            out = run_cdl_cal_blocks(cfg, ebno_db, bkeys)
            return 0, (out.bit_errors["esn"], out.bit_errors["mmse"],
                       out.total_bits)
        _, (e_esn, e_mmse, tot) = jax.lax.scan(body, 0, bkeys2d)
        return e_esn, e_mmse, tot

    root = jax.random.PRNGKey(7)
    rng = np.random.default_rng(0)
    for ebno in ebnos:
        keys = block_keys(root, int(ebno), jnp.arange(n_blocks, dtype=jnp.uint32))
        keys = keys.reshape(n_blocks, 1, *keys.shape[1:])
        e_esn, e_mmse, tot = jax.device_get(per_block(jnp.float32(ebno), keys))
        ber = np.asarray(e_esn, np.float64) / np.asarray(tot, np.float64)
        boot = rng.choice(ber, size=(20000, 14)).mean(axis=1)
        qs = np.quantile(boot, [0.05, 0.5, 0.95, 0.99])
        print(f"EbNo={ebno:g} dB  blocks={n_blocks}")
        print(f"  per-block ESN BER: mean {ber.mean():.4f}  std {ber.std():.4f}"
              f"  min {ber.min():.4f}  max {ber.max():.4f}")
        print(f"  14-block mean: q05 {qs[0]:.4f}  median {qs[1]:.4f}  "
              f"q95 {qs[2]:.4f}  q99 {qs[3]:.4f}")
        for ref in (0.1591, 0.1569, 0.1620):
            p = float((boot >= ref).mean())
            print(f"  P(14-block mean >= {ref:.4f}) = {p:.4f}")
        np.save(f"results/esn_floor_blocks_{int(ebno)}dB.npy", ber)


if __name__ == "__main__":
    main()
