"""ESN hyperparameter sweep driver.

Regenerates the reference's committed ESN_sweep_{reservoir,spectral,sparsity,
inpscale,teachers}.png figures (results/ESN_sweep_parameters/ — the
generating script is not committed in the reference, SURVEY.md §6.4): BER of
the ESN detector versus one hyperparameter at a fixed Eb/N0, on the 2x2
block-fading plant.

    python -m esn_ofdm_mimo_tpu.experiments.sweep --param reservoir \
        --ebno 12 --blocks 16 --outdir results/esn_sweeps
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SWEEPS: Dict[str, Sequence] = {
    "reservoir": (50, 100, 200, 300, 450, 600),
    "spectral": (0.5, 0.7, 0.8, 0.9, 0.95, 0.99),
    "sparsity": (0.0, 0.1, 0.3, 0.5, 0.7, 0.9),
    "inpscale": (0.0005, 0.001, 0.005, 0.02, 0.1),
    "teachers": (5e-8, 5e-7, 5e-6, 5e-5),
}


def _apply(cfg, param: str, value):
    esn = cfg.esn
    if param == "reservoir":
        esn = dataclasses.replace(esn, n_reservoir=int(value))
    elif param == "spectral":
        esn = dataclasses.replace(esn, spectral_radius=float(value))
    elif param == "sparsity":
        esn = dataclasses.replace(esn, sparsity=float(value))
    elif param == "inpscale":
        esn = dataclasses.replace(esn, input_scaler=float(value))
    elif param == "teachers":
        esn = dataclasses.replace(esn, teacher_scaling=float(value))
    else:
        raise ValueError(param)
    return dataclasses.replace(cfg, esn=esn)


# sweep param -> esn_over key (traced scalars; one compile per sweep).
# "reservoir" changes array shapes and must recompile per value.
_TRACED = {"spectral": "spectral_radius", "sparsity": "sparsity",
           "inpscale": "input_scaler", "teachers": "teacher_scaling"}


def run_sweep(param: str, ebno_db: float = 12.0, blocks: int = 16,
              seed: int = 0, base_cfg=None) -> Dict[float, float]:
    """Returns {value: esn_ber} for the chosen hyperparameter sweep."""
    from ..experiments.presets import mimo_2x2_nbf
    from ..pipelines.blockfading import run_nbf_blocks
    from ..utils.rng import block_keys

    base = base_cfg if base_cfg is not None else dataclasses.replace(
        mimo_2x2_nbf(), ldpc=dataclasses.replace(mimo_2x2_nbf().ldpc,
                                                 enabled=False))
    out = {}
    root = jax.random.PRNGKey(seed)
    keys = block_keys(root, 0, jnp.arange(blocks, dtype=jnp.uint32))
    if param in _TRACED:
        over_key = _TRACED[param]
        step = jax.jit(lambda e, k, v: run_nbf_blocks(
            base, e, k, detectors=("esn",), esn_over={over_key: v}))
        for v in SWEEPS[param]:
            counts = step(jnp.float32(ebno_db), keys, jnp.float32(v))
            out[float(v)] = (float(counts.bit_errors["esn"])
                             / float(counts.total_bits))
            print(f"[sweep] {param}={v}: BER={out[float(v)]:.4g}", flush=True)
        return out
    for v in SWEEPS[param]:
        cfg = _apply(base, param, v)
        counts = jax.jit(
            lambda e, k, cfg=cfg: run_nbf_blocks(cfg, e, k,
                                                 detectors=("esn",)))(
            jnp.float32(ebno_db), keys)
        out[float(v)] = float(counts.bit_errors["esn"]) / float(counts.total_bits)
        print(f"[sweep] {param}={v}: BER={out[float(v)]:.4g}", flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--param", choices=sorted(SWEEPS), required=True)
    ap.add_argument("--ebno", type=float, default=12.0)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--outdir", default="results/esn_sweeps")
    args = ap.parse_args(argv)
    res = run_sweep(args.param, args.ebno, args.blocks)
    os.makedirs(args.outdir, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        xs = sorted(res)
        fig = plt.figure()
        plt.semilogy(xs, [max(res[x], 1e-8) for x in xs], "o-")
        plt.xlabel(args.param)
        plt.ylabel("ESN BER")
        plt.grid(True, which="both", ls=":")
        plt.title(f"ESN sweep: {args.param} @ {args.ebno:g} dB")
        fig.savefig(os.path.join(args.outdir, f"ESN_sweep_{args.param}.png"),
                    dpi=150)
    except Exception:
        pass
    import json
    with open(os.path.join(args.outdir, f"ESN_sweep_{args.param}.json"), "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
