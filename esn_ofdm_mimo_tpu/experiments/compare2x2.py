"""2x2 model-zoo comparison CLI (system_model_2_all_comparision.py capability).

    python -m esn_ofdm_mimo_tpu.experiments.compare2x2 [--fast]

Produces BER-vs-SNR for ESN / Perfect-ZF / LS-ZF / MMSE / CNN / RNN / FNN /
ELM (the reference's eight detectors), saved as
BERvsEBNo_esn_all_ml_model.pkl + ber_comparison_system_2.png (the
reference's artifact names, :685-717).
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--blocks", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--outdir", default="results/compare_2x2")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from .presets import mimo_2x2_nbf
    from ..pipelines.zoo2x2 import run_zoo_blocks
    from ..utils.rng import block_keys
    import dataclasses

    cfg = mimo_2x2_nbf(fast=args.fast)
    cfg = dataclasses.replace(
        cfg, ldpc=dataclasses.replace(cfg.ldpc, enabled=False))
    blocks = args.blocks or (4 if args.fast else 16)

    os.makedirs(args.outdir, exist_ok=True)
    from ..utils.metrics import MetricsLogger
    import time
    log = MetricsLogger(os.path.join(args.outdir, "events.jsonl"))
    log.log("run_start", blocks=blocks, epochs=args.epochs)
    t0 = time.time()

    root = jax.random.PRNGKey(args.seed)
    step = jax.jit(lambda e, k: run_zoo_blocks(cfg, e, k, epochs=args.epochs))
    ber = {}
    nmse_train, nmse_test = {}, {}
    for jj, ebno in enumerate(cfg.ebno_db):
        keys = block_keys(root, jj, jnp.arange(blocks, dtype=jnp.uint32))
        out = step(jnp.float32(ebno), keys)
        tot = float(out.total_bits)
        nb = max(float(out.n_blocks), 1.0)
        for k, v in out.bit_errors.items():
            ber.setdefault(k, []).append(float(v) / tot)
        for k, v in out.train_nmse.items():
            nmse_train.setdefault(k, []).append(float(v) / nb)
        for k, v in out.test_nmse.items():
            nmse_test.setdefault(k, []).append(float(v) / nb)
        print(f"[2x2] EbNo={ebno:g}: " + " ".join(
            f"{k}={ber[k][-1]:.4g}" for k in sorted(ber)), flush=True)

    log.log("run_done", seconds=round(time.time() - t0, 1),
            outdir=args.outdir)
    with open(os.path.join(args.outdir, "BERvsEBNo_esn_all_ml_model.pkl"),
              "wb") as f:
        pickle.dump({"EBN0": list(cfg.ebno_db), "BER": ber}, f)
    # per-model train/test NMSE bookkeeping, the reference's NMSE_compare.pkl
    # (Demo_MIMO_2x2_all_DL_model_comparion.py:577-598)
    with open(os.path.join(args.outdir, "NMSE_compare.pkl"), "wb") as f:
        pickle.dump({"EBN0": list(cfg.ebno_db),
                     "NMSE_train": nmse_train, "NMSE_test": nmse_test}, f)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(9, 6))
        for k in sorted(ber):
            plt.semilogy(cfg.ebno_db, np.maximum(ber[k], 1e-8), "o-", label=k)
        plt.grid(True, which="both", ls=":")
        plt.xlabel("E_b/N_0 [dB]")
        plt.ylabel("BER")
        plt.legend()
        plt.title("2x2 block fading: ESN vs model zoo vs classical")
        plt.tight_layout()
        fig.savefig(os.path.join(args.outdir, "ber_comparison_system_2.png"),
                    dpi=150)
    except Exception:
        pass


if __name__ == "__main__":
    main()
