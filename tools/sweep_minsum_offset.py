"""Offset min-sum A/B at the flagship waterfall (VERDICT r04 #3).

Normalized min-sum failed the ±0.5 dB parity band at the 6 dB MMSE coded
waterfall (+0.59 dB at scale 0.75, +1.02 at 0.875 — PARITY.md round-2
study); offset min-sum (λ-subtract) is the standard next variant. This
tool decodes IDENTICAL calibrated flagship LLRs (the mimo_4x8_cdl
operating point: detector → max-log LLRs → logistic calibration → clip →
pyldpc y_obs contract) with sum-product, normalized min-sum, and an
offset sweep — the paired design cancels channel sampling noise, so the
check-rule comparison is sharp at modest block counts. A winning offset
then gets the same full-grid `validate_baseline` treatment the
layered/bf16 studies used.

    JAX_PLATFORMS=cpu python tools/sweep_minsum_offset.py \
        --ebno 6.0 --cal-blocks 32 --dec-blocks 96 --out /tmp/offsweep.json

Reference contract: pyldpc BP (OFDM_SISO_NBF_LDPC.py:484-499); the parity
criterion is the ±0.5 dB band of BASELINE.md §1.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ebno", type=float, nargs="+", default=[6.0])
    ap.add_argument("--cal-blocks", type=int, default=32)
    ap.add_argument("--dec-blocks", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--offsets", default="0.125,0.25,0.375,0.5,0.625,0.75")
    ap.add_argument("--max-iter", type=int, default=None,
                    help="override cfg.ldpc.max_iter (decode budget)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import esn_ofdm_mimo_tpu  # noqa: F401  (platform + precision setup)
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.ldpc import ldpc_decode_bp_counts
    from esn_ofdm_mimo_tpu.ldpc.code import make_code
    from esn_ofdm_mimo_tpu.pipelines.cdl import (
        fit_calibrators, run_cdl_cal_blocks, run_cdl_detect_llrs)
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()
    if args.max_iter is not None:
        cfg = dataclasses.replace(
            cfg, ldpc=dataclasses.replace(cfg.ldpc, max_iter=args.max_iter))
    N, m = cfg.ofdm.n_subcarriers, cfg.ofdm.bits_per_symbol
    code = make_code(cfg.ldpc, N * m)
    root = jax.random.PRNGKey(cfg.seed)
    offsets = [float(x) for x in args.offsets.split(",")]
    report = {"cal_blocks": args.cal_blocks, "dec_blocks": args.dec_blocks,
              "max_iter": cfg.ldpc.max_iter, "points": []}

    cal_fn = jax.jit(lambda e, k: run_cdl_cal_blocks(cfg, e, k))
    det_fn = jax.jit(
        lambda e, k, c: run_cdl_detect_llrs(cfg, e, k, c))

    for jj, ebno in enumerate(args.ebno):
        e = jnp.float32(ebno)
        # phase A: calibration chunks -> per-bit logistic calibrators
        cal_llr, cal_bits = {}, []
        for c in range(-(-args.cal_blocks // args.chunk)):
            nb = min(args.chunk, args.cal_blocks - c * args.chunk)
            ids = jnp.arange(c * args.chunk, c * args.chunk + nb,
                             dtype=jnp.uint32)
            out = cal_fn(e, block_keys(root, jj, ids))
            for d, v in out.llr.items():
                cal_llr.setdefault(d, []).append(
                    np.asarray(v).reshape(-1, m))
            cal_bits.append(np.asarray(out.bits).reshape(-1, m))
        calib = fit_calibrators(
            cfg, {d: jnp.asarray(np.concatenate(v)) for d, v in
                  cal_llr.items()},
            jnp.asarray(np.concatenate(cal_bits)))

        # phase B: detection chunks -> identical stacked LLR set
        Lcs, info = {}, []
        base = args.cal_blocks
        for c in range(-(-args.dec_blocks // args.chunk)):
            nb = min(args.chunk, args.dec_blocks - c * args.chunk)
            ids = jnp.arange(base + c * args.chunk,
                             base + c * args.chunk + nb, dtype=jnp.uint32)
            _, _, Lc, u = det_fn(e, block_keys(root, jj, ids), calib)
            for d, v in Lc.items():
                Lcs.setdefault(d, []).append(np.asarray(v))
            info.append(np.asarray(u))
        Lcs = {d: jnp.asarray(np.concatenate(v)) for d, v in Lcs.items()}
        info_bits = jnp.asarray(np.concatenate(info))
        k = info_bits.shape[-1]

        variants = [("sumprod", {}), ("minsum", {"minsum_scale": 0.75})]
        variants += [("offset-minsum", {"minsum_offset": b})
                     for b in offsets]
        point = {"ebno_db": ebno, "n_codewords": int(info_bits.shape[0]),
                 "variants": []}
        for algo, kw in variants:
            row = {"algo": algo, **kw}
            for d in sorted(Lcs):
                err, st = ldpc_decode_bp_counts(
                    code, Lcs[d], info_bits, cfg.ldpc.max_iter,
                    algo=algo, **kw)
                nerr = int(jnp.sum(err))
                row[d] = {
                    "ber": nerr / float(info_bits.size),
                    "frames": int(jnp.sum((err > 0).astype(jnp.int32))),
                    "avg_iters": float(jnp.mean(
                        st["iterations"].astype(jnp.float32))),
                }
            point["variants"].append(row)
            det = " ".join(
                f"{d}: ber={row[d]['ber']:.5f} fr={row[d]['frames']}"
                f" it={row[d]['avg_iters']:.1f}" for d in sorted(Lcs))
            lab = algo + (f" β={kw.get('minsum_offset')}"
                          if "minsum_offset" in kw else
                          f" α={kw.get('minsum_scale')}" if kw else "")
            print(f"[{ebno:g} dB] {lab:24s} {det}", flush=True)
        report["points"].append(point)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
