"""Result reporting: CSV / pickle / PNG outputs mirroring the reference's
artifact formats (results_ber.csv, BER_*.png, channel_metrics pkl)."""
from __future__ import annotations

import csv
import os
import pickle
import numpy as np


def save_nbf_results(outdir: str, cfg, res) -> None:
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "results_ber.csv"), "w", newline="") as f:
        w = csv.writer(f)
        dets = sorted(res.ber.keys())
        w.writerow(["EbNo(dB)"] + [f"{d}_uncoded" for d in dets]
                   + [f"{d}_coded" for d in dets])
        for i, snr in enumerate(res.ebno_db):
            w.writerow([float(snr)] + [res.ber[d][i] for d in dets]
                       + [res.ber_coded[d][i] for d in dets])
    bundle = {
        "EBN0": res.ebno_db.tolist(),
        "BER_uncoded": {d: v.tolist() for d, v in res.ber.items()},
        "BER_coded": {d: v.tolist() for d, v in res.ber_coded.items()},
        "capacity_bits_per_sc": res.capacity_per_sc.tolist(),
        "frac_rank_ge_full": res.frac_rank_full.tolist(),
        "cond_hist": res.cond_hist.tolist(),
        "ldpc_avg_iters": {d: v.tolist()
                           for d, v in res.ldpc_avg_iters.items()},
        "ldpc_unconverged_frac": {
            d: v.tolist() for d, v in res.ldpc_unconverged_frac.items()},
        "meta": {"name": cfg.name, "N": cfg.ofdm.n_subcarriers,
                 "N_t": cfg.channel.n_tx, "N_r": cfg.channel.n_rx,
                 "reservoir": cfg.esn.n_reservoir},
    }
    with open(os.path.join(outdir, "results_ber.pkl"), "wb") as f:
        pickle.dump(bundle, f)
    _plot_curves(outdir, res.ebno_db, res.ber, res.ber_coded, cfg.name)


def save_cdl_results(outdir: str, cfg, results: list) -> None:
    os.makedirs(outdir, exist_ok=True)
    ebno = [r["ebno_db"] for r in results]
    dets = sorted(results[0]["ber_uncoded"].keys())
    with open(os.path.join(outdir, "results_ber.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["EbNo(dB)", "ESN_uncoded", "MMSE_uncoded",
                    "ESN_coded", "MMSE_coded"])
        for r in results:
            w.writerow([r["ebno_db"], r["ber_uncoded"]["esn"],
                        r["ber_uncoded"]["mmse"], r["ber_coded"]["esn"],
                        r["ber_coded"]["mmse"]])
    for r in results:
        p = os.path.join(outdir,
                         f"LLR_calibration_params_EbNo{int(r['ebno_db'])}dB.txt")
        with open(p, "w") as f:
            f.write("bit, a_esn, b_esn, a_mmse, b_mmse\n")
            a_e, b_e = r["calib"]["esn"]
            a_m, b_m = r["calib"]["mmse"]
            for b in range(len(a_e)):
                f.write(f"{b}, {a_e[b]:.4f}, {b_e[b]:.4f}, "
                        f"{a_m[b]:.4f}, {b_m[b]:.4f}\n")
    bundle = {
        "EBN0": ebno,
        "BER_uncoded": {d.upper(): [r["ber_uncoded"][d] for r in results]
                        for d in dets},
        "BER_coded": {d.upper() + "_calLLR": [r["ber_coded"][d] for r in results]
                      for d in dets},
    }
    with open(os.path.join(outdir, "results_ber.pkl"), "wb") as f:
        pickle.dump(bundle, f)
    ber = {d: np.array([r["ber_uncoded"][d] for r in results]) for d in dets}
    berc = {d: np.array([r["ber_coded"][d] for r in results]) for d in dets}
    _plot_curves(outdir, np.array(ebno), ber, berc, cfg.name)


def _plot_curves(outdir, ebno, ber, ber_coded, title) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig = plt.figure(figsize=(9, 6))
    for d, v in sorted(ber.items()):
        plt.semilogy(ebno, np.maximum(v, 1e-8), "--", marker="o",
                     label=f"{d} (uncoded)")
    for d, v in sorted(ber_coded.items()):
        if np.any(v > 0):
            plt.semilogy(ebno, np.maximum(v, 1e-8), "-", marker="*",
                         label=f"{d} (coded)")
    plt.grid(True, which="both", ls=":")
    plt.xlabel("E_b/N_0 [dB]")
    plt.ylabel("BER")
    plt.title(title)
    plt.legend()
    plt.tight_layout()
    fig.savefig(os.path.join(outdir, "BER_curves.png"), dpi=150)
    plt.close(fig)
