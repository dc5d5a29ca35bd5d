"""Overlay the ESN readout-solver ablation: reference vs float64-pinv vs
ridge flagship curves (uncoded and coded panels, one y-axis each).

    python tools/plot_esn_ablation.py [out.png]
"""
from __future__ import annotations

import csv
import sys

import numpy as np

REF_CSV = ("/root/reference/results/results_4x8_cdl_coded_uncoded/"
           "CDLB_run_01/results_ber.csv")

# validated categorical palette (fixed slot order; identity per entity,
# linestyle stays uniform — the panel, not the dash, separates measures)
C_REF, C_PINV, C_RIDGE = "#2a78d6", "#eb6834", "#1baf7a"


def _load(path, e_key, unc, cod):
    rows = list(csv.DictReader(open(path)))
    return (np.array([float(r[e_key]) for r in rows]),
            np.array([float(r[unc]) for r in rows]),
            np.array([float(r[cod]) for r in rows]))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "results/ablation_pinv_readout/esn_ablation_overlay.png"
    e_ref, ref_u, ref_c = _load(REF_CSV, "EbNo(dB)", "ESN_uncoded", "ESN_coded")
    e_p, p_u, p_c = _load("results/ablation_pinv_readout/results_ber.csv",
                          "EbNo(dB)", "ESN_uncoded", "ESN_coded")
    e_r, r_u, r_c = _load("results/ablation_ridge_control/results_ber.csv",
                          "EbNo(dB)", "ESN_uncoded", "ESN_coded")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.6), sharex=True,
                             facecolor="#fcfcfb")
    series = [("reference (pyESN f64 pinv)", C_REF, e_ref),
              ("ours, pinv readout (f64, pyESN-exact)", C_PINV, e_p),
              ("ours, ridge NS readout (default)", C_RIDGE, e_r)]
    for ax, title, cols in (
            (axes[0], "ESN uncoded BER", (ref_u, p_u, r_u)),
            (axes[1], "ESN coded BER", (ref_c, p_c, r_c))):
        for (label, color, ebno), y in zip(series, cols):
            m = y > 0
            ax.semilogy(ebno[m], y[m], color=color, lw=2, marker="o",
                        ms=4, label=label)
        ax.set_title(title, fontsize=11, color="#0b0b0b")
        ax.set_xlabel("Eb/N0 (dB)", color="#52514e")
        ax.grid(True, which="both", alpha=0.18, lw=0.5)
        ax.set_facecolor("#fcfcfb")
        for s in ax.spines.values():
            s.set_alpha(0.25)
    axes[0].set_ylabel("BER", color="#52514e")
    axes[0].legend(frameon=False, fontsize=8.5, loc="lower left")
    fig.suptitle("Readout-solver ablation: pinv == ridge; both differ from "
                 "the reference identically (64 blocks/SNR, identical keys)",
                 fontsize=10.5, color="#0b0b0b")
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
