"""Overlay the ESN training-target ablation: reference vs pre-PA (parity)
vs post-PA (default) flagship ESN curves.

    python tools/plot_esn_target.py [out.png]
"""
from __future__ import annotations

import csv
import sys

import numpy as np

REF_CSV = ("/root/reference/results/results_4x8_cdl_coded_uncoded/"
           "CDLB_run_01/results_ber.csv")
C_REF, C_PRE, C_POST = "#2a78d6", "#eb6834", "#1baf7a"


def _load(path, unc, cod):
    rows = list(csv.DictReader(open(path)))
    return (np.array([float(r["EbNo(dB)"]) for r in rows]),
            np.array([float(r[unc]) for r in rows]),
            np.array([float(r[cod]) for r in rows]))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "results/mimo_4x8_cdl_tpu_prepa/esn_target_overlay.png"
    ref = _load(REF_CSV, "ESN_uncoded", "ESN_coded")
    pre = _load("results/mimo_4x8_cdl_tpu_prepa/results_ber.csv",
                "ESN_uncoded", "ESN_coded")
    post = _load("results/mimo_4x8_cdl_tpu_v3/results_ber.csv",
                 "ESN_uncoded", "ESN_coded")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.6), sharex=True,
                             facecolor="#fcfcfb")
    series = [("reference (trains on pre-PA x_CP)", C_REF, ref),
              ("ours, --esn-target pre_pa (parity)", C_PRE, pre),
              ("ours, post_pa default (easier target)", C_POST, post)]
    for ax, title, idx in ((axes[0], "ESN uncoded BER", 1),
                           (axes[1], "ESN coded BER", 2)):
        for label, color, data in series:
            e, y = data[0], data[idx]
            m = y > 0
            ax.semilogy(e[m], y[m], color=color, lw=2, marker="o", ms=4,
                        label=label)
        ax.set_title(title, fontsize=11, color="#0b0b0b")
        ax.set_xlabel("Eb/N0 (dB)", color="#52514e")
        ax.grid(True, which="both", alpha=0.18, lw=0.5)
        ax.set_facecolor("#fcfcfb")
        for s in ax.spines.values():
            s.set_alpha(0.25)
    axes[0].set_ylabel("BER", color="#52514e")
    axes[0].legend(frameon=False, fontsize=8.5, loc="lower left")
    fig.suptitle("ESN training-target root cause: pre-PA target reproduces "
                 "the reference's floor; post-PA target beats it",
                 fontsize=10.5, color="#0b0b0b")
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
