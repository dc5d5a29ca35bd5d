"""Overlay our flagship 4x8 CDL curves against the reference's committed
numbers (BASELINE.md §1) in one figure.

    python tools/plot_vs_reference.py [results_ber.csv] [out.png]
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from validate_baseline import REF, REF_EBNO, load_csv  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "results/mimo_4x8_cdl_tpu_big/results_ber.csv"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        path.rsplit("/", 1)[0] + "/overlay_vs_reference.png"
    ebno, cols = load_csv(path)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(9, 6))
    series = [
        ("mmse_uncoded", "MMSE_uncoded", "tab:red"),
        ("esn_uncoded", "ESN_uncoded", "tab:green"),
        ("mmse_coded", "MMSE_coded", "tab:orange"),
        ("esn_coded", "ESN_coded", "tab:blue"),
    ]
    for ref_name, col, color in series:
        plt.semilogy(REF_EBNO, np.maximum(REF[ref_name], 1e-6), "--",
                     color=color, alpha=0.6,
                     label=f"{ref_name} (reference)")
        plt.semilogy(ebno, np.maximum(cols[col], 1e-6), "o-", color=color,
                     label=f"{ref_name} (ours, TPU)")
    plt.grid(True, which="both", ls=":")
    plt.xlabel("E_b/N_0 [dB]")
    plt.ylabel("BER")
    plt.title("4x8 MIMO CDL-B: this framework (TPU) vs reference results_ber.csv")
    plt.legend(fontsize=8)
    plt.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
