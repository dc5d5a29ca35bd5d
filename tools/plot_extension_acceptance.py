"""Committed comparison figure for the extension acceptance properties
(VERDICT r04 #6): 64-QAM sits where AWGN theory puts it, and the TDL
profiles realize their discretized power/delay law.

Left panel: exact quadrature BER for the framework's natural-label 16-
and 64-QAM (lines) vs measured Monte Carlo through ops/qam (markers).
Right column: per-tap mean power of draw_tdl_taps for TDL-A/B/C
(markers) vs the same-law numpy oracle (lines), small multiples so the
24-path profiles stay readable. Math shared with
tests/test_extension_acceptance.py.

    JAX_PLATFORMS=cpu python tools/plot_extension_acceptance.py
"""
from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# validated categorical palette (dataviz reference instance), fixed order
C1, C2, C3 = "#2a78d6", "#eb6834", "#1baf7a"
INK, MUTED = "#0b0b0b", "#52514e"


def main() -> None:
    import jax
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.ops import qam
    from esn_ofdm_mimo_tpu.ops.channel import (TDL_PROFILES,
                                               _tdl_split_matrix,
                                               draw_tdl_taps)
    sys.path.insert(0, os.path.join(_ROOT, "tests"))
    from test_extension_acceptance import _exact_qam_ber

    fig = plt.figure(figsize=(11, 5.2), facecolor="#fcfcfb")
    gs = fig.add_gridspec(3, 2, width_ratios=[1.35, 1.0], hspace=0.45,
                          wspace=0.28)

    # ---- (a) QAM BER: exact vs measured -------------------------------
    ax = fig.add_subplot(gs[:, 0])
    grid_db = np.linspace(4, 26, 45)
    for m, color, label, lx in ((4, C1, "16-QAM", 12.0),
                                (6, C2, "64-QAM", 21.0)):
        exact = [_exact_qam_ber(m, float(np.sqrt(0.5 / 10 ** (d / 10))))
                 for d in grid_db]
        ax.semilogy(grid_db, exact, color=color, lw=2, label=None)
        meas_db = np.arange(6, 25, 3.0)
        meas = []
        for i, d in enumerate(meas_db):
            key = jax.random.PRNGKey(1000 + 31 * m + i)
            kb, kn = jax.random.split(key)
            n_sym = 120_000
            bits = jax.random.randint(kb, (n_sym * m,), 0, 2,
                                      dtype=jnp.int32)
            x = qam.bits_to_symbols(bits, m)
            sigma = float(np.sqrt(0.5 / 10 ** (d / 10)))
            nz = jax.random.normal(kn, (n_sym, 2)) * sigma
            y = x + nz[:, 0] + 1j * nz[:, 1]
            rx = qam.symbols_to_bits_hard(y, m)
            meas.append(float(jnp.mean((rx != bits.astype(rx.dtype))
                                       .astype(jnp.float32))))
        meas = np.asarray(meas)
        keep = meas > 0
        ax.semilogy(meas_db[keep], meas[keep], "o", color=color, ms=7,
                    mec="#fcfcfb", mew=1.5)
        yl = _exact_qam_ber(m, float(np.sqrt(0.5 / 10 ** (lx / 10))))
        ax.annotate(label, (lx, yl), xytext=(6, 6),
                    textcoords="offset points", color=INK, fontsize=10)
    ax.set_ylim(1e-5, 0.5)
    ax.set_xlabel("Es/N0 (dB)", color=INK)
    ax.set_ylabel("uncoded BER", color=INK)
    ax.set_title("Natural-label square QAM on AWGN:\n"
                 "exact quadrature (line) vs measured ops/qam MC (dots)",
                 fontsize=11, color=INK)
    ax.grid(True, which="major", color="#e6e5e1", lw=0.6)
    ax.tick_params(colors=MUTED)
    for s in ax.spines.values():
        s.set_color("#d8d7d2")
    ax.legend(handles=[
        plt.Line2D([], [], color=INK, lw=2, label="exact (quadrature)"),
        plt.Line2D([], [], color=INK, marker="o", ls="", ms=7,
                   label="measured MC")], loc="lower left", frameon=False,
        fontsize=9)

    # ---- (b) TDL per-tap power: measured vs oracle --------------------
    fs, ds_samp = 30.72e6, 8.0
    ds_ns = ds_samp / fs * 1e9
    isi = 100
    colors = {"a": C1, "b": C2, "c": C3}
    keys = jax.random.split(jax.random.PRNGKey(7), 2048)
    for row, prof in enumerate("abc"):
        axp = fig.add_subplot(gs[row, 1])
        taps = jax.vmap(lambda k: draw_tdl_taps(k, 1, 1, isi, fs, ds_ns,
                                                prof))(keys)
        p_emp = np.array(jnp.mean(jnp.abs(taps[:, 0, 0]) ** 2, axis=0))
        p_emp = p_emp / p_emp.sum()
        d_norm, p_db = TDL_PROFILES[prof]
        p_lin = 10 ** (p_db / 10.0)
        p_lin /= p_lin.sum()
        S = _tdl_split_matrix(prof, isi, fs, ds_ns)
        rng = np.random.default_rng(1234)
        g = (rng.standard_normal((20000, len(p_lin)))
             + 1j * rng.standard_normal((20000, len(p_lin)))) / np.sqrt(2)
        p = np.abs((g * np.sqrt(p_lin)) @ S) ** 2
        p /= p.sum(-1, keepdims=True)
        p_oracle = p.mean(0)
        t = np.arange(isi)
        axp.semilogy(t, np.maximum(p_oracle, 1e-7), color=colors[prof],
                     lw=2)
        axp.semilogy(t, np.maximum(p_emp, 1e-7), "o", ms=3.5,
                     color=colors[prof], mec="#fcfcfb", mew=0.6)
        axp.set_ylim(1e-5, 1)
        axp.set_xlim(0, 85)
        axp.text(0.98, 0.82, f"TDL-{prof.upper()}", transform=axp.transAxes,
                 ha="right", color=INK, fontsize=10)
        axp.grid(True, which="major", color="#e6e5e1", lw=0.6)
        axp.tick_params(colors=MUTED, labelsize=8)
        for s in axp.spines.values():
            s.set_color("#d8d7d2")
        if row == 0:
            axp.set_title("38.901 TDL per-tap mean power:\n"
                          "oracle law (line) vs draw_tdl_taps (dots)",
                          fontsize=11, color=INK)
        if row == 2:
            axp.set_xlabel("tap index (samples; RMS DS = 8)", color=INK)
        axp.set_ylabel("power", color=MUTED, fontsize=8)

    outdir = os.path.join(_ROOT, "results", "extension_acceptance")
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "extension_acceptance.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
