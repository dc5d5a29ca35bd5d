"""Diagnose the sm1 0 dB SER anchor gap (VERDICT round-1 item #1).

Reference anchors (system_model_01.ipynb cell 2, BASELINE.md §2):
  0 dB : ESN 0.3763  DeepESN 0.3148  ELM 0.3246
  10 dB: ESN 0.0520  DeepESN 0.0186  ELM 0.0170
  20 dB: ESN 0.0015  DeepESN 0.00031 ELM 0.00013

Our round-1 numbers: all trainable models ~0.389-0.391 at 0 dB (traditional
0.4019), i.e. the reference's best models are ~7% absolute better at 0 dB
and 2-5x better at 20 dB. This script decomposes the gap on OUR frontend:

  1. traditional (nearest-point) SER with LS-nn estimates  — the dataset SER
  2. traditional SER with PERFECT CSI                       — estimation cost
  3. channel-estimation NMSE split: pilot symbols vs mid-frame (Doppler)
  4. nonparametric Bayes-error estimate of the 2-d (re,im) dataset
     (2-d histogram likelihood classifier trained on many extra batches)
  5. heteroscedastic per-class Gaussian classifier (captures multiplicative
     estimate-error structure that nearest-point cannot)

If (4) on our dataset sits well above the reference's 0.315 anchor, our
0 dB distribution is materially noisier than the reference's and no
classifier can close it -> frontend operating-point difference. If (4)
reaches ~0.31-0.33, our *training* is what leaves the gap.

Run on CPU: JAX_PLATFORMS=cpu python tools/diag_sm1.py
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import esn_ofdm_mimo_tpu  # noqa: F401  (sets platform/precision config)
import jax
import jax.numpy as jnp
import numpy as np

from esn_ofdm_mimo_tpu.ldpc.code import make_qc_ldpc
from esn_ofdm_mimo_tpu.ldpc.encode import ldpc_encode
from esn_ofdm_mimo_tpu.ops.qam import (bits_to_index_msb,
                                       hard_demap_index_gray,
                                       qam_constellation_gray)
from esn_ofdm_mimo_tpu.sm1 import cdl as sm1_cdl
from esn_ofdm_mimo_tpu.sm1 import grid as sm1_grid
from esn_ofdm_mimo_tpu.sm1 import rx as sm1_rx
from esn_ofdm_mimo_tpu.utils.rng import fold_key

RG = sm1_grid.ResourceGrid(num_streams=4)
CDL_CFG = sm1_cdl.CdlConfig()
M_BITS = 4
CODE = make_qc_ldpc(RG.num_data_symbols * M_BITS, dv=4, dc=8, seed=0)


@functools.partial(jax.jit, static_argnums=(2,))
def build_genie(ebno_db, key, batch):
    """make_equalized_dataset_sm1 internals + genie h / perfect-CSI x_hat."""
    rg, cdl_cfg, m = RG, CDL_CFG, M_BITS
    k_bits, k_pil, k_ch, k_noise = jax.random.split(key, 4)
    no = sm1_grid.ebnodb2no(ebno_db, m, 0.5, rg)
    S, D = rg.num_streams, rg.num_data_symbols
    u = jax.random.randint(k_bits, (batch, S, CODE.k), 0, 2, dtype=jnp.int32)
    c = ldpc_encode(CODE, u).astype(jnp.int32)
    const = qam_constellation_gray(m)
    labels = bits_to_index_msb(c, m)
    x_data = const[labels]
    pilots = rg.pilot_grid(k_pil)
    x_rg = rg.map_data(x_data, pilots)
    a, tau = sm1_cdl.cdl_cir(cdl_cfg, k_ch, batch, rg.num_ofdm_symbols,
                             1.0 / rg.ofdm_symbol_duration)
    freqs = sm1_grid.subcarrier_frequencies(rg)[rg.effective_subcarriers]
    h = sm1_cdl.cir_to_ofdm_channel(freqs, a, tau)        # (B,T,F,U,S)
    xg = jnp.moveaxis(x_rg, 1, -1)
    y = jnp.sum(h * xg[..., None, :], axis=-1)
    nre, nim = jax.random.normal(k_noise, (2, *y.shape), jnp.float32)
    y = y + jnp.sqrt(no / 2.0) * (nre + 1j * nim)

    h_hat, err_var = sm1_rx.ls_nn_estimate(rg, y, pilots, no)
    x_hat, no_eff = sm1_rx.lmmse_equalize_grid(h_hat, y, err_var, no)
    x_gen, no_eff_g = sm1_rx.lmmse_equalize_grid(h, y, jnp.float32(0.0), no)

    x_dat = rg.extract_data(jnp.moveaxis(x_hat, -1, 1))   # (B,S,D)
    x_dat_g = rg.extract_data(jnp.moveaxis(x_gen, -1, 1))
    ne_dat = rg.extract_data(jnp.moveaxis(no_eff, -1, 1))
    # estimation NMSE per OFDM symbol index (Doppler structure)
    err = jnp.abs(h_hat - h) ** 2
    nmse_t = jnp.mean(err, axis=(0, 2, 3, 4)) / jnp.mean(jnp.abs(h) ** 2)
    return dict(labels=labels, x=x_dat, x_genie=x_dat_g, no=no,
                nmse_t=nmse_t, no_eff=ne_dat)


def ser_nearest(x, labels):
    pred = hard_demap_index_gray(x.reshape(-1), M_BITS)
    return float(jnp.mean((pred != labels.reshape(-1)).astype(jnp.float32)))


def hist_classifier(xtr, ytr, xte, yte, nbins=160, lim=2.2):
    """2-d histogram likelihood classifier == nonparametric Bayes estimate."""
    def binned(x):
        ij = np.clip(((x + lim) / (2 * lim) * nbins).astype(np.int64),
                     0, nbins - 1)
        return ij[:, 0] * nbins + ij[:, 1]
    btr = binned(xtr)
    counts = np.zeros((nbins * nbins, 16), np.float64)
    np.add.at(counts, (btr, ytr), 1.0)
    pred = counts.argmax(axis=1)[binned(xte)]
    return float(np.mean(pred != yte))


def gauss_classifier(xtr, ytr, xte, yte):
    """Per-class full-covariance Gaussian (heteroscedastic QDA)."""
    scores = np.zeros((len(xte), 16), np.float64)
    for cc in range(16):
        xc = xtr[ytr == cc]
        mu = xc.mean(axis=0)
        cov = np.cov(xc.T) + 1e-9 * np.eye(2)
        ic = np.linalg.inv(cov)
        d = xte - mu
        scores[:, cc] = -0.5 * np.einsum("ni,ij,nj->n", d, ic, d) \
            - 0.5 * np.log(np.linalg.det(cov))
    return float(np.mean(scores.argmax(axis=1) != yte))


def main():
    root = jax.random.PRNGKey(0)
    for jj, ebno in enumerate([0.0, 10.0, 20.0]):
        g = build_genie(jnp.float32(ebno), fold_key(root, 55, jj), 64)
        labels = np.asarray(g["labels"]).reshape(-1)
        x = np.asarray(g["x"]).reshape(-1)
        xg = np.asarray(g["x_genie"]).reshape(-1)
        ser_ls = ser_nearest(g["x"], g["labels"])
        ser_gen = ser_nearest(g["x_genie"], g["labels"])
        nmse_t = np.asarray(g["nmse_t"])
        ne = np.asarray(g["no_eff"]).reshape(-1)
        print(f"\n=== Eb/N0 = {ebno:.0f} dB  (no={float(g['no']):.5f}) ===")
        print(f"traditional SER  LS-nn: {ser_ls:.4f}   perfect-CSI: {ser_gen:.4f}")
        print(f"est NMSE by OFDM symbol: pilot t=2/11: {nmse_t[2]:.4f}/"
              f"{nmse_t[11]:.4f}  worst mid t=6/7: {nmse_t[6]:.4f}/{nmse_t[7]:.4f}")
        print(f"no_eff (post-LMMSE): median {np.median(ne):.4f} "
              f"mean {ne.mean():.4f} p90 {np.quantile(ne, .9):.4f}")

        # Bayes estimate needs lots of i.i.d. extra batches for training
        xtr_l, ytr_l = [], []
        for r in range(10):
            gg = build_genie(jnp.float32(ebno), fold_key(root, 1000 + r, jj), 64)
            zz = np.asarray(gg["x"]).reshape(-1)
            xtr_l.append(np.stack([zz.real, zz.imag], -1))
            ytr_l.append(np.asarray(gg["labels"]).reshape(-1))
        xtr = np.concatenate(xtr_l)
        ytr = np.concatenate(ytr_l)
        xte = np.stack([x.real, x.imag], -1)
        ser_hist = hist_classifier(xtr, ytr, xte, labels)
        ser_qda = gauss_classifier(xtr[:400000], ytr[:400000], xte, labels)
        print(f"Bayes-estimate (hist, {len(xtr)} train): {ser_hist:.4f}   "
              f"QDA: {ser_qda:.4f}")
    print("\nreference anchors: 0dB ESN .3763 DeepESN .3148 ELM .3246 | "
          "10dB .0520/.0186/.0170 | 20dB .0015/.00031/.00013")


if __name__ == "__main__" and not any(os.environ.get(v) for v in ("DIAG_LEAK", "DIAG_SYNTH", "DIAG_CEIL", "DIAG_SPREAD")):
    main()


def main_leakage():
    """Same-batch 80/20 split (the reference's actual protocol) vs the
    fresh-batch marginal: does batch-conditional structure beat marginal
    Bayes at 0 dB?"""
    root = jax.random.PRNGKey(0)
    for jj, ebno in enumerate([0.0, 10.0]):
        g = build_genie(jnp.float32(ebno), fold_key(root, 55, jj), 64)
        labels = np.asarray(g["labels"]).reshape(-1)
        z = np.asarray(g["x"]).reshape(-1)
        x = np.stack([z.real, z.imag], -1)
        rng = np.random.RandomState(1)
        idx = rng.permutation(len(x))
        ntr = int(0.8 * len(x))
        tr, te = idx[:ntr], idx[ntr:]
        ser_trad = float(np.mean(
            np.asarray(hard_demap_index_gray(jnp.asarray(z[te]), M_BITS))
            != labels[te]))
        h_same = hist_classifier(x[tr], labels[tr], x[te], labels[te])
        h_same_c = hist_classifier(x[tr], labels[tr], x[te], labels[te],
                                   nbins=80)
        q_same = gauss_classifier(x[tr], labels[tr], x[te], labels[te])
        print(f"{ebno:.0f} dB same-batch split: trad {ser_trad:.4f}  "
              f"hist160 {h_same:.4f}  hist80 {h_same_c:.4f}  QDA {q_same:.4f}")


if __name__ == "__main__" and os.environ.get("DIAG_LEAK"):
    main_leakage()


@functools.partial(jax.jit, static_argnums=(3,))
def build_synth_err(ebno_db, eps, key, batch):
    """Genie channel + synthetic estimation error of variance eps per coeff:
    isolates 'how much estimation error do the reference anchors imply'."""
    rg, cdl_cfg, m = RG, CDL_CFG, M_BITS
    k_bits, k_pil, k_ch, k_noise, k_err = jax.random.split(key, 5)
    no = sm1_grid.ebnodb2no(ebno_db, m, 0.5, rg)
    S, D = rg.num_streams, rg.num_data_symbols
    u = jax.random.randint(k_bits, (batch, S, CODE.k), 0, 2, dtype=jnp.int32)
    c = ldpc_encode(CODE, u).astype(jnp.int32)
    const = qam_constellation_gray(m)
    labels = bits_to_index_msb(c, m)
    x_data = const[labels]
    pilots = rg.pilot_grid(k_pil)
    x_rg = rg.map_data(x_data, pilots)
    a, tau = sm1_cdl.cdl_cir(cdl_cfg, k_ch, batch, rg.num_ofdm_symbols,
                             1.0 / rg.ofdm_symbol_duration)
    freqs = sm1_grid.subcarrier_frequencies(rg)[rg.effective_subcarriers]
    h = sm1_cdl.cir_to_ofdm_channel(freqs, a, tau)
    xg = jnp.moveaxis(x_rg, 1, -1)
    y = jnp.sum(h * xg[..., None, :], axis=-1)
    nre, nim = jax.random.normal(k_noise, (2, *y.shape), jnp.float32)
    y = y + jnp.sqrt(no / 2.0) * (nre + 1j * nim)
    ere, eim = jax.random.normal(k_err, (2, *h.shape), jnp.float32)
    h_hat = h + jnp.sqrt(eps / 2.0) * (ere + 1j * eim)
    x_hat, _ = sm1_rx.lmmse_equalize_grid(h_hat, y, eps, no)
    x_dat = rg.extract_data(jnp.moveaxis(x_hat, -1, 1))
    return dict(labels=labels, x=x_dat)


def main_synth():
    root = jax.random.PRNGKey(3)
    for jj, ebno in enumerate([0.0, 10.0, 20.0]):
        no = float(sm1_grid.ebnodb2no(jnp.float32(ebno), 4, 0.5, RG))
        row = []
        for eps_mult in [0.0, 0.0625, 0.125, 0.25, 0.5]:
            eps = eps_mult * no
            g = build_synth_err(jnp.float32(ebno), jnp.float32(eps),
                                fold_key(root, 7, jj), 64)
            row.append(f"eps={eps_mult:g}*no: {ser_nearest(g['x'], g['labels']):.5f}")
        print(f"{ebno:.0f} dB trad SER: " + "  ".join(row))
    print("targets: 0dB ~.315-.325, 10dB ~.017-.019, 20dB ~.00013-.0003")


if __name__ == "__main__" and os.environ.get("DIAG_SYNTH"):
    main_synth()


def genie_mixture_classifier(xtr, ytr, gtr, xte, yte, n_groups):
    """Leakage-ceiling classifier: fit one Gaussian per (group, class) from
    TRAIN points (group = channel-realization x stream, known at fit time),
    classify test x by argmax_c sum_g N(x; mu_gc, Sig_g-ish). Valid per-symbol
    classifier (function of x only); measures how much the same-batch split
    lets a high-capacity model exploit this batch's specific clusters."""
    mu = np.zeros((n_groups, 16, 2))
    var = np.full((n_groups, 16), 0.3)
    cnt = np.zeros((n_groups, 16))
    np.add.at(mu, (gtr, ytr), xtr)
    np.add.at(cnt, (gtr, ytr), 1.0)
    ok = cnt > 3
    mu[ok] /= cnt[ok][:, None]
    # per-(group,class) isotropic variance
    d2 = np.sum((xtr - mu[gtr, ytr]) ** 2, axis=1)
    ssq = np.zeros((n_groups, 16))
    np.add.at(ssq, (gtr, ytr), d2)
    var[ok] = np.maximum(ssq[ok] / (2 * cnt[ok]), 1e-5)
    # score test points in chunks: log sum_g w N(x; mu_gc, var_gc)
    pred = np.zeros(len(xte), np.int64)
    w = np.where(ok, 1.0, 0.0)
    for lo in range(0, len(xte), 4096):
        x = xte[lo:lo + 4096]
        d2 = np.sum((x[:, None, None, :] - mu[None]) ** 2, axis=-1)
        logp = -d2 / (2 * var[None]) - np.log(var[None]) + \
            np.log(w[None] + 1e-300)
        m = logp.max(axis=1)                 # (n, 16) max over groups
        lse = m + np.log(np.sum(np.exp(logp - m[:, None, :]), axis=1))
        pred[lo:lo + 4096] = lse.argmax(axis=1)
    return float(np.mean(pred != yte))


def main_ceiling():
    root = jax.random.PRNGKey(0)
    B = 64
    for jj, ebno in enumerate([0.0, 10.0, 20.0]):
        g = build_genie(jnp.float32(ebno), fold_key(root, 55, jj), B)
        labels = np.asarray(g["labels"]).reshape(-1)          # (B*S*D,)
        z = np.asarray(g["x"]).reshape(-1)
        x = np.stack([z.real, z.imag], -1)
        S, D = RG.num_streams, RG.num_data_symbols
        # group ids: (b, s) and finer (b, s, f-octile)
        b_id = np.repeat(np.arange(B), S * D)
        s_id = np.tile(np.repeat(np.arange(S), D), B)
        f_id = np.tile(np.arange(D) % RG.num_effective_subcarriers // 8, B * S)
        g_bs = b_id * S + s_id
        g_bsf = g_bs * 8 + f_id
        rng = np.random.RandomState(1)
        idx = rng.permutation(len(x))
        tr, te = idx[:int(0.8 * len(x))], idx[int(0.8 * len(x)):]
        ser_bs = genie_mixture_classifier(x[tr], labels[tr], g_bs[tr],
                                          x[te], labels[te], B * S)
        ser_bsf = genie_mixture_classifier(x[tr], labels[tr], g_bsf[tr],
                                           x[te], labels[te], B * S * 8)
        print(f"{ebno:.0f} dB leakage ceiling: mix(b,s) {ser_bs:.5f}  "
              f"mix(b,s,f/8) {ser_bsf:.5f}")
    print("ref anchors: 0dB .315/.325  10dB .017/.019  20dB .00013/.0003")


if __name__ == "__main__" and os.environ.get("DIAG_CEIL"):
    main_ceiling()


def main_spread():
    """Batch-to-batch variance: each reference anchor is ONE 64-realization
    batch + ONE training run. Per-realization SER spread over 256 i.i.d.
    realizations gives sigma(batch of 64) = sigma(realization)/8."""
    root = jax.random.PRNGKey(9)
    for jj, ebno in enumerate([0.0, 10.0, 20.0]):
        per_real = []
        for r in range(4):
            g = build_genie(jnp.float32(ebno), fold_key(root, 300 + r, jj), 64)
            lab = np.asarray(g["labels"])            # (B,S,D)
            z = np.asarray(g["x"])
            pred = np.asarray(hard_demap_index_gray(
                jnp.asarray(z.reshape(-1)), M_BITS)).reshape(lab.shape)
            per_real.append((pred != lab).mean(axis=(1, 2)))  # (B,)
        pr = np.concatenate(per_real)
        mean, sd = pr.mean(), pr.std(ddof=1)
        print(f"{ebno:.0f} dB: per-realization SER mean {mean:.5f} "
              f"sd {sd:.5f}  -> batch-of-64 sd {sd/8:.5f}  "
              f"(range {pr.min():.5f}..{pr.max():.5f})")


if __name__ == "__main__" and os.environ.get("DIAG_SPREAD"):
    main_spread()
