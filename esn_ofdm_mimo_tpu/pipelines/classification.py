"""System-model-1 style classification pipeline: train a zoo of symbol
classifiers on LMMSE-equalized symbols over the 4x8 CDL channel.

Capability re-design of the reference's Sionna pipelines
(esn_ofdm_mimo_via_cdl.py / esn_via_cdl_all_model.py / system_model_01.ipynb):
their chain is BinarySource -> 5G-LDPC -> 16QAM -> ResourceGrid -> CDL ->
LS estimate -> LMMSE equalize -> flatten (re, im) -> 80/20 split -> seven
classifiers -> SER/BER (reference :240-299). Here the equalized-symbol
dataset is produced by this framework's own CDL-B link (comb pilots + LS/MMSE
estimate + LMMSE equalizer — statistically equivalent inputs; documented
deviation: the reference's exact OFDM resource grid with guard bands and its
5G-LDPC encoder are not modelled since the classifiers only ever see
equalized QAM symbols).

The seven detectors and their SER/BER reporting match SURVEY.md §2.2
(esn_via_cdl_all_model.py rows) and BASELINE.md §2.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ldpc import nr
from ..models import classifiers as clf
from ..models.zoo import train_classifier_cached as train_classifier
from ..ops.qam import (bits_to_index_msb, hard_demap_index,
                       hard_demap_index_gray, qam_bit_labels,
                       qam_bit_labels_msb, qam_constellation_gray)
from ..sm1 import cdl as sm1_cdl
from ..sm1 import grid as sm1_grid
from ..sm1 import rx as sm1_rx
from ..utils.rng import fold_key
from .common import data_bits_for_blocks, detect_data_symbols, synth_block


class SymbolDataset(NamedTuple):
    """Equalized symbols with true class labels, flattened to (re, im)."""
    x: jnp.ndarray        # (S, 2) float32 features
    labels: jnp.ndarray   # (S,) int32 true constellation indices


def make_equalized_dataset(cfg: SimConfig, ebno_db, bkeys) -> SymbolDataset:
    """Run blocks through the link, LMMSE-equalize, flatten (reference
    :252-281). Uses the MMSE detector's symbol estimates as features."""
    m = cfg.ofdm.bits_per_symbol
    state = synth_block(cfg, ebno_db, bkeys)
    code_bits, _ = data_bits_for_blocks(cfg, bkeys,
                                        cfg.data_symbols_per_block, None)
    data = detect_data_symbols(cfg, state, ebno_db, bkeys, code_bits,
                               detectors=("mmse",))
    z = data.X_hat["mmse"].reshape(-1)
    labels = hard_demap_index(data.X_true.reshape(-1), m)
    x = jnp.stack([z.real, z.imag], axis=-1).astype(jnp.float32)
    return SymbolDataset(x=x, labels=labels.astype(jnp.int32))


def make_equalized_dataset_sm1(ebno_db, key, batch: int = 64,
                               bits_per_symbol: int = 4,
                               coderate: float = 0.5,
                               rg: sm1_grid.ResourceGrid | None = None,
                               cdl_cfg: sm1_cdl.CdlConfig | None = None
                               ) -> SymbolDataset:
    """The reference's exact system-model-1 dataset (esn_ofdm_mimo_via_cdl.py
    :235-262): uniform coded bits -> Gray 16-QAM -> 5G resource grid with
    kronecker pilots -> spatial CDL-B -> per-RE channel + AWGN -> LS(nn)
    estimate -> unbiased LMMSE -> flatten (re, im) with MSB-first index
    labels.

    The reference instantiates an LDPC5GDecoder but never calls it
    (esn_ofdm_mimo_via_cdl.py:69 vs :241 — encoder-only path). Coded bits
    are 38.212-STRUCTURED NR LDPC codewords (surrogate base-graph shift
    data — see the ldpc/nr.py caveat: spec machinery exact, Tables
    5.3.2-2/-3 unavailable offline; NOT interoperable with a true 38.212
    codec) at the reference's exact call shape LDPC5GEncoder(k=D*m*R,
    n=D*m), with BG2, Z=160, 2Z systematic puncture, filler-skipping rate
    matching at rv0 — the SER anchors are the test that the codeword-bit
    law (uniform) is what reaches the classifiers (tests/test_sm1.py).
    """
    rg = rg or sm1_grid.ResourceGrid(num_streams=4)
    cdl_cfg = cdl_cfg or sm1_cdl.CdlConfig()
    m = bits_per_symbol
    k_bits, k_pil, k_ch, k_noise = jax.random.split(key, 4)

    no = sm1_grid.ebnodb2no(ebno_db, m, coderate, rg)
    S, D = rg.num_streams, rg.num_data_symbols
    code = nr.make_nr_ldpc(int(D * m * coderate), D * m)
    u = jax.random.randint(k_bits, (batch, S, code.k), 0, 2,
                           dtype=jnp.int32)
    c = nr.nr_encode(code, u).astype(jnp.int32)
    const = qam_constellation_gray(m)
    labels = bits_to_index_msb(c, m)                      # (B, S, D)
    x_data = const[labels]
    pilots = rg.pilot_grid(k_pil)
    x_rg = rg.map_data(x_data, pilots)                    # (B, S, T, F)

    # spatial CDL-B at the grid's symbol rate, evaluated on the effective bins
    a, tau = sm1_cdl.cdl_cir(cdl_cfg, k_ch, batch, rg.num_ofdm_symbols,
                             1.0 / rg.ofdm_symbol_duration)
    freqs = sm1_grid.subcarrier_frequencies(rg)[rg.effective_subcarriers]
    h = sm1_cdl.cir_to_ofdm_channel(freqs, a, tau)        # (B, T, F, U, S)

    # per-RE apply + AWGN: y[b,t,f,u] = sum_s h x + n  (ApplyOFDMChannel)
    xg = jnp.moveaxis(x_rg, 1, -1)                        # (B, T, F, S)
    y = jnp.sum(h * xg[..., None, :], axis=-1)
    nre, nim = jax.random.normal(k_noise, (2, *y.shape), jnp.float32)
    y = y + jnp.sqrt(no / 2.0) * (nre + 1j * nim)

    h_hat, err_var = sm1_rx.ls_nn_estimate(rg, y, pilots, no)
    x_hat, _ = sm1_rx.lmmse_equalize_grid(h_hat, y, err_var, no)
    # data REs only, stream-major flatten (B, S, T_data, F) like the
    # reference's x_hat tensor [batch, tx, stream, num_data_symbols]
    x_dat = rg.extract_data(jnp.moveaxis(x_hat, -1, 1))   # (B, S, D)
    z = x_dat.reshape(-1)
    x = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)
    return SymbolDataset(x=x, labels=labels.reshape(-1).astype(jnp.int32))


def split_dataset(ds: SymbolDataset, key, train_frac: float = 0.8
                  ) -> Tuple[SymbolDataset, SymbolDataset]:
    """Random 80/20 split (reference :268-281)."""
    S = ds.x.shape[0]
    perm = jax.random.permutation(key, S)
    n_tr = int(S * train_frac)
    tr, te = perm[:n_tr], perm[n_tr:]
    return (SymbolDataset(ds.x[tr], ds.labels[tr]),
            SymbolDataset(ds.x[te], ds.labels[te]))


def count_params(tree) -> int:
    """Trainable parameter count (the reference prints this table,
    esn_via_cdl_all_model.py:229-236 / BASELINE.md §2)."""
    return int(sum(np.prod(np.asarray(x).shape)
                   for x in jax.tree.leaves(tree)))


def _ser_ber(pred_idx, true_idx, m,
             msb: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    labels = qam_bit_labels_msb(m) if msb else qam_bit_labels(m)
    ser = jnp.mean((pred_idx != true_idx).astype(jnp.float32))
    ber = jnp.mean((labels[pred_idx] != labels[true_idx]).astype(jnp.float32))
    return ser, ber


# the reference ships two sm1 experiment variants with different baseline
# widths (SURVEY.md §2.2): esn_via_cdl_all_model.py ("wide", ~600 units,
# :125-182) and esn_ofdm_mimo_via_cdl.py ("narrow", :123-178)
ZOO_VARIANTS = {
    "wide": dict(deep_hidden=600, fnn_width=600, cnn_channels=128,
                 cnn_hidden=600, rnn_hidden=600),
    "narrow": dict(deep_hidden=128, fnn_width=32, cnn_channels=16,
                   cnn_hidden=64, rnn_hidden=64),
}


def train_and_evaluate_zoo(cfg: SimConfig, train: SymbolDataset,
                           test: SymbolDataset, key,
                           epochs: int = 200,
                           gray: bool = False,
                           variant: str = "wide",
                           collect_preds: bool = False):
    """Train all seven detectors, return {model: {ser, ber}} on the test set
    (reference SER/BER tables, esn_via_cdl_all_model.py:453-472).

    gray=True evaluates against the system-model-1 label convention
    (Gray/Sionna constellation, MSB-first bit labels). variant selects the
    reference's baseline widths (ZOO_VARIANTS). collect_preds=True also
    returns {model: predicted test indices} (numpy) for the reference's
    per-model constellation scatters (esn_via_cdl_all_model.py:400-437)."""
    widths = ZOO_VARIANTS[variant]
    m = cfg.ofdm.bits_per_symbol
    n_classes = 2 ** m
    results = {}
    preds: Dict[str, np.ndarray] = {}

    def _keep(name, idx):
        if collect_preds:
            preds[name] = np.asarray(idx, dtype=np.int32)

    # traditional nearest-point demapper (jitted as one program: eager
    # complex ops would hit the axon backend's unimplemented c64 transfers)
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def _trad(x, labels, m, gray):
        z = x[:, 0] + 1j * x[:, 1]
        idx = (hard_demap_index_gray(z, m) if gray
               else clf.traditional_demap(z, m))
        return idx, *_ser_ber(idx, labels, m, msb=gray)

    idx, ser, ber = _trad(test.x, test.labels, m, gray)
    results["traditional"] = {"ser": float(ser), "ber": float(ber)}
    _keep("traditional", idx)

    @functools.partial(jax.jit, static_argnums=(0, 3, 5))
    def _pred_eval(apply_fn, params, x, m, labels, msb):
        pred = jnp.argmax(apply_fn(params, x), axis=-1)
        return pred, *_ser_ber(pred, labels, m, msb=msb)

    def eval_logits(name, apply_fn, params):
        pred, ser, ber = _pred_eval(apply_fn, params, test.x, m,
                                    test.labels, gray)
        _keep(name, pred)
        return {"ser": float(ser), "ber": float(ber)}

    # ESN single-step (random features + trained softmax readout); the
    # module-level full-param applies keep jit caches warm across SNRs
    k1, k2, k3, k4, k5, k6, key = jax.random.split(key, 7)
    p_esn = clf.esn_classifier_init(k1, n_res=600, n_classes=n_classes)
    esn_params = {"W_in": p_esn.W_in, "W_out": p_esn.W_out,
                  "b_out": p_esn.b_out}
    # convex (linear-in-trainables) readout: 10x full-batch Adam steps at
    # lr 1e-2 reach the optimum the reference approaches with 7.7k minibatch
    # steps at lr 1e-4 (Adam + l2 on W_out, esn_via_cdl_all_model.py:205-213;
    # tf.nn.l2_loss = sum(w^2)/2, hence l2 = lambda/2 here)
    tr = train_classifier(clf.esn_classifier_apply_full, esn_params,
                          train.x, train.labels, epochs=10 * epochs, lr=1e-2,
                          l2=5e-5, l2_keys=("W_out",))
    results["esn"] = eval_logits("esn", clf.esn_classifier_apply_full,
                                 tr.params)
    results["esn"]["params"] = count_params(clf.esn_classifier_trainable(p_esn))

    # DeepESN (random features -> trainable ReLU head)
    p_desn = clf.deep_esn_init(k2, n_res=600, n_hidden=widths["deep_hidden"],
                               n_classes=n_classes)
    desn_params = {"W_in": p_desn.W_in, "hidden": p_desn.hidden}
    tr = train_classifier(clf.deep_esn_apply_full, desn_params,
                          train.x, train.labels, epochs=5 * epochs, lr=3e-3,
                          l2=5e-5, l2_keys=("hidden",))
    results["deep_esn"] = eval_logits("deep_esn", clf.deep_esn_apply_full,
                                      tr.params)
    results["deep_esn"]["params"] = count_params(p_desn.hidden)

    # FNN / CNN / RNN at the variant's widths
    fnn_init = functools.partial(clf.fnn_classifier_init,
                                 widths=(widths["fnn_width"],))
    cnn_init = functools.partial(clf.cnn_classifier_init,
                                 channels=widths["cnn_channels"],
                                 n_hidden=widths["cnn_hidden"])
    rnn_init = functools.partial(clf.rnn_classifier_init,
                                 n_hidden=widths["rnn_hidden"])
    for name, init_fn, apply_fn, kk in (
            ("fnn", fnn_init, clf.fnn_classifier_apply, k3),
            ("cnn", cnn_init, clf.cnn_classifier_apply, k4),
            ("rnn", rnn_init, clf.rnn_classifier_apply, k5)):
        params = init_fn(kk, n_classes=n_classes)
        tr = train_classifier(apply_fn, params, train.x, train.labels,
                              epochs=epochs)
        results[name] = eval_logits(name, apply_fn, tr.params)
        results[name]["params"] = count_params(params)

    # ELM closed form (fit + eval in one jitted program)
    @functools.partial(jax.jit, static_argnums=(4, 5, 7))
    def _elm_fit_eval(p0, xtr, ytr, xte, n_classes, m, yte, msb):
        p = clf.elm_fit_classifier(p0, xtr, ytr, n_classes)
        idx = clf.elm_classifier_predict(p, xte)
        return idx, *_ser_ber(idx, yte, m, msb=msb)

    p_elm0 = clf.elm_classifier_init(k6, n_hidden=600, n_classes=n_classes)
    idx, ser, ber = _elm_fit_eval(p_elm0, train.x, train.labels, test.x,
                                  n_classes, m, test.labels, gray)
    results["elm"] = {"ser": float(ser), "ber": float(ber),
                      "params": count_params(p_elm0.W2)}
    _keep("elm", idx)

    if collect_preds:
        return results, preds
    return results


def run_classification_experiment(cfg: SimConfig, blocks: int = 8,
                                  epochs: int = 200, seed: int = 0,
                                  frontend: str = "sm1", batch: int = 64,
                                  variant: str = "wide",
                                  collect_scatter: bool = False):
    """Full SER/BER-vs-SNR sweep of the classifier zoo.

    frontend="sm1" (default) reproduces the reference's Sionna operating
    point (5G resource grid + spatial CDL-B + LS(nn) + LMMSE; `batch` is
    the reference's batch_size_sim=64). frontend="sm2" keeps the original
    deviation: this framework's own comb-pilot CDL link as the dataset
    source (`blocks` coherence blocks per SNR).

    collect_scatter=True also returns the top-SNR test set and each model's
    predicted indices on it (for the reference's per-model colored
    constellation scatters, esn_via_cdl_all_model.py:400-437):
    returns (results, {"ebno_db", "x", "labels", "preds"}).
    """
    from ..utils.rng import block_keys
    root = jax.random.PRNGKey(seed)
    gray = frontend == "sm1"
    out = {}
    scatter = None
    sm1_builder = jax.jit(functools.partial(
        make_equalized_dataset_sm1, batch=batch,
        bits_per_symbol=cfg.ofdm.bits_per_symbol))
    for jj, ebno in enumerate(cfg.ebno_db):
        if frontend == "sm1":
            ds = sm1_builder(jnp.float32(ebno), fold_key(root, 55, jj))
        else:
            bkeys = block_keys(root, jj, jnp.arange(blocks, dtype=jnp.uint32))
            ds = jax.jit(lambda e, k: make_equalized_dataset(cfg, e, k))(
                jnp.float32(ebno), bkeys)
        ktr = fold_key(root, 77, jj)
        train, test = split_dataset(ds, ktr)
        last = collect_scatter and jj == len(cfg.ebno_db) - 1
        res = train_and_evaluate_zoo(cfg, train, test,
                                     fold_key(root, 88, jj),
                                     epochs=epochs, gray=gray,
                                     variant=variant, collect_preds=last)
        if last:
            res, preds = res
            scatter = {"ebno_db": float(ebno),
                       "x": np.asarray(test.x),
                       "labels": np.asarray(test.labels, dtype=np.int32),
                       "preds": preds}
        out[float(ebno)] = res
    if collect_scatter:
        return out, scatter
    return out
