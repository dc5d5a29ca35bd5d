"""System-model-1 frontend tests: Gray QAM, resource grid, spatial CDL-B,
LS(nn) estimator, LMMSE equalizer, and the end-to-end dataset operating
point (reference esn_ofdm_mimo_via_cdl.py:29-76, 235-262)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_ofdm_mimo_tpu.ops.qam import (bits_to_index_msb, bits_to_symbols_gray,
                                       hard_demap_index_gray,
                                       qam_bit_labels_msb,
                                       qam_constellation_gray)
from esn_ofdm_mimo_tpu.sm1 import cdl as C
from esn_ofdm_mimo_tpu.sm1 import grid as G
from esn_ofdm_mimo_tpu.sm1 import rx as R


# ---------------- Gray QAM (Sionna convention) ----------------


def test_gray_qam_unit_power_and_known_points():
    c = np.asarray(qam_constellation_gray(4))
    assert np.isclose(np.mean(np.abs(c) ** 2), 1.0, atol=1e-6)
    s = 1 / np.sqrt(10)
    # index 0 = bits 0000 -> (1+1j)/sqrt(10); index 5 = 0101 -> real bits
    # (0,0)->1, imag bits (1,1)->-3
    assert np.isclose(c[0], (1 + 1j) * s, atol=1e-6)
    assert np.isclose(c[5], (1 - 3j) * s, atol=1e-6)
    # QPSK: 1 bit/axis, Gray trivially (1-2b)
    q = np.asarray(qam_constellation_gray(2))
    assert np.allclose(q, np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j])
                       / np.sqrt(2), atol=1e-6)


def test_gray_qam_adjacency_is_gray():
    """Nearest horizontal/vertical neighbours differ in exactly one bit."""
    c = np.asarray(qam_constellation_gray(4))
    lab = np.asarray(qam_bit_labels_msb(4))
    step = np.min(np.abs(c[None] - c[:, None])[np.triu_indices(16, 1)])
    for i in range(16):
        for j in range(16):
            d = abs(c[i] - c[j])
            if 0 < d < step * 1.01:
                assert (lab[i] != lab[j]).sum() == 1


def test_bits_roundtrip_msb():
    key = jax.random.PRNGKey(0)
    bits = jax.random.randint(key, (3, 5 * 4), 0, 2)
    idx = bits_to_index_msb(bits, 4)
    syms = bits_to_symbols_gray(bits, 4)
    assert np.array_equal(np.asarray(hard_demap_index_gray(syms, 4)),
                          np.asarray(idx))
    assert np.array_equal(np.asarray(qam_bit_labels_msb(4))[np.asarray(idx)]
                          .reshape(3, -1), np.asarray(bits))


# ---------------- resource grid ----------------


@pytest.fixture(scope="module")
def rg():
    return G.ResourceGrid(num_streams=4)


def test_grid_counts(rg):
    # 76 - 5 - 6 guards - DC = 64; 12 data symbols (pilots at 2, 11)
    assert rg.num_effective_subcarriers == 64
    assert rg.num_data_symbols == 768
    assert rg.num_resource_elements == 896
    eff = rg.effective_subcarriers
    assert eff[0] == 5 and eff[-1] == 69 and 38 not in eff
    assert np.isclose(rg.ofdm_symbol_duration, 82 / (76 * 15e3))


def test_ebnodb2no_constant(rg):
    # (768/896)*(76/82)/(r*m) with r=0.5, m=4 -> 0.397328 at 0 dB
    # (direction pinned against the reference's committed SER anchors)
    no = float(G.ebnodb2no(0.0, 4, 0.5, rg))
    assert np.isclose(no, (768 / 896) * (76 / 82) / 2.0, rtol=1e-5)
    assert np.isclose(float(G.ebnodb2no(10.0, 4, 0.5, rg)), no / 10, rtol=1e-5)


def test_kronecker_pilots(rg):
    pil = np.asarray(rg.pilot_grid(jax.random.PRNGKey(3)))
    mask = rg.pilot_mask()
    # streams are frequency-orthogonal on pilot symbols; energy = S off a
    # whole-sequence normalization (per-stream symbol energy preserved)
    assert np.all(np.abs(pil[~mask]) == 0)
    assert np.allclose(np.abs(pil[mask]) ** 2, 4.0, atol=1e-5)
    occupied = mask.sum(axis=0)  # every pilot-symbol RE used exactly once
    assert np.all(occupied[2] == 1) and np.all(occupied[11] == 1)
    assert occupied.sum() == 2 * 64
    # per-stream per-pilot-symbol energy equals a data symbol's (64 REs x 1)
    assert np.isclose((np.abs(pil[0, 2]) ** 2).sum(), 64.0, atol=1e-3)


def test_grid_map_extract_roundtrip(rg):
    key = jax.random.PRNGKey(1)
    x = (jax.random.normal(key, (2, 4, 768)) +
         1j * jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 768))
         ).astype(jnp.complex64)
    pil = rg.pilot_grid(jax.random.PRNGKey(3))
    grid = rg.map_data(x, pil)
    assert grid.shape == (2, 4, 14, 64)
    # pilot symbols contain exactly the pilots
    assert np.allclose(np.asarray(grid[:, :, 2]), np.asarray(pil[None, :, 2]))
    back = rg.extract_data(grid)
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-6)


# ---------------- spatial CDL-B ----------------


def test_cdl_tables_match_reference_tdlb():
    """Delays/powers coincide with the TDL-B table the reference hardcodes
    (Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:126-138) — 38.901 derives TDL-B
    from CDL-B."""
    assert len(C.CDLB_DELAYS) == 23 and len(C.CDLB_POWERS_DB) == 23
    assert C.CDLB_DELAYS[1] == 0.1072 and C.CDLB_DELAYS[-1] == 4.7834
    assert C.CDLB_POWERS_DB[5] == -1.2 and C.CDLB_POWERS_DB[20] == -14.9
    for t in (C.CDLB_AOD, C.CDLB_AOA, C.CDLB_ZOD, C.CDLB_ZOA):
        assert len(t) == 23


def test_cdl_cir_shapes_and_stats():
    cfg = C.CdlConfig()
    a, tau = C.cdl_cir(cfg, jax.random.PRNGKey(0), 8, 14, 1 / 71.9e-6)
    assert a.shape == (8, 8, 4, 23, 14) and tau.shape == (23,)
    assert np.isclose(float(tau[-1]), 4.7834 * 300e-9, rtol=1e-5)
    # relative per-cluster mean powers follow the table (averaged over
    # batch/antennas; element patterns reweight, so only rank-correlate)
    p = np.mean(np.abs(np.asarray(a)) ** 2, axis=(0, 1, 2, 4))
    strongest = np.argsort(p)[-3:]
    assert 0 in strongest or 5 in strongest or 15 in strongest
    # Doppler at 10 m/s: adjacent-symbol correlation very high but < 1
    a0 = np.asarray(a)[:, 0, 0, 0, :]
    corr = np.abs(np.vdot(a0[:, 0], a0[:, 1])) / (
        np.linalg.norm(a0[:, 0]) * np.linalg.norm(a0[:, 1]))
    assert 0.99 < corr <= 1.0 + 1e-6


def test_cdl_freq_channel_normalized_and_selective():
    cfg = C.CdlConfig()
    a, tau = C.cdl_cir(cfg, jax.random.PRNGKey(1), 4, 14, 1 / 71.9e-6)
    freqs = np.arange(-32, 32) * 15e3
    h = C.cir_to_ofdm_channel(freqs, a, tau)
    assert h.shape == (4, 14, 64, 8, 4)
    en = np.mean(np.abs(np.asarray(h)) ** 2, axis=(1, 2, 3, 4))
    assert np.allclose(en, 1.0, atol=1e-4)   # per-example normalization
    hf = np.asarray(h)[0, 0, :, 0, 0]
    c_adj = np.abs(np.vdot(hf[:-1], hf[1:])) / (
        np.linalg.norm(hf[:-1]) * np.linalg.norm(hf[1:]))
    c_far = np.abs(np.vdot(hf[:32], hf[32:])) / (
        np.linalg.norm(hf[:32]) * np.linalg.norm(hf[32:]))
    assert c_adj > 0.98 and c_far < 0.95    # 300 ns DS frequency selectivity


def test_cdl_deterministic_per_key():
    cfg = C.CdlConfig()
    a1, _ = C.cdl_cir(cfg, jax.random.PRNGKey(7), 2, 4, 1 / 71.9e-6)
    a2, _ = C.cdl_cir(cfg, jax.random.PRNGKey(7), 2, 4, 1 / 71.9e-6)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


# ---------------- receiver ----------------


def test_ls_nn_exact_on_flat_channel(rg):
    """Frequency-flat, time-constant channel + no noise -> LS(nn) exact."""
    key = jax.random.PRNGKey(2)
    U, S, T, F = 8, 4, 14, 64
    h0 = (jax.random.normal(key, (U, S)) +
          1j * jax.random.normal(jax.random.fold_in(key, 1), (U, S))
          ).astype(jnp.complex64)
    pil = rg.pilot_grid(jax.random.PRNGKey(3))
    x = jnp.zeros((1, S, 768), jnp.complex64)
    grid = rg.map_data(x, pil)                         # pilots only
    xg = jnp.moveaxis(grid, 1, -1)                     # (1, T, F, S)
    y = jnp.sum(h0[None, None, None] * xg[..., None, :], -1)
    h_hat, err_var = R.ls_nn_estimate(rg, y, pil, 0.0)
    assert h_hat.shape == (1, T, F, U, S)
    assert np.allclose(np.asarray(h_hat),
                       np.broadcast_to(np.asarray(h0), (1, T, F, U, S)),
                       atol=1e-4)
    assert float(err_var) == 0.0


def test_lmmse_perfect_csi_no_noise_recovers(rg):
    key = jax.random.PRNGKey(4)
    B, T, F, U, S = 2, 3, 8, 8, 4
    h = (jax.random.normal(key, (B, T, F, U, S)) + 1j *
         jax.random.normal(jax.random.fold_in(key, 1), (B, T, F, U, S))
         ).astype(jnp.complex64)
    x = (jax.random.normal(jax.random.fold_in(key, 2), (B, T, F, S)) + 1j *
         jax.random.normal(jax.random.fold_in(key, 3), (B, T, F, S))
         ).astype(jnp.complex64)
    y = jnp.sum(h * x[..., None, :], axis=-1)
    x_hat, no_eff = R.lmmse_equalize_grid(h, y, 0.0, 1e-7)
    assert np.allclose(np.asarray(x_hat), np.asarray(x), atol=1e-2)
    assert np.all(np.asarray(no_eff) > -1e-6)


def test_lmmse_unbiased_scaling():
    """E[x_hat | x] ~ x even at low SNR (the unbiased-LMMSE contract)."""
    key = jax.random.PRNGKey(5)
    B, U, S = 4096, 8, 4
    h = (jax.random.normal(key, (B, U, S)) + 1j *
         jax.random.normal(jax.random.fold_in(key, 1), (B, U, S))
         ).astype(jnp.complex64) / np.sqrt(2)
    x = jnp.ones((B, S), jnp.complex64)
    no = 2.0
    n = (jax.random.normal(jax.random.fold_in(key, 2), (B, U)) + 1j *
         jax.random.normal(jax.random.fold_in(key, 3), (B, U))
         ).astype(jnp.complex64) * np.sqrt(no / 2)
    y = jnp.sum(h * x[..., None, :], axis=-1) + n
    x_hat, _ = R.lmmse_equalize_grid(h, y, 0.0, no)
    bias = np.abs(np.mean(np.asarray(x_hat)) - 1.0)
    assert bias < 0.05


# ---------------- end-to-end operating point ----------------


@pytest.mark.slow
def test_sm1_dataset_operating_point():
    """The nearest-point demapper on the sm1 dataset must reproduce the
    reference's committed operating point (notebook outputs, SURVEY.md
    §6.3): its trained anchors are ELM 0.0170 / ESN 0.052 at 10 dB and
    ESN 0.376 at 0 dB; our traditional demapper measured 0.0175 / 0.379
    at calibration. Windows cover channel-realization sampling noise at
    batch=8. Also E|z|^2 ~ 1 (unbiased LMMSE)."""
    from esn_ofdm_mimo_tpu.pipelines.classification import (
        make_equalized_dataset_sm1)
    build = jax.jit(lambda e, k: make_equalized_dataset_sm1(e, k, batch=8))

    ds = build(jnp.float32(10.0), jax.random.PRNGKey(0))
    z = ds.x[:, 0] + 1j * ds.x[:, 1]
    ser10 = float((np.asarray(hard_demap_index_gray(z, 4)) !=
                   np.asarray(ds.labels)).mean())
    assert 0.010 < ser10 < 0.028, ser10
    assert abs(float(jnp.mean(jnp.abs(z) ** 2)) - 1.0) < 0.05

    ds0 = build(jnp.float32(0.0), jax.random.PRNGKey(1))
    z0 = ds0.x[:, 0] + 1j * ds0.x[:, 1]
    ser0 = float((np.asarray(hard_demap_index_gray(z0, 4)) !=
                  np.asarray(ds0.labels)).mean())
    assert 0.33 < ser0 < 0.43, ser0
