"""Acceptance properties for the beyond-reference extensions
(VERDICT r04 #6): 64-QAM must sit where AWGN theory puts it, and the
TDL-A/B/C profiles must realize the configured RMS delay spread.

The extensions shipped in round 4 with wiring tests + TPU artifacts but no
property validation — "it ran" is one notch above compiling. These tests
pin the physics:

  * exact AWGN BER for the framework's natural-binary column-major QAM
    (separable per-axis PAM quadrature — no Gray-code approximation
    formulas, the labels here are NOT Gray; SURVEY.md §2.3) vs a measured
    Monte Carlo through ops/qam for m=4 AND m=6, plus the 16→64-QAM
    penalty gap read off the exact curves;
  * 38.901 TDL profile realization: per-tap mean power matches the
    fractional-split discretization analytically, and the realized RMS
    delay spread lands on the configured delay_spread_ns target;
  * cross-profile BER sanity at matched SNR (slow tier): all three
    profiles are unit-power Rayleigh per tone with unit-normalized RMS
    delay spread, so a SISO link's uncoded BER must agree across profiles
    within Monte-Carlo bands — wild divergence would mean a broken
    profile table or split.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esn_ofdm_mimo_tpu.ops import qam
from esn_ofdm_mimo_tpu.ops.channel import (TDL_PROFILES, _tdl_split_matrix,
                                           draw_tdl_taps)


def _exact_qam_ber(m: int, sigma: float) -> float:
    """Exact AWGN BER of the framework's unit-power square M-QAM with
    natural-binary LSB-first labels, nearest-neighbor (ML) demapping.

    The constellation is separable (index = i*sqrtM + j, re from i, im
    from j — ops/qam._constellation_np), so per-axis PAM decision regions
    + label Hamming distances give the exact BER by quadrature:
    P(decide level a | sent level l) = Phi((b_{a+1}-x_l)/sigma)
    - Phi((b_a - x_l)/sigma) with boundaries b at scaled midpoints.
    sigma is the PER-REAL-DIMENSION noise std."""
    from scipy.stats import norm   # scipy is available (pyldpc-era dep)
    M = 2 ** m
    sq = int(round(np.sqrt(M)))
    mb = m // 2
    const = np.asarray(qam._constellation_np(m))
    levels = np.unique(np.round(const.real, 6))
    assert len(levels) == sq
    bounds = np.concatenate([[-np.inf], (levels[:-1] + levels[1:]) / 2,
                             [np.inf]])
    P = (norm.cdf((bounds[None, 1:] - levels[:, None]) / sigma)
         - norm.cdf((bounds[None, :-1] - levels[:, None]) / sigma))
    labels = (np.arange(sq)[:, None] >> np.arange(mb)[None, :]) & 1
    ham = (labels[:, None, :] != labels[None, :, :]).sum(-1)  # (sq, sq)
    # uniform symbols; both axes are identical by symmetry
    per_axis_bit_errs = (P * ham).sum() / sq
    return 2.0 * per_axis_bit_errs / m


@pytest.mark.parametrize("m", [4, 6])
def test_qam_awgn_ber_matches_exact(m):
    """Mapper -> AWGN -> hard demap lands on the exact quadrature BER."""
    key = jax.random.PRNGKey(100 + m)
    n_sym = 200_000
    kb, kn = jax.random.split(key)
    bits = jax.random.randint(kb, (n_sym * m,), 0, 2, dtype=jnp.int32)
    x = qam.bits_to_symbols(bits, m)
    # Es/N0 chosen so BER ~ 1e-2..1e-1: resolvable at this sample size
    esn0_db = {4: 14.0, 6: 20.0}[m]
    sigma = float(np.sqrt(0.5 / 10 ** (esn0_db / 10)))  # per-dim; Es = 1
    noise = (jax.random.normal(kn, (n_sym, 2)) * sigma)
    y = x + noise[:, 0] + 1j * noise[:, 1]
    rx = qam.symbols_to_bits_hard(y, m)
    ber = float(jnp.mean((rx != bits.astype(rx.dtype)).astype(jnp.float32)))
    exact = _exact_qam_ber(m, sigma)
    tol = 4.0 * np.sqrt(exact * (1 - exact) / (n_sym * m))  # 4-sigma MC
    assert abs(ber - exact) < max(tol, 0.1 * exact), (
        f"m={m}: measured {ber:.5f} vs exact {exact:.5f}")


def test_qam64_penalty_gap_vs_16qam():
    """The 16->64-QAM Es/N0 penalty at BER 1e-2 sits in the theoretical
    band (asymptotically 10*log10(63/15) ~ 6.2 dB for the same PAM-grid
    family; finite-BER value read off the exact curves)."""
    from scipy.optimize import brentq

    def esn0_at(m, ber_target):
        f = lambda db: _exact_qam_ber(
            m, float(np.sqrt(0.5 / 10 ** (db / 10)))) - ber_target
        return brentq(f, 0.0, 40.0, xtol=1e-4)

    gap = esn0_at(6, 1e-2) - esn0_at(4, 1e-2)
    assert 5.5 < gap < 7.0, f"16->64-QAM gap {gap:.2f} dB out of band"


@pytest.mark.parametrize("profile", ["a", "b", "c"])
def test_tdl_profile_power_and_rms_delay_spread(profile):
    """Per-tap mean power matches the fractional-split discretization and
    the realized RMS delay spread hits the configured target.

    Config chosen so truncation is negligible (isi covers ~12x the RMS
    delay spread at 8 samples/DS); the per-draw unit-power normalization
    perturbs per-tap means by O(1/n_paths), hence the tolerance bands."""
    fs = 30.72e6
    ds_ns = 8.0 / fs * 1e9            # RMS delay spread = 8 samples
    isi = 100                          # longest TDL-A path: 9.66*8 ~ 78
    n_draws = 2048
    keys = jax.random.split(jax.random.PRNGKey(7), n_draws)
    taps = jax.vmap(lambda k: draw_tdl_taps(k, 1, 1, isi, fs, ds_ns,
                                            profile))(keys)
    p_emp = np.asarray(jnp.mean(jnp.abs(taps[:, 0, 0]) ** 2, axis=0))
    p_emp_n = p_emp / p_emp.sum()

    # Independent numpy oracle of the SAME law (38.901 powers, linear
    # amplitude split, per-draw unit-power normalization). The raw profile
    # is NOT the right expectation: E[p_i / P_total] suppresses strong
    # taps by ~their own power fraction (cov(p_i, P) = var(p_i) for
    # Rayleigh gains), an ~15-20% effect on the dominant tap — so the
    # oracle reproduces the normalization instead of ignoring it.
    d_norm, p_db = TDL_PROFILES[profile]
    p_lin = 10 ** (p_db / 10.0)
    p_lin = p_lin / p_lin.sum()
    S = _tdl_split_matrix(profile, isi, fs, ds_ns)
    rng = np.random.default_rng(1234)
    n_mc = 20000
    g = (rng.standard_normal((n_mc, len(p_lin)))
         + 1j * rng.standard_normal((n_mc, len(p_lin)))) / np.sqrt(2.0)
    h = (g * np.sqrt(p_lin)) @ S
    p = np.abs(h) ** 2
    p /= p.sum(-1, keepdims=True)
    p_oracle = p.mean(0)
    dom = p_oracle > 1e-3              # taps carrying real power
    rel = np.abs(p_emp_n[dom] - p_oracle[dom]) / p_oracle[dom]
    assert rel.max() < 0.15, f"tap-power mismatch vs oracle {rel.max():.3f}"

    t = np.arange(isi) / fs * 1e9      # ns
    mean_t = (p_emp_n * t).sum()
    rms = np.sqrt((p_emp_n * t * t).sum() - mean_t ** 2)
    mean_o = (p_oracle * t).sum()
    rms_oracle = np.sqrt((p_oracle * t * t).sum() - mean_o ** 2)
    # implementation exactness: the jax draw must land on the oracle
    assert abs(rms - rms_oracle) / rms_oracle < 0.02, (
        f"TDL-{profile.upper()}: realized RMS {rms:.1f} vs oracle "
        f"{rms_oracle:.1f} ns")
    # target realization: the linear AMPLITUDE split (the reference's own
    # TDL-B discretization, Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:127-165,
    # reused for A/C) biases RMS DS by a profile-dependent amount —
    # measured +5.2% (A), +0.7% (B), +13.3% (C) at 8 samples/DS, oracle-
    # confirmed as a law property, not an implementation error
    assert abs(rms - ds_ns) / ds_ns < 0.15, (
        f"TDL-{profile.upper()}: realized RMS DS {rms:.1f} ns vs "
        f"target {ds_ns:.1f} ns")


@pytest.mark.slow
def test_tdl_profiles_ber_agree_at_matched_snr():
    """SISO uncoded BER agrees across TDL-A/B/C at matched SNR: all three
    are per-tone Rayleigh with unit power and unit-normalized RMS delay
    spread, so the marginal per-tone SNR law — and with it the uncoded
    BER — is profile-independent up to Monte-Carlo noise."""
    import dataclasses
    from esn_ofdm_mimo_tpu.experiments.presets import get_preset
    from esn_ofdm_mimo_tpu.parallel import trials_mesh
    from esn_ofdm_mimo_tpu.parallel.montecarlo import run_nbf_curve

    bers = {}
    for prof in ("cdl_a", "cdl_b", "cdl_c"):
        cfg = get_preset("siso_nbf", fast=True)
        cfg = dataclasses.replace(
            cfg, ebno_db=(12.0,),
            ldpc=dataclasses.replace(cfg.ldpc, enabled=False),
            channel=dataclasses.replace(cfg.channel, kind=prof))
        res = run_nbf_curve(cfg, 32, blocks_per_device=4,
                            mesh=trials_mesh(), progress=None)
        bers[prof] = float(res.ber["mmse"][0])
    vals = np.asarray(list(bers.values()))
    assert vals.min() > 0.0
    assert vals.max() / vals.min() < 1.5, f"profile BER divergence: {bers}"
