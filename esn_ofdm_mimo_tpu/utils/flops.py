"""Analytic FLOP model of the flagship CDL datapath (roofline accounting).

SURVEY.md §5 calls for per-kernel roofline numbers; XLA's own
`compiled.cost_analysis()` cannot provide them because it counts every
`while`-loop body ONCE regardless of trip count (measured ~4x undercount on
this datapath: the ESN recurrence alone is a T~138-step scan). This module
counts the executed algebra explicitly from the static config shapes —
exactly the quantities the VERDICT prescribes (recurrence 2*T*B*n_res^2,
DFT matmuls, equalizer solves, BP edge ops).

Counting conventions (documented so MFU numbers are comparable):
  * one multiply-accumulate = 2 FLOPs; a real (M,K)@(K,N) dot = 2*M*K*N
    (XLA's own convention);
  * complex arithmetic is counted as the real-embedded matmuls the TPU
    actually executes (ops/fft_mxu: one complex DFT = 4 real matmuls, so
    8*rows*L^2 — NOT the 5*N*log2(N) of a radix-2 FFT, which is not the
    algorithm run);
  * transcendentals (tanh, arctanh, sigmoid, exp) count as 1 FLOP — they
    are VPU ops, not MXU work, and MFU is quoted against the MXU peak;
  * RNG draws, gathers/scatters, reshapes and bit ops count as 0.

These are *useful algorithmic* FLOPs: matmuls running at precision "high"
(3-pass bf16) execute ~3x the hardware passes but still count once, so an
op pinned to "high" tops out near MFU ~1/3 by construction.

All functions are pure Python arithmetic over `SimConfig` — nothing here
touches JAX or the device.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..config import SimConfig

# Per-edge FLOPs of one flooding BP iteration (ldpc/decode.py bp_iter +
# per-iteration syndrome check; the Pallas QC kernel executes the same
# algebra with shift-routing instead of gathers):
#   sumprod: L_tot accumulate (2) + q form/clip (3) + tanh (1) +
#            leave-one-out product fwd/bwd (3) + clip (1) + arctanh (1) +
#            scale (1) + syndrome (2) = 14
#   minsum:  sign/abs bookkeeping + two-min reduction + scale + syndrome = 11
BP_FLOPS_PER_EDGE = {"sumprod": 14.0, "minsum": 11.0,
                     "offset-minsum": 12.0}

NS_ITERS = 40      # models/esn._readout_lstsq ns_prepare(iters=40)
NS_REFINE = 2      # ns_prepare solve(..., refine=2)
RAPP_FLOPS = 10.0  # |x|, ratio, pow, div per sample (ops/pa.rapp_pa)


def dot(m: float, k: float, n: float = 1.0) -> float:
    """Real (m,k)@(k,n) matmul."""
    return 2.0 * m * k * n


def fft_flops(rows: float, length: float) -> float:
    """fft_mxu/ifft_mxu: 4 real (rows,L)@(L,L) matmuls + 2 adds/elem."""
    return 8.0 * rows * length * length + 2.0 * rows * length


def fir_dft_flops(batch: float, n_tx: int, n_rx: int, tap_rows: float,
                  T: int, isi: int) -> float:
    """ops/channel._apply_fir_dft at L = T+isi-1: forward DFT of the
    waveforms (batch*n_tx rows), forward DFT of the taps (tap_rows rows —
    taps may broadcast over data symbols), per-frequency TX mixing
    (complex mul-reduce, 8 FLOPs/cMAC), inverse DFT (batch*n_rx rows)."""
    L = T + isi - 1
    return (fft_flops(batch * n_tx, L) + fft_flops(tap_rows, L)
            + 8.0 * batch * n_rx * n_tx * L + fft_flops(batch * n_rx, L))


def esn_states_flops(B: float, T: int, n_res: int, n_in: int,
                     n_out: int) -> float:
    """models/esn.esn_states: hoisted drive projection (input+teacher in one
    dot) + the (T-1)-step scan of (B,n_res)@(n_res,n_res) + tanh."""
    steps = T - 1
    drive = dot(B * steps, n_in + n_out, n_res)
    scan = steps * (dot(B, n_res, n_res) + B * n_res)
    return drive + scan


def esn_predict_flops(B: float, T: int, n_res: int, n_in: int,
                      n_out: int) -> float:
    """models/esn.esn_predict (the Pallas kernel executes the same algebra):
    hoisted input drive + input-readout, then per step the state dot,
    feedback projection, grouped state readout, and tanh."""
    drive = dot(B * T, n_in, n_res) + dot(B * T, n_in, n_out)
    per_step = (dot(B, n_res, n_res) + dot(B, n_out, n_res)
                + dot(B, n_res, n_out) + B * n_res)
    return drive + T * per_step


def readout_lstsq_flops(B: float, R: int, F: int, n_out: int) -> float:
    """models/esn._readout_lstsq (ridge Newton-Schulz path). Dual/kernel
    form when F > R (the flagship case: F=316 features, R=128 rows), primal
    otherwise; NS iteration = 2 (n,n) matmuls/iter, solve refine=2, plus one
    outer refinement recomputing the ext products."""
    if F <= R:  # primal: F x F gram
        gram = 2.0 * B * R * F * F            # brf,brg->bfg
        ns = NS_ITERS * 2.0 * 2.0 * B * F ** 3  # 2 (F,F)@(F,F) matmuls/iter
        # two solve() calls (x and its refinement), 1 + 2*refine matmuls each
        solve = 2 * (1 + 2 * NS_REFINE) * 2.0 * B * F * F * n_out
        rhs = 3 * dot(B * R, F, n_out)        # b + outer-refinement ext dots
        return gram + ns + solve + rhs
    # dual: R x R gram K = ext ext^T
    gram = 2.0 * B * R * R * F
    ns = NS_ITERS * 2.0 * 2.0 * B * R ** 3
    # two solve() calls, each 1 + 2*refine matmuls of (R,R)@(R,n_out)
    solve = 2 * (1 + 2 * NS_REFINE) * 2.0 * B * R * R * n_out
    # apply_K einsum (2 chained ext contractions) + final ext^T z
    rhs = 3 * (2.0 * B * R * F * n_out)
    return gram + ns + solve + rhs


def equalizer_flops(B: float, N: int, n_tx: int, n_rx: int,
                    D: float) -> float:
    """ops/equalize: per-(block,subcarrier) real-embedded normal-equation
    factorisation (2n_tx x 2n_rx He) + the per-symbol apply mul-reduce."""
    p, q = 2 * n_tx, 2 * n_rx           # real-embedded dims
    gram = dot(p, q, p)                  # He^T He
    chol = p ** 3 / 3.0
    tri = 2.0 * p * p * q * 2            # fwd+bwd substitution, q RHS
    weights = B * N * (gram + chol + tri)
    apply = 2.0 * B * D * N * p * q
    return weights + apply


def bp_decode_flops(n_cw: float, n: int, dv: int, max_iter: int,
                    algo: str = "sumprod") -> float:
    """Flooding BP at the committed max_iter (measured: at the flagship
    operating point the per-tile early exit does not trigger before
    max_iter, so max_iter is the executed count)."""
    edges = float(n) * dv
    return n_cw * max_iter * edges * BP_FLOPS_PER_EDGE[algo]


def calib_fit_flops(m: int, S: float, gd_steps: int,
                    n_detectors: int = 2) -> float:
    """pipelines/cdl.fit_logreg_1d: per GD step over (m, S) LLRs: affine,
    sigmoid, residual, two gradient means ~ 10 FLOPs/sample."""
    return n_detectors * gd_steps * 10.0 * m * S


@dataclass(frozen=True)
class CdlFlops:
    """Per-dispatch FLOPs of the flagship programs (pipelines/cdl), for B
    blocks per round. Fields mirror the three programs bench.py times."""
    synth: float          # synth_block: channel + pilot + chanest + ESN fit
    detect: float         # detect_data_symbols: TX/channel/ESN/MMSE per D syms
    llr: float            # _llrs_for both detectors
    encode: float         # data_bits_for_blocks LDPC encode
    decode: float         # calibrated-LLR BP decode, both detectors
    calib_apply: float    # per-bit affine + clip

    @property
    def cal_counters(self) -> float:
        """run_cdl_cal_counters_chunks round: LLR tensors DCE'd."""
        return self.synth + self.detect + self.encode

    @property
    def cal_full(self) -> float:
        """run_cdl_cal_blocks with the calibration LLRs kept."""
        return self.cal_counters + self.llr

    @property
    def decode_blocks(self) -> float:
        """run_cdl_decode_blocks: detection + LLR + calibrated decode."""
        return self.cal_full + self.calib_apply + self.decode


def cdl_flops(cfg: SimConfig, n_blocks: int) -> CdlFlops:
    """Analytic FLOPs of one B-block round of each flagship program.

    Models the CDL pipeline exactly (detectors esn+mmse, single SNR-matched
    ESN fit); the NBF pipelines run two fits and five detectors, which this
    model does not count — hence the guard."""
    if not cfg.calib.enabled or cfg.esn.train_ebno_fixed_db is not None:
        raise ValueError("cdl_flops models the calibrated CDL pipeline only")
    ofdm, ch, esn = cfg.ofdm, cfg.channel, cfg.esn
    N, m, isi, cp = (ofdm.n_subcarriers, ofdm.bits_per_symbol,
                     ofdm.isi_duration, ofdm.cp_len)
    n_tx, n_rx = ch.n_tx, ch.n_rx
    B = float(n_blocks)
    D = cfg.data_symbols_per_block
    T = N + cp
    delay = esn.shared_delay(isi)
    T_esn = T + delay
    n_in, n_out = 2 * n_rx, 2 * n_tx
    n_res = esn.n_reservoir
    F = n_res + n_in
    R = T_esn - (delay + cp)          # solve rows after n_forget discard

    # ---- synth_block ----
    synth = 0.0
    synth += fft_flops(B * n_rx * n_tx, N)               # taps -> H_true
    synth += 2 * (fft_flops(B * n_tx, N)                 # pilot x_cp, x_ls_cp
                  + RAPP_FLOPS * B * n_tx * T)
    synth += 2 * fir_dft_flops(B, n_tx, n_rx, B * n_rx * n_tx, T, isi)
    synth += fft_flops(B * n_rx, N)                      # demod Y_ls
    synth += 8.0 * B * n_rx * N                          # LS comb divide
    synth += 2 * fft_flops(B * n_rx * n_tx, N)           # MMSE TD refine
    synth += esn_states_flops(B, T_esn, n_res, n_in, n_out)
    synth += readout_lstsq_flops(B, R, F, n_out)

    # ---- detect_data_symbols (both flagship detectors: esn + mmse) ----
    BD = B * D
    det = 0.0
    det += fft_flops(BD * n_tx, N) + RAPP_FLOPS * BD * n_tx * T   # TX mod+PA
    det += fir_dft_flops(BD, n_tx, n_rx, B * n_rx * n_tx, T, isi)
    det += fft_flops(BD * n_rx, N)                       # demod
    det += esn_predict_flops(BD, T_esn, n_res, n_in, n_out)
    det += fft_flops(BD * n_tx, N)                       # ESN TD -> freq
    det += equalizer_flops(B, N, n_tx, n_rx, D)          # MMSE
    det += 4.0 * BD * n_tx * N * m * len(("esn", "mmse"))  # hard demap both

    # ---- LLRs (both detectors) ----
    llr = 2 * (6.0 * BD * n_tx * N            # decision-directed sigma^2
               + 8.0 * BD * n_tx * N * m)     # separable max-log PAM LLRs

    # ---- encode / decode / calibration ----
    n_code = N * m
    n_cw = BD * n_tx
    k = n_code // 2                            # rate-1/2 (dv=4, dc=8)
    encode = dot(n_cw, k, n_code - k)
    decode = 2 * bp_decode_flops(n_cw, n_code, cfg.ldpc.dv,
                                 cfg.ldpc.max_iter, cfg.ldpc.algo)
    calib_apply = 2 * 4.0 * n_cw * n_code      # affine+clip+yobs per bit

    return CdlFlops(synth=synth, detect=det, llr=llr, encode=encode,
                    decode=decode, calib_apply=calib_apply)
