"""Benchmark: detected symbols/s/chip on the flagship 4x8 CDL pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is end-to-end Monte-Carlo throughput of the calibrated
4x8 CDL experiment step (channel synthesis + pilot + ESN train + data-symbol
detection for ESN and MMSE + LLRs) in OFDM symbols per second on one chip.
`vs_baseline` compares against a NumPy single-thread oracle implementing the
reference's per-symbol semantics (pyESN-style Python recurrence + per-symbol
NumPy equalization), measured on this host — the reference repo publishes no
throughput numbers (BASELINE.md), so its own execution model is the baseline.
"""
from __future__ import annotations

import json
import os
import sys
import time

# The axon TPU backend in this container compiles through the relay
# (PALLAS_AXON_REMOTE_COMPILE); the flag is read by sitecustomize at
# interpreter start, so if it is missing we re-exec ourselves with it set.
if (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
        and os.environ.get("_BENCH_REEXEC") != "1"):
    env = dict(os.environ,
               PALLAS_AXON_REMOTE_COMPILE="1", _BENCH_REEXEC="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

# persistent compilation cache: relay compiles take minutes cold, ~0 warm
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


# v5e peak dense matmul throughput (bf16 MXU): 197 TFLOP/s. The data path
# runs matmuls at precision "high" (3-pass bf16 passes, validated BER-neutral)
# so achieved-FLOP/s is computed against the raw bf16 peak — the honest
# "speed of light" denominator (SURVEY.md §5 roofline accounting).
V5E_PEAK_FLOPS = 197e12


def _bench_tpu(n_blocks: int = 128, rounds: int = 64, iters: int = 3):
    """n_blocks=128 sits at the measured per-chunk throughput plateau on v5e
    (8 -> 15.5k, 32 -> 35.8k, 64 -> 45.7k, 128 -> 86.8k symbols/s after the
    precision split). `rounds` chunks are lax.scan'd inside ONE dispatch:
    the axon relay costs ~35 ms per dispatch+sync (measured with a trivial
    program, docs/ENVIRONMENT.md), so single-chunk calls leave ~35% of wall
    time in host<->relay latency that says nothing about the chip. Measured
    2026-08: rounds 8 -> 16 -> 32 gives 242k -> 257k -> 265k sym/s (the
    floor amortises); re-measured with the round-1-final kernels:
    rounds 32 -> 64 gives 458k -> 470k, blocks 256 is still past the
    plateau (417k at rounds 32)."""
    import jax
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.pipelines.cdl import run_cdl_cal_counters_chunks
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()
    D = cfg.data_symbols_per_block

    @jax.jit
    def step(ebno_db, bkeys2d):
        return run_cdl_cal_counters_chunks(cfg, ebno_db, bkeys2d)

    root = jax.random.PRNGKey(0)

    def keys_for(i):
        ids = jnp.arange(i * rounds * n_blocks, (i + 1) * rounds * n_blocks,
                         dtype=jnp.uint32)
        keys = block_keys(root, 0, ids)          # (R*B, ...) raw key data
        return keys.reshape(rounds, n_blocks, *keys.shape[1:])

    ebno = jnp.float32(12.0)
    # warm up: compile + first execution. NOTE: on the axon backend
    # block_until_ready does not block reliably; jax.device_get is the sync.
    jax.device_get(step(ebno, keys_for(0)))
    # best-of-N dispatches: the shared relay adds highly variable external
    # latency (identical dispatches measured 0.7 s and 1.4 s back to back);
    # interference only ever ADDS time, so the fastest dispatch is the
    # honest estimate of the chip's throughput. ALL repeat times are
    # returned so the JSON records the spread, not a point sample
    # (VERDICT r04 #7: the r4 driver capture read 464.6k where the session
    # band was 468-472k — pure relay drift, invisible without a spread).
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.device_get(step(ebno, keys_for(i + 1)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    symbols = rounds * n_blocks * (D + 1)  # pilot + data symbols per block
    return symbols / best, best, symbols, times


def _bench_tpu_e2e(n_blocks: int = 128, cal_rounds: int = 2,
                   dec_rounds: int = 6, iters: int = 3):
    """Decode-inclusive throughput: ONE fused dispatch per SNR point running
    calibration rounds + per-bit logistic calibrator fit + LDPC-decoded
    rounds (make_fused_cdl_snr_step) — the full flagship SNR-point program
    (reference Demo_MIMO_4x8_Sionna_CDL_ESN_v2.py:483-511), so the headline
    detection metric cannot be read as cherry-picked. cal:dec = 2:6 mirrors
    the production cal_fraction ~0.3 (config.CalibConfig); larger cal-round
    counts at 128 blocks exceed HBM (the fused program keeps
    cal_rounds*B*D*n_tx*N*m LLRs for both detectors resident for the fit)."""
    import jax
    import jax.numpy as jnp
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.parallel.mesh import trials_mesh
    from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_cdl_snr_step
    from esn_ofdm_mimo_tpu.utils.rng import block_keys

    cfg = mimo_4x8_cdl()
    D = cfg.data_symbols_per_block
    mesh = trials_mesh()
    step = make_fused_cdl_snr_step(cfg, mesh)
    root = jax.random.PRNGKey(0)
    R = cal_rounds + dec_rounds

    def keys_for(i):
        ids = jnp.arange(i * R * n_blocks, (i + 1) * R * n_blocks,
                         dtype=jnp.uint32)
        keys = block_keys(root, 1, ids).reshape(R, n_blocks, -1)
        return keys[:cal_rounds], keys[cal_rounds:]

    ebno = jnp.float32(12.0)
    ck, dk = keys_for(0)
    jax.device_get(step(ebno, ck, dk))
    times = []
    dec = None
    for i in range(iters):
        ck, dk = keys_for(i + 1)
        t0 = time.perf_counter()
        out = jax.device_get(step(ebno, ck, dk))
        times.append(time.perf_counter() - t0)
        dec = out[2]         # decoded counters incl. BP iteration telemetry
    best = min(times)
    symbols = R * n_blocks * (D + 1)
    return symbols / best, best, symbols, dec, times


def _bench_numpy_reference(n_data_symbols: int = 3) -> float:
    """Per-symbol cost of a NumPy implementation with the reference's
    execution model (Python-loop ESN recurrence, per-subcarrier solves).
    Measures the data-symbol path only — training is amortised over L=75
    symbols in the reference, so the data path dominates."""
    rng = np.random.default_rng(0)
    N, cp, n_tx, n_rx, n_res, isi = 128, 7, 4, 8, 300, 8
    T = N + cp + 3
    W = rng.uniform(-0.5, 0.5, (n_res, n_res))
    W *= 0.9 / np.max(np.abs(np.linalg.eigvals(W)))
    W_in = rng.uniform(-1, 1, (n_res, 2 * n_rx))
    W_out = rng.standard_normal((2 * n_tx, n_res + 2 * n_rx))
    W_fb = rng.uniform(-1, 1, (n_res, 2 * n_tx))
    H = rng.standard_normal((N, n_rx, n_tx)) + 1j * rng.standard_normal((N, n_rx, n_tx))
    t0 = time.perf_counter()
    for _ in range(n_data_symbols):
        u = rng.standard_normal((T, 2 * n_rx))
        # reference ESN predict loop (pyESN.py:249-253 execution model)
        s = np.zeros(n_res)
        o = np.zeros(2 * n_tx)
        outs = np.zeros((T, 2 * n_tx))
        for t in range(T):
            s = np.tanh(W @ s + W_in @ u[t] + W_fb @ o) + 1e-3 * (rng.random(n_res) - 0.5)
            o = W_out @ np.concatenate([s, u[t]])
            outs[t] = o
        # per-subcarrier MMSE solves (OFDM_SISO_NBF_LDPC.py:450-460 model)
        Y = rng.standard_normal((N, n_rx)) + 1j * rng.standard_normal((N, n_rx))
        for k in range(N):
            Hk = H[k]
            G = Hk.conj().T @ Hk + 0.1 * np.eye(n_tx)
            np.linalg.solve(G, Hk.conj().T @ Y[k])
        # hard demap python loop over subcarriers x streams
        const = np.arange(16) + 1j
        for k in range(N):
            for tx in range(n_tx):
                int(np.argmin(np.abs(const - Y[k, tx % n_rx])))
    return n_data_symbols / (time.perf_counter() - t0)


BASELINE_PINNED = True  # set False when the committed pin was unavailable


def main() -> None:
    global BASELINE_PINNED
    root = os.path.dirname(os.path.abspath(__file__))
    # vs_baseline denominator resolution order (VERDICT r02 #7: the NumPy
    # baseline must be PINNED so the headline multiple is comparable across
    # rounds, not re-measured under whatever host load exists):
    #   1. bench_baseline.json (committed pin; method recorded inside)
    #   2. .bench_baseline.json (local cache of a previous measurement)
    #   3. fresh median-of-5 measurement, cached to (2)
    pin = os.path.join(root, "bench_baseline.json")
    cache = os.path.join(root, ".bench_baseline.json")
    if os.path.exists(pin):
        base = json.load(open(pin))["numpy_symbols_per_s"]
    elif os.path.exists(cache):
        base = json.load(open(cache))["numpy_symbols_per_s"]
        BASELINE_PINNED = False
    else:
        import statistics
        base = statistics.median(_bench_numpy_reference() for _ in range(5))
        json.dump({"numpy_symbols_per_s": base,
                   "method": "median of 5 on this host"}, open(cache, "w"))
        BASELINE_PINNED = False

    n_blocks, rounds = 128, 64
    cal_r, dec_r = 2, 6

    # MFU/roofline (SURVEY.md §5): analytic FLOPs of the executed programs
    # (utils/flops.py — explicit per-kernel counts; XLA's cost_analysis is
    # unusable here, it counts scan bodies once) over the best-dispatch wall
    # time, against the v5e bf16 MXU peak.
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    from esn_ofdm_mimo_tpu.utils.flops import calib_fit_flops, cdl_flops
    cfg = mimo_4x8_cdl()
    fl = cdl_flops(cfg, n_blocks)
    D = cfg.data_symbols_per_block
    cal_samples = cal_r * n_blocks * D * cfg.channel.n_tx * cfg.ofdm.n_subcarriers
    # the fit stride-subsamples to calib.max_fit_samples (round 4) — count
    # the FLOPs actually executed
    cap = cfg.calib.max_fit_samples
    if cap is not None and cal_samples > cap:
        # fit_calibrators keeps ceil(S/stride) samples via x[..., ::stride]
        # (ADVICE r04 #3: floor here understated f_fit by up to one stride)
        stride = -(-cal_samples // int(cap))
        cal_samples = -(-cal_samples // stride)
    f_fit = calib_fit_flops(cfg.ofdm.bits_per_symbol, cal_samples,
                            cfg.calib.gd_steps)

    tpu, t_detect, sym_detect, t_det_all = _bench_tpu(n_blocks, rounds,
                                                      iters=5)
    e2e, t_e2e, sym_e2e, dec, t_e2e_all = _bench_tpu_e2e(n_blocks, cal_r,
                                                         dec_r, iters=5)

    f_detect = fl.cal_counters * rounds
    # decode FLOPs at the EXECUTED per-codeword iteration counts (pyldpc's
    # own early-exit execution model; the telemetry reports the budget for
    # never-converging codewords) — with the two-pass compaction the
    # committed max_iter is no longer the executed count for converging
    # codewords, so static max_iter accounting would overstate useful work
    from esn_ofdm_mimo_tpu.utils.flops import BP_FLOPS_PER_EDGE
    code_n, code_dv = cfg.ofdm.n_subcarriers * cfg.ofdm.bits_per_symbol, cfg.ldpc.dv
    it_exec = sum(int(v) for v in dec.ldpc_iter_sum.values())
    f_decode = it_exec * float(code_n * code_dv) * BP_FLOPS_PER_EDGE[cfg.ldpc.algo]
    f_e2e = (fl.cal_full * cal_r + f_fit
             + (fl.decode_blocks - fl.decode) * dec_r + f_decode)
    mfu_detect = f_detect / t_detect / V5E_PEAK_FLOPS
    mfu_e2e = f_e2e / t_e2e / V5E_PEAK_FLOPS
    # decode-phase wall time: the e2e dispatch minus its detect-equivalent
    # rounds (measured per-round detect cost) and the calibrator fit —
    # the residual is the BP decode phase (approximation documented in
    # PARITY.md "Decode-phase study")
    t_round_detect = t_detect / rounds
    t_dec_phase = max(t_e2e - (cal_r + dec_r) * t_round_detect
                      - f_fit / V5E_PEAK_FLOPS, 1e-9)
    mfu_decode = f_decode / t_dec_phase / V5E_PEAK_FLOPS
    unconv = {d: int(dec.ldpc_unconverged[d]) / max(int(dec.ldpc_codewords), 1)
              for d in dec.ldpc_unconverged}

    def spread(sym, ts):
        """Throughput spread across the N timed repeats (relay external
        latency only ever ADDS time: max ~= chip rate, min = worst
        interference; `value` stays best-of-N as documented)."""
        rates = sorted(sym / t for t in ts)
        mid = rates[len(rates) // 2] if len(rates) % 2 else \
            0.5 * (rates[len(rates) // 2 - 1] + rates[len(rates) // 2])
        return {"min": round(rates[0], 1), "median": round(mid, 1),
                "max": round(rates[-1], 1), "n": len(rates)}

    print(json.dumps({
        "metric": "cdl_4x8_detected_symbols_per_s_per_chip",
        "value": round(tpu, 2),
        "unit": "symbols/s",
        "vs_baseline": round(tpu / base, 2),
        "e2e_decoded_symbols_per_s": round(e2e, 2),
        "mfu_detect": round(mfu_detect, 4),
        "mfu_e2e": round(mfu_e2e, 4),
        # USEFUL-work MFU under pyldpc's early-exit execution model: the
        # numerator counts per-codeword convergence iterations, not the
        # straggler-tile / compaction-pass-1 iterations actually executed
        # (ADVICE r03 #5) — a roofline for the workload, not a hardware
        # utilisation figure
        "mfu_decode_useful": round(mfu_decode, 4),
        "bp_unconverged_frac": {k: round(v, 4) for k, v in unconv.items()},
        "flops_per_detected_symbol": round(f_detect / sym_detect, 0),
        "detect_spread_symbols_per_s": spread(sym_detect, t_det_all),
        "e2e_spread_symbols_per_s": spread(sym_e2e, t_e2e_all),
        "baseline_pinned": BASELINE_PINNED,
    }))


if __name__ == "__main__":
    main()
