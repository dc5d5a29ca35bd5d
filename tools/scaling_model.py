"""Quantified scaling-efficiency model for the Monte-Carlo pipelines
(VERDICT r04 #4: put numbers where docs/SCALING.md hand-waved).

The fused CDL SNR-point program (parallel/montecarlo._cdl_snr_point) is
data-parallel over coherence blocks with exactly three classes of
cross-device communication:

  1. counter psums — a handful of int32 scalars per SNR point (uncoded
     bit errors, decode counters, telemetry);
  2. the calibrator fit's gradient all-reduces — fit_logreg_1d runs
     gd_steps full-batch GD steps over the sample-sharded LLR tensor;
     each step reduces two (m,) gradients, so the fit costs gd_steps
     sequential SMALL all-reduces (latency-bound, the dominant term);
  3. worst case, one all-gather of the stride-subsampled calibration
     LLRs if XLA materialises the subsample unsharded —
     min(max_fit_samples, S_total) x m x n_det x 2 arrays (bandwidth-
     bound, bounded here pessimistically; XLA usually keeps the GD
     sharded and this term vanishes).

Everything else is per-device compute: there is no parameter state, no
activation exchange, no resharding. Device-seconds per SNR point come
from the MEASURED single-chip bench rates; interconnect constants are
stated conservatively below. Efficiency = T_dev / (T_dev + T_coll) under
weak scaling (fixed blocks_per_device).

    python tools/scaling_model.py            # prints the table

The 4-process timed CPU measurement (tests/test_distributed.py::
test_four_process_collective_overhead_fraction) upper-bounds the same
quantity on shared cores; see docs/SCALING.md for both.
"""
from __future__ import annotations

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

# --- measured single-chip rates (bench.py, round-5 session) -------------
E2E_SYM_PER_S = 85_000.0       # decode-inclusive symbols/s/chip
SYM_PER_BLOCK = 75.0           # pilot + 74 data symbols (flagship)

# --- interconnect constants (conservative; sources in docstring) --------
# ICI: v5e 2-D torus. Small-message all-reduce ~ 2*log2(n) link hops at
# ~1 us/hop software+hardware latency -> modeled 5 us + 2us*log2(n).
# DCN: multi-host ethernet/IB; small collective ~100 us + 20us*log2(h).
# Bandwidth (large messages): ICI ~4.5e10 B/s effective per chip ring;
# DCN ~1e10 B/s per host.
def t_allreduce_small(n: int, fabric: str) -> float:
    import math
    lg = max(math.log2(max(n, 2)), 1.0)
    if fabric == "ici":
        return 5e-6 + 2e-6 * lg
    return 100e-6 + 20e-6 * lg


def bw(fabric: str) -> float:
    return 4.5e10 if fabric == "ici" else 1e10


def model(n_chips: int, fabric: str, blocks_per_device: int = 128,
          rounds: int = 8, gather_worst_case: bool = True,
          fit_method: str = "gd") -> dict:
    from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
    cfg = mimo_4x8_cdl()
    m = cfg.ofdm.bits_per_symbol
    n_det = 2
    blocks = blocks_per_device * rounds          # per device per SNR
    t_dev = blocks * SYM_PER_BLOCK / E2E_SYM_PER_S

    # 1. counter psums: uncoded (2 det + total) + decode (6 x 2 det + 2)
    n_counter_ar = 2
    counter_bytes = (3 + 14) * 4
    # 2. fit all-reduces, sequential: "gd" = gd_steps x one fused (2, m)
    # gradient reduce; "newton" (CalibConfig.fit_method, round 5) = ~8
    # iterations x (grad/Hessian reduce + 4 backtracking-NLL reduces)
    n_fit_ar = cfg.calib.gd_steps if fit_method == "gd" else 8 * 5
    fit_bytes_per_ar = (2 if fit_method == "gd" else 5) * m * 4
    # 3. worst-case subsample all-gather (x and y for each detector)
    S_cap = cfg.calib.max_fit_samples or 0
    gather_bytes = (2 * n_det * S_cap * m * 4) if gather_worst_case else 0

    t_coll = ((n_counter_ar + n_fit_ar) * t_allreduce_small(n_chips, fabric)
              + (counter_bytes + n_fit_ar * fit_bytes_per_ar
                 + gather_bytes) / bw(fabric))
    eff = t_dev / (t_dev + t_coll)
    return {"n_chips": n_chips, "fabric": fabric, "fit": fit_method,
            "t_dev_s": t_dev,
            "t_coll_ms": t_coll * 1e3, "efficiency": eff,
            "fit_allreduces": n_fit_ar,
            "gather_bytes_worst": gather_bytes}


def main() -> None:
    rows = []
    for fit in ("gd", "newton"):
        for fabric in ("ici", "dcn"):
            for n in (8, 32, 256):
                rows.append(model(n, fabric, fit_method=fit))
    print(f"{'chips':>6} {'fabric':>6} {'fit':>7} {'T_dev':>8} "
          f"{'T_coll':>9} {'efficiency':>10}")
    for r in rows:
        print(f"{r['n_chips']:>6} {r['fabric']:>6} {r['fit']:>7} "
              f"{r['t_dev_s']:>7.2f}s {r['t_coll_ms']:>7.2f}ms "
              f"{r['efficiency']:>9.4%}")
    print("\nper-SNR-point collective inventory (flagship, weak scaling "
          "at 128 blocks/device x 8 rounds):")
    r = model(256, "dcn")
    print(f"  {r['fit_allreduces']} sequential small all-reduces "
          f"(calibrator-fit GD) — the latency-dominant term")
    print(f"  worst-case calibration gather: "
          f"{r['gather_bytes_worst']/1e6:.0f} MB "
          f"(vanishes when XLA keeps the GD sample-sharded)")
    with open(os.path.join(_ROOT, "results", "scaling_model.json"),
              "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote results/scaling_model.json")


if __name__ == "__main__":
    main()
