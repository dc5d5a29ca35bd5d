"""Compare two results_ber.csv files column-by-column in effective-SNR dB.

For each shared BER column, interpolates curve B onto curve A's BER levels
and reports the max horizontal (dB) deviation — the same metric
tools/validate_baseline.py uses against the reference CSV, applied between
two of our own runs (e.g. QC-family NBF re-runs vs the committed
Gallager-family curves). Points below `--floor` errors-equivalent BER are
compared as ratios instead (horizontal shift is ill-defined on a floor).

Usage: python tools/compare_curves.py A.csv B.csv [--tol-db 0.5]
"""
from __future__ import annotations

import argparse
import csv
import math
import sys


def read_csv(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    cols = {k: [float(r[k]) for r in rows] for k in rows[0]}
    return cols


def shift_db(ebno, a_vals, b_vals, level):
    """Horizontal dB offset between the two curves at BER `level`."""
    def x_at(vals):
        for i in range(len(vals) - 1):
            v0, v1 = vals[i], vals[i + 1]
            if (v0 - level) * (v1 - level) <= 0 and v0 != v1:
                t = (v0 - level) / (v0 - v1)
                return ebno[i] + t * (ebno[i + 1] - ebno[i])
        return None
    xa, xb = x_at(a_vals), x_at(b_vals)
    if xa is None or xb is None:
        return None
    return xb - xa


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--tol-db", type=float, default=0.5)
    ap.add_argument("--tol-ratio", type=float, default=1.25,
                    help="a column also passes if every point's BER ratio "
                         "is within [1/r, r] — the right criterion on flat "
                         "error-floor regions, where a horizontal shift "
                         "amplifies statistically-insignificant vertical "
                         "noise into unbounded dB offsets")
    ap.add_argument("--floor", type=float, default=1e-4,
                    help="below this BER compare ratios, not shifts")
    args = ap.parse_args()

    A, B = read_csv(args.a), read_csv(args.b)
    ekey = next(k for k in A if "bNo" in k or "ebno" in k.lower())
    ebno = A[ekey]
    bad = 0
    for col in A:
        if col == ekey or col not in B:
            continue
        worst = 0.0
        for i, level in enumerate(A[col]):
            if level < args.floor or B[col][i] < args.floor:
                continue
            s = shift_db(ebno, A[col], B[col], level)
            if s is not None and abs(s) > abs(worst):
                worst = s
        ratios = [B[col][i] / A[col][i] for i in range(len(ebno))
                  if A[col][i] >= args.floor > 0 and B[col][i] > 0]
        lo = min(ratios) if ratios else float("nan")
        hi = max(ratios) if ratios else float("nan")
        ratio_ok = (ratios and lo >= 1.0 / args.tol_ratio
                    and hi <= args.tol_ratio)
        ok = abs(worst) <= args.tol_db or ratio_ok
        bad += not ok
        print(f"{col:24s} max_shift {worst:+.3f} dB  "
              f"ratio [{lo:.3f}, {hi:.3f}]  {'OK' if ok else 'FAIL'}")
    print(f"{'ALL OK' if bad == 0 else f'{bad} columns out of band'}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
