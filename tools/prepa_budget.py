"""Pre-PA coded error budget (VERDICT r02 #2).

Question: do the +1.58/+1.13 dB coded-ESN shifts at 15/18 dB in the
reference-exact `--esn-target pre_pa` run (results/mimo_4x8_cdl_tpu_prepa)
follow from the small in-band UNCODED difference, or hide a real decode-path
discrepancy in pre-PA mode?

Method: on the ESN branch the coded BER is (to first order) a function of
detector quality alone — all post-detection stages (sigma^2 estimation, LLR
calibration, BP decode) see only the detected symbols. So measure OUR OWN
pre-PA pipeline's coded-vs-uncoded mapping on a fine Eb/N0 grid around the
deviation (each grid point gives one (uncoded, coded) pair; Eb/N0 is just
the parameter that moves detector quality), interpolate coded(uncoded), and
evaluate it at the REFERENCE's measured uncoded values. If the reference's
coded points fall on our mapping (within its own single-run Monte-Carlo
band), the coded shift is fully explained by the uncoded difference and the
decode path is exonerated.

    python tools/prepa_budget.py results/mimo_4x8_cdl_tpu_prepa_fine/results_ber.csv
"""
from __future__ import annotations

import csv
import sys

import numpy as np

# reference flagship curve (BASELINE.md §1), ESN columns
REF_EBNO = np.arange(0, 31, 3, dtype=float)
REF_ESN_UNCODED = np.array([0.39036279, 0.35692871, 0.32307422, 0.28086133,
                            0.24451416, 0.20868408, 0.18600244, 0.16520703,
                            0.15912158, 0.16198193, 0.15689893])
REF_ESN_CODED = np.array([0.39208632, 0.35875896, 0.31658439, 0.27583563,
                          0.24669746, 0.20165058, 0.18246415, 0.15070601,
                          0.14270270, 0.13496001, 0.12668919])


def main() -> None:
    path = sys.argv[1]
    with open(path) as f:
        rows = list(csv.DictReader(f))
    unc = np.array([float(r["ESN_uncoded"]) for r in rows])
    cod = np.array([float(r["ESN_coded"]) for r in rows])
    ebno = np.array([float(r["EbNo(dB)"]) for r in rows])

    # our measured coded-vs-uncoded mapping (sorted by uncoded)
    order = np.argsort(unc)
    u_s, c_s = unc[order], cod[order]
    print(f"our mapping ({path}):")
    for e, u, c in zip(ebno, unc, cod):
        print(f"  EbNo {e:5.1f}  uncoded {u:.5f}  coded {c:.5f}  "
              f"amplification {c/u:.4f}")

    print("\nreference points vs our mapping (same-uncoded comparison):")
    print(f"{'EbNo':>5} {'ref_unc':>9} {'ref_cod':>9} {'ours_cod@ref_unc':>17} "
          f"{'ratio':>7}")
    worst = 0.0
    for e, ru, rc in zip(REF_EBNO, REF_ESN_UNCODED, REF_ESN_CODED):
        if ru < u_s.min() or ru > u_s.max():
            continue
        ours = float(np.interp(ru, u_s, c_s))
        ratio = rc / ours
        worst = max(worst, abs(np.log(ratio)))
        print(f"{e:5.0f} {ru:9.5f} {rc:9.5f} {ours:17.5f} {ratio:7.3f}")
    print(f"\nworst |log-ratio| = {worst:.4f} "
          f"({np.exp(worst):.3f}x vertical at equal uncoded BER)")

    # decode amplification consistency: our own curve's coded/uncoded slope
    # in the deviation region should match the ref's (both decoders fail
    # identically far above threshold and amplify detector differences the
    # same way)
    ref_amp = REF_ESN_CODED / REF_ESN_UNCODED
    print("\nreference's own amplification (coded/uncoded):",
          np.array2string(ref_amp[4:8], precision=4))


if __name__ == "__main__":
    main()
