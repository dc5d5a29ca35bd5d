"""Regenerate the reference-parity figure families for committed results.

Every NBF/CDL run directory stores its full curve data in results_ber.pkl,
so the per-run figure set (pre-LDPC / post-LDPC / ESN-pre-vs-post /
capacity-rank for NBF; uncoded-coded overlay for CDL) can be (re)emitted
without re-simulating — the reference commits these figures per run
(results/results_block_fading_*_12DB_train/*.png,
results_4x8_cdl_coded_uncoded/CDLB_run_01/BER_uncoded_coded_overlay_*.png).

Usage:
    python tools/regen_figures.py results/siso_nbf_tpu_v2 [more dirs...]
    python tools/regen_figures.py --all     # every results/* with a pkl
"""
from __future__ import annotations

import os
import pickle
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from esn_ofdm_mimo_tpu.utils import reporting  # noqa: E402


def regen(outdir: str) -> bool:
    pkl = os.path.join(outdir, "results_ber.pkl")
    if not os.path.exists(pkl):
        return False
    with open(pkl, "rb") as f:
        bundle = pickle.load(f)
    unc = bundle.get("BER_uncoded", {})
    if not unc:
        return False
    if "ESN" in unc and "MMSE" in unc:          # CDL bundle (upper-case keys)
        reporting.cdl_overlay_figure(outdir, bundle)
        print(f"[regen] {outdir}: CDL overlay")
    else:                                        # NBF bundle
        reporting.nbf_figures(outdir, bundle)
        print(f"[regen] {outdir}: NBF figure family")
    return True


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--all":
        base = os.path.join(_ROOT, "results")
        dirs = sorted(os.path.join(base, d) for d in os.listdir(base)
                      if os.path.isdir(os.path.join(base, d)))
    else:
        dirs = args
    n = sum(regen(d) for d in dirs)
    print(f"[regen] {n} result dirs refreshed")


if __name__ == "__main__":
    main()
