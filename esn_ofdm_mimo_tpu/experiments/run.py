"""CLI experiment runner.

    python -m esn_ofdm_mimo_tpu.experiments.run --preset mimo_4x8_cdl \
        --blocks-per-snr 16 --outdir results/mimo_4x8_cdl [--fast] [--resume]

Replaces the reference's per-script `python <script>.py` entry points with
one driver over the preset registry (SURVEY.md §7 step 6).
"""
from __future__ import annotations

import argparse
import time

from ..parallel import trials_mesh
from ..parallel.mesh import maybe_init_distributed
from ..parallel.montecarlo import run_cdl_curve, run_nbf_curve
from ..utils.checkpoint import SnrCheckpoint
from ..utils.metrics import MetricsLogger
from ..utils.reporting import save_cdl_results, save_nbf_results
from .presets import PRESETS, get_preset


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", required=True, choices=sorted(PRESETS))
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--blocks-per-snr", type=int, default=None,
                    help="Monte-Carlo blocks per SNR point "
                         "(default: reference-equivalent count)")
    ap.add_argument("--blocks-per-device", type=int, default=16,
                    help="coherence blocks per device per round; large "
                         "batches are the TPU throughput plateau (bench.py "
                         "sweep) and BER is layout-invariant by key design")
    ap.add_argument("--rounds-per-call", type=int, default=4,
                    help="Monte-Carlo rounds lax.scan'd inside one dispatch "
                         "(amortises the ~35 ms/dispatch relay latency, "
                         "docs/ENVIRONMENT.md)")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--ldpc-algo",
                    choices=("sumprod", "minsum", "offset-minsum"),
                    default=None,
                    help="override the BP check rule (default: preset's; "
                         "sumprod = pyldpc parity, minsum = normalised "
                         "min-sum, offset-minsum = offset/λ-subtract "
                         "min-sum — both ~3x cheaper decode)")
    ap.add_argument("--ldpc-minsum-scale", type=float, default=None,
                    help="normalisation scale for --ldpc-algo minsum "
                         "(default: preset's, 0.75)")
    ap.add_argument("--ldpc-minsum-offset", type=float, default=None,
                    help="offset β for --ldpc-algo offset-minsum "
                         "(default: preset's, 0.5)")
    ap.add_argument("--ldpc-family", choices=("gallager", "qc", "pyldpc"),
                    default=None,
                    help="override the code family (pyldpc = construction-"
                         "faithful replica incl. full-row decode graph — "
                         "the VERDICT #10 ablation family)")
    ap.add_argument("--ldpc-seed", type=int, default=None,
                    help="override the code construction seed")
    ap.add_argument("--esn-target", choices=("pre_pa", "post_pa"),
                    default=None,
                    help="ESN training-target waveform: pre_pa = reference-"
                         "exact (clean TX before the Rapp PA; the ESN learns "
                         "joint channel+PA inversion — parity runs), "
                         "post_pa = PA output (easier target, measured lower "
                         "high-SNR floor). Default: preset's (post_pa)")
    ap.add_argument("--adaptive-min-errors", type=int, default=None,
                    help="sequential MC (CDL + NBF pipelines): keep "
                         "simulating extra blocks at each SNR until every "
                         "detector has this many FAILED CODEWORDS (frame "
                         "errors — coded bit errors cluster per codeword; "
                         "with LDPC disabled the unit is uncoded bit "
                         "errors), or the --adaptive-max-blocks cap — "
                         "concentrates blocks at the waterfall cliff and "
                         "the deep tails")
    ap.add_argument("--adaptive-on-uncoded", action="store_true",
                    help="stop adaptive sampling on UNCODED bit errors "
                         "even with LDPC enabled — for deep uncoded floors "
                         "in coded presets (siso_qpsk_awgn 21+ dB, coded "
                         "BER exactly 0); NBF and CDL pipelines")
    ap.add_argument("--adaptive-max-blocks", type=int, default=None,
                    help="cap on decoded blocks per SNR for "
                         "--adaptive-min-errors (default 4x blocks-per-snr)")
    ap.add_argument("--ebno-list", default=None,
                    help="comma-separated Eb/N0 grid override (dB) — e.g. a "
                         "fine 1 dB grid around the waterfall for the "
                         "coded-vs-uncoded error-budget analysis")
    ap.add_argument("--channel-kind", default=None,
                    choices=("exp_pdp", "cdl_a", "cdl_b", "cdl_c",
                             "awgn_flat"),
                    help="channel-profile override (framework extension: "
                         "38.901 TDL-A/-C alongside the reference's "
                         "exp-PDP and TDL-B; ops/channel.draw_tdl_taps)")
    ap.add_argument("--qam-bits", type=int, default=None,
                    help="bits per QAM symbol override (extension: any "
                         "even m, e.g. 6 for 64-QAM through the whole "
                         "mapper/LLR/decode stack)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from per-SNR checkpoints in outdir")
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="capture a jax.profiler device trace of the whole "
                         "curve run into DIR (perfetto/tensorboard format; "
                         "tracing adds overhead — profiling runs only)")
    ap.add_argument("--debug-nans", action="store_true",
                    help="dev-mode NaN guard: fail loudly at the first NaN "
                         "anywhere in the compute path (disables some "
                         "fusions — debugging runs only)")
    args = ap.parse_args(argv)
    if args.qam_bits is not None and (args.qam_bits < 2 or args.qam_bits % 2):
        # fail at the CLI, not with an obscure constellation shape error
        # deep in the mapper (ADVICE r04 #4)
        ap.error("--qam-bits must be a positive even integer "
                 "(square QAM constellations only)")

    maybe_init_distributed()
    cfg = get_preset(args.preset, fast=args.fast)
    if args.ebno_list is not None:
        import dataclasses
        grid = tuple(float(x) for x in args.ebno_list.split(","))
        cfg = dataclasses.replace(cfg, ebno_db=grid)
    if args.channel_kind is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, channel=dataclasses.replace(cfg.channel,
                                             kind=args.channel_kind))
    if args.qam_bits is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, ofdm=dataclasses.replace(cfg.ofdm,
                                          bits_per_symbol=args.qam_bits))
    if args.esn_target is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, esn=dataclasses.replace(cfg.esn,
                                         target_waveform=args.esn_target))
    if (args.ldpc_algo is not None or args.ldpc_minsum_scale is not None
            or args.ldpc_minsum_offset is not None
            or args.ldpc_family is not None or args.ldpc_seed is not None):
        import dataclasses
        ld = cfg.ldpc
        if args.ldpc_algo is not None:
            ld = dataclasses.replace(ld, algo=args.ldpc_algo)
        if args.ldpc_minsum_scale is not None:
            ld = dataclasses.replace(ld, minsum_scale=args.ldpc_minsum_scale)
        if args.ldpc_minsum_offset is not None:
            ld = dataclasses.replace(ld, minsum_offset=args.ldpc_minsum_offset)
        if args.ldpc_family is not None:
            ld = dataclasses.replace(ld, family=args.ldpc_family)
        if args.ldpc_seed is not None:
            ld = dataclasses.replace(ld, seed=args.ldpc_seed)
        cfg = dataclasses.replace(cfg, ldpc=ld)
    outdir = args.outdir or f"results/{cfg.name}"
    blocks = args.blocks_per_snr or cfg.n_blocks
    mesh = trials_mesh()
    ckpt = SnrCheckpoint(outdir + "/ckpt") if args.resume else None

    log = MetricsLogger(f"{outdir}/events.jsonl")
    log.log("run_start", preset=cfg.name, blocks_per_snr=blocks,
            devices=int(mesh.devices.size), L=cfg.ofdm.coherence_symbols)
    t0 = time.time()
    progress = lambda msg: log.log("progress", msg=msg)
    from ..utils.metrics import debug_nan_checks, profile_trace
    with debug_nan_checks(args.debug_nans), \
         profile_trace(f"curve:{cfg.name}", trace_dir=args.trace):
        if cfg.calib.enabled:
            results = run_cdl_curve(cfg, blocks,
                                    blocks_per_device=args.blocks_per_device,
                                    mesh=mesh, seed=args.seed, checkpoint=ckpt,
                                    progress=progress,
                                    rounds_per_call=args.rounds_per_call,
                                    adaptive_min_errors=args.adaptive_min_errors,
                                    adaptive_max_blocks=args.adaptive_max_blocks,
                                    adaptive_on_uncoded=args.adaptive_on_uncoded)
            save_cdl_results(outdir, cfg, results)
        else:
            res = run_nbf_curve(cfg, blocks,
                                blocks_per_device=args.blocks_per_device,
                                mesh=mesh, seed=args.seed, checkpoint=ckpt,
                                progress=progress,
                                rounds_per_call=args.rounds_per_call,
                                adaptive_min_errors=args.adaptive_min_errors,
                                adaptive_max_blocks=args.adaptive_max_blocks,
                                adaptive_on_uncoded=args.adaptive_on_uncoded)
            save_nbf_results(outdir, cfg, res)
    log.log("run_done", seconds=round(time.time() - t0, 1), outdir=outdir)


if __name__ == "__main__":
    main()
