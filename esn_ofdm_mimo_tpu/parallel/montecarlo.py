"""Sharded Monte-Carlo engine: SNR sweep with trial-parallel coherence blocks.

The SNR x Monte-Carlo double loop of the reference scripts
(OFDM_SISO_NBF_LDPC.py:230,266) becomes:

    for each Eb/N0:                      # host loop (tiny)
      for each round:                    # host loop, resumable
        shard_map over the 'trials' mesh axis:
          each device simulates `blocks_per_device` coherence blocks
          (one jitted, traced-Eb/N0 program reused for every SNR and round)
          and psums its counters over the mesh

Per-block PRNG keys are folded from (root seed, snr index, global block id)
— utils/rng.block_keys — so results are independent of the device layout
(see pipelines/common.py docstring for the exact bit-reproducibility scope).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from ..pipelines.blockfading import run_nbf_blocks, NbfCounts
from ..pipelines.cdl import (
    CdlCalData, CdlCounts, fit_calibrators, run_cdl_cal_blocks,
    run_cdl_decode_blocks)
from ..utils.rng import block_keys
from .mesh import TRIALS_AXIS, trials_mesh


@dataclasses.dataclass
class CurveResult:
    """Assembled BER curves and channel analytics for one experiment."""
    ebno_db: np.ndarray
    ber: Dict[str, np.ndarray]          # uncoded, per detector
    ber_coded: Dict[str, np.ndarray]    # post-LDPC, per detector
    capacity_per_sc: np.ndarray
    frac_rank_full: np.ndarray
    cond_hist: np.ndarray               # (n_snr, nbins)
    total_bits: np.ndarray
    total_info_bits: np.ndarray
    n_blocks: np.ndarray
    # LDPC decoder telemetry: mean BP iterations to convergence and the
    # fraction of codewords that never reached a zero syndrome, per detector
    ldpc_avg_iters: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)
    ldpc_unconverged_frac: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)


def _tree_add(a, b):
    return jax.tree.map(lambda x, y: x + y, a, b)


def make_sharded_nbf_step(cfg: SimConfig, mesh) -> Callable:
    """Build the jitted per-round step: (ebno, keys) -> psum'd counters."""

    def local_step(ebno_db, bkeys):
        counts = run_nbf_blocks(cfg, ebno_db, bkeys)
        return jax.tree.map(
            lambda x: jax.lax.psum(x, TRIALS_AXIS), counts)

    sharded = jax.shard_map(local_step, mesh=mesh,
                            in_specs=(P(), P(TRIALS_AXIS)),
                            out_specs=P(),
                            # replicated scan carries (ESN state zeros) are
                            # fine here; skip the varying-axis strictness
                            check_vma=False)
    return jax.jit(sharded)


def make_sharded_nbf_scan_step(cfg: SimConfig, mesh) -> Callable:
    """Multi-round step: (ebno, keys (R, G)) -> counters summed over R rounds.

    Each dispatch through the axon relay costs ~35 ms of host<->device
    latency regardless of program size (docs/ENVIRONMENT.md); scanning R
    rounds inside the jitted program amortises it. Memory stays at
    one-round footprint (lax.scan reuses the round's buffers)."""

    def local_step(ebno_db, bkeys2d):
        def body(acc, bkeys):
            counts = run_nbf_blocks(cfg, ebno_db, bkeys)
            return (counts if acc is None
                    else jax.tree.map(lambda x, y: x + y, acc, counts)), None

        first = run_nbf_blocks(cfg, ebno_db, bkeys2d[0])
        acc, _ = jax.lax.scan(
            lambda a, k: body(a, k), first, bkeys2d[1:])
        return jax.tree.map(lambda x: jax.lax.psum(x, TRIALS_AXIS), acc)

    sharded = jax.shard_map(local_step, mesh=mesh,
                            in_specs=(P(), P(None, TRIALS_AXIS)),
                            out_specs=P(),
                            check_vma=False)
    return jax.jit(sharded)


def _call_with_retry(step, args, retries: int = 2,
                     progress: Optional[Callable[[str], None]] = None):
    """Retry a sharded round on transient failures (flaky interconnect /
    preempted device) — the failure-recovery hook of SURVEY.md §5. Rounds are
    pure functions of their keys, so a retry is exact."""
    last = None
    for attempt in range(retries + 1):
        try:
            return step(*args)
        except Exception as e:  # noqa: BLE001 — backend errors are opaque
            last = e
            if progress is not None:
                progress(f"[mc] round failed (attempt {attempt + 1}): {e}")
    raise last


def run_nbf_curve(cfg: SimConfig, blocks_per_snr: int,
                  blocks_per_device: int = 4,
                  mesh=None, seed: Optional[int] = None,
                  progress: Optional[Callable[[str], None]] = print,
                  checkpoint=None, step_factory=None,
                  rounds_per_call: int = 4) -> CurveResult:
    """Run the full SNR sweep of a block-fading experiment.

    blocks_per_snr is rounded up to a whole number of dispatches
    (n_devices * blocks_per_device * rounds_per_call blocks each);
    `rounds_per_call` rounds are scanned inside one dispatch to amortise
    the per-dispatch relay latency. A custom `step_factory` (fault-injection
    tests) keeps the legacy one-round-per-dispatch signature.
    """
    mesh = mesh if mesh is not None else trials_mesh()
    n_dev = mesh.devices.size
    G = n_dev * blocks_per_device                 # blocks per round
    rounds = max(1, -(-blocks_per_snr // G))
    seed = cfg.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    if step_factory is not None:
        R = 1
        step = step_factory(cfg, mesh)
    else:
        R = max(1, min(rounds_per_call, rounds))
        rounds = -(-rounds // R)                  # dispatches of R rounds
        step = make_sharded_nbf_scan_step(cfg, mesh)

    ebnos = np.asarray(cfg.ebno_db, dtype=np.float32)
    acc_per_snr = []
    for jj, ebno in enumerate(ebnos):
        if checkpoint is not None and checkpoint.has(jj):
            acc_per_snr.append(checkpoint.load(jj))
            continue
        acc = None
        for r in range(rounds):
            ids = jnp.arange(r * R * G, (r + 1) * R * G, dtype=jnp.uint32)
            keys = block_keys(root, jj, ids)
            if step_factory is None:
                keys = keys.reshape(R, G, *keys.shape[1:])
            counts = _call_with_retry(step, (jnp.float32(ebno), keys),
                                      progress=progress)
            counts = jax.device_get(
                jax.tree.map(lambda x: np.asarray(x, dtype=np.int64)
                             if np.issubdtype(np.asarray(x).dtype, np.integer)
                             else np.asarray(x, dtype=np.float64), counts))
            acc = counts if acc is None else _tree_add(acc, counts)
        acc_per_snr.append(acc)
        if checkpoint is not None:
            checkpoint.save(jj, acc)
        if progress is not None:
            ber = {k: v / max(acc.total_bits, 1)
                   for k, v in acc.bit_errors.items()}
            progress(f"[mc] EbNo={ebno:g} dB done: "
                     + " ".join(f"{k}={v:.4g}" for k, v in sorted(ber.items())))

    return assemble_curve(cfg, ebnos, acc_per_snr)


def make_sharded_cdl_steps(cfg: SimConfig, mesh):
    """Jitted (cal_step, decode_step) for the CDL calibrated pipeline.

    cal_step psums the uncoded counters but leaves the calibration (llr, bit)
    tensors sharded over 'trials' — the host gathers them (they are small:
    ~blocks*D*n_tx*N*m f32) and fits the logistic calibrators once per SNR.
    """

    def cal_local(ebno_db, bkeys):
        out = run_cdl_cal_blocks(cfg, ebno_db, bkeys)
        return CdlCalData(
            bit_errors=jax.tree.map(
                lambda x: jax.lax.psum(x, TRIALS_AXIS), out.bit_errors),
            total_bits=jax.lax.psum(out.total_bits, TRIALS_AXIS),
            llr=out.llr, bits=out.bits)

    cal_out_specs = CdlCalData(
        bit_errors={d: P() for d in ("esn", "mmse")},
        total_bits=P(),
        llr={d: P(TRIALS_AXIS) for d in ("esn", "mmse")},
        bits=P(TRIALS_AXIS))

    cal = jax.jit(jax.shard_map(
        cal_local, mesh=mesh, in_specs=(P(), P(TRIALS_AXIS)),
        out_specs=cal_out_specs, check_vma=False))

    def dec_local(ebno_db, bkeys2d, calib):
        # keys (R, G_local): R decode rounds scanned per dispatch (the axon
        # relay's ~35 ms/dispatch latency amortises over R)
        def body(acc, bkeys):
            out = run_cdl_decode_blocks(cfg, ebno_db, bkeys, calib)
            return jax.tree.map(lambda x, y: x + y, acc, out), None

        first = run_cdl_decode_blocks(cfg, ebno_db, bkeys2d[0], calib)
        acc, _ = jax.lax.scan(body, first, bkeys2d[1:])
        return jax.tree.map(lambda x: jax.lax.psum(x, TRIALS_AXIS), acc)

    dec = jax.jit(jax.shard_map(
        dec_local, mesh=mesh, in_specs=(P(), P(None, TRIALS_AXIS), P()),
        out_specs=P(), check_vma=False))
    return cal, dec


def run_cdl_curve(cfg: SimConfig, blocks_per_snr: int,
                  blocks_per_device: int = 2, mesh=None,
                  seed: Optional[int] = None,
                  progress: Optional[Callable[[str], None]] = print,
                  checkpoint=None, rounds_per_call: int = 4):
    """SNR sweep of the calibrated CDL pipeline.

    Returns (CurveResult-like dict, calibration params per SNR)."""
    mesh = mesh if mesh is not None else trials_mesh()
    n_dev = mesh.devices.size
    G = n_dev * blocks_per_device
    rounds = max(1, -(-blocks_per_snr // G))
    cal_rounds = max(1, round(rounds * cfg.calib.cal_fraction))
    dec_rounds = max(1, rounds - cal_rounds)
    # decode rounds are scanned R-per-dispatch (dispatch count rounds up)
    R = max(1, min(rounds_per_call, dec_rounds))
    dec_dispatches = -(-dec_rounds // R)
    seed = cfg.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)
    cal_step, dec_step = make_sharded_cdl_steps(cfg, mesh)
    fit = jax.jit(functools.partial(fit_calibrators, cfg))

    ebnos = np.asarray(cfg.ebno_db, dtype=np.float32)
    results = []
    for jj, ebno in enumerate(ebnos):
        if checkpoint is not None and checkpoint.has(jj):
            results.append(checkpoint.load(jj))
            continue
        uncoded = None
        llr_acc = {d: [] for d in ("esn", "mmse")}
        bits_acc = []
        bid = 0
        for r in range(cal_rounds):
            ids = jnp.arange(bid, bid + G, dtype=jnp.uint32)
            bid += G
            out = cal_step(jnp.float32(ebno), block_keys(root, jj, ids))
            cnt = {"bit_errors": jax.device_get(out.bit_errors),
                   "total_bits": int(out.total_bits)}
            uncoded = cnt if uncoded is None else {
                "bit_errors": {k: uncoded["bit_errors"][k] + cnt["bit_errors"][k]
                               for k in cnt["bit_errors"]},
                "total_bits": uncoded["total_bits"] + cnt["total_bits"]}
            m = cfg.ofdm.bits_per_symbol
            # keep the calibration tensors ON DEVICE: gathering them to host
            # and re-uploading for the fit cost ~2x155 MB of tunnel traffic
            # per SNR at flagship batches
            for d in llr_acc:
                llr_acc[d].append(out.llr[d].reshape(-1, m))
            bits_acc.append(out.bits.reshape(-1, m))
        llr_cat = {d: jnp.concatenate(llr_acc[d]) for d in llr_acc}
        bits_cat = jnp.concatenate(bits_acc)
        calib = fit(llr_cat, bits_cat)
        calib = {d: (jnp.asarray(np.asarray(jax.device_get(a))),
                     jnp.asarray(np.asarray(jax.device_get(b))))
                 for d, (a, b) in calib.items()}

        coded = None
        for r in range(dec_dispatches):
            ids = jnp.arange(bid, bid + R * G, dtype=jnp.uint32)
            bid += R * G
            keys = block_keys(root, jj, ids)
            keys = keys.reshape(R, G, *keys.shape[1:])
            out = dec_step(jnp.float32(ebno), keys, calib)
            cnt = jax.device_get(out)
            if coded is None:
                coded = cnt
            else:
                coded = CdlCounts(
                    bit_errors={k: coded.bit_errors[k] + cnt.bit_errors[k]
                                for k in cnt.bit_errors},
                    total_bits=coded.total_bits + cnt.total_bits,
                    info_errors={k: coded.info_errors[k] + cnt.info_errors[k]
                                 for k in cnt.info_errors},
                    total_info_bits=coded.total_info_bits + cnt.total_info_bits)

        tot_unc = uncoded["total_bits"] + int(coded.total_bits)
        snr_res = {
            "ebno_db": float(ebno),
            "ber_uncoded": {
                d: (int(uncoded["bit_errors"][d]) + int(coded.bit_errors[d]))
                / tot_unc for d in ("esn", "mmse")},
            "ber_coded": {
                d: int(coded.info_errors[d]) / max(int(coded.total_info_bits), 1)
                for d in ("esn", "mmse")},
            "calib": {d: (np.asarray(calib[d][0]).tolist(),
                          np.asarray(calib[d][1]).tolist())
                      for d in calib},
        }
        results.append(snr_res)
        if checkpoint is not None:
            checkpoint.save(jj, snr_res)
        if progress is not None:
            progress(f"[cdl] EbNo={ebno:g} dB: "
                     f"uncoded {snr_res['ber_uncoded']}, "
                     f"coded {snr_res['ber_coded']}")
    return results


def assemble_curve(cfg: SimConfig, ebnos, acc_per_snr) -> CurveResult:
    det = sorted(acc_per_snr[0].bit_errors.keys())
    nb = len(acc_per_snr[0].cond_hist)
    ber = {d: np.zeros(len(ebnos)) for d in det}
    berc = {d: np.zeros(len(ebnos)) for d in det}
    cap = np.zeros(len(ebnos))
    frk = np.zeros(len(ebnos))
    chist = np.zeros((len(ebnos), nb))
    tot = np.zeros(len(ebnos))
    toti = np.zeros(len(ebnos))
    nblk = np.zeros(len(ebnos))
    avg_it = {d: np.zeros(len(ebnos)) for d in det}
    unconv = {d: np.zeros(len(ebnos)) for d in det}
    for jj, acc in enumerate(acc_per_snr):
        tot[jj] = acc.total_bits
        toti[jj] = acc.total_info_bits
        nblk[jj] = acc.n_blocks
        ncw = max(getattr(acc, "ldpc_codewords", 0), 1)
        for d in det:
            ber[d][jj] = acc.bit_errors[d] / max(acc.total_bits, 1)
            berc[d][jj] = acc.info_errors[d] / max(acc.total_info_bits, 1)
            avg_it[d][jj] = getattr(acc, "ldpc_iter_sum", {}).get(d, 0) / ncw
            unconv[d][jj] = getattr(acc, "ldpc_unconverged", {}).get(d, 0) / ncw
        cap[jj] = acc.capacity_sum / max(acc.n_blocks, 1)
        frk[jj] = acc.rank_full_sum / max(acc.rank_count, 1)
        chist[jj] = acc.cond_hist
    return CurveResult(ebno_db=np.asarray(ebnos), ber=ber, ber_coded=berc,
                       capacity_per_sc=cap, frac_rank_full=frk,
                       cond_hist=chist, total_bits=tot, total_info_bits=toti,
                       n_blocks=nblk, ldpc_avg_iters=avg_it,
                       ldpc_unconverged_frac=unconv)
