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
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import SimConfig
from ..pipelines.blockfading import run_nbf_blocks, NbfCounts
from ..pipelines.cdl import (
    CDL_DETECTORS, CdlCalData, CdlCounts, cdl_decode_counters,
    fit_calibrators, run_cdl_cal_blocks, run_cdl_detect_llrs)
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


def make_fused_nbf_grid(cfg: SimConfig, mesh, blocks_per_device: int,
                        rounds: int) -> Callable:
    """ONE dispatch for the WHOLE SNR grid: scan over (snr, rounds) on
    device with per-SNR psum'd counters stacked in the output.

    Per-block keys are folded on-device from (root, snr index, global block
    id) — the identical stream to block_keys() on the host — so the fused
    grid is bit-compatible with the per-SNR dispatch path (asserted in
    tests/test_montecarlo.py). Used by run_nbf_curve when no checkpointing
    is requested; the relay's heavy-tailed multi-second dispatch+sync
    latency then hits once per experiment instead of once per SNR."""
    n_dev = mesh.devices.size
    G = n_dev * blocks_per_device
    ebnos = jnp.asarray(cfg.ebno_db, dtype=jnp.float32)
    n_snr = ebnos.shape[0]

    def local(root):
        dev = jax.lax.axis_index(TRIALS_AXIS)

        def snr_body(_, jx):
            jj, ebno = jx
            k_snr = jax.random.fold_in(root, jj)

            def one_round(r):
                ids = (r * G + dev * blocks_per_device
                       + jnp.arange(blocks_per_device, dtype=jnp.uint32))
                bkeys = jax.vmap(
                    lambda b: jax.random.fold_in(k_snr, b))(ids)
                return run_nbf_blocks(cfg, ebno, bkeys)

            acc = one_round(jnp.uint32(0))
            def round_body(a, r):
                return jax.tree.map(lambda x, y: x + y, a, one_round(r)), None
            acc, _ = jax.lax.scan(
                round_body, acc, jnp.arange(1, rounds, dtype=jnp.uint32))
            return None, jax.tree.map(
                lambda x: jax.lax.psum(x, TRIALS_AXIS), acc)

        _, per_snr = jax.lax.scan(
            snr_body, None, (jnp.arange(n_snr, dtype=jnp.uint32), ebnos))
        return per_snr           # counters pytree with leading (n_snr,) axis

    sharded = jax.shard_map(local, mesh=mesh, in_specs=(P(),),
                            out_specs=P(), check_vma=False)
    return jax.jit(sharded)


# Deterministic program/user errors that a retry cannot fix — re-dispatching
# them `retries` times only delays the real traceback (VERDICT r03 weak #6).
# Backend/runtime errors stay broadly retryable: the axon relay surfaces
# transient interconnect failures as opaque RuntimeError/XlaRuntimeError.
_NO_RETRY = (TypeError, ValueError, AssertionError, AttributeError, KeyError)


def _call_with_retry(step, args, retries: int = 2,
                     progress: Optional[Callable[[str], None]] = None):
    """Retry a sharded round on transient failures (flaky interconnect /
    preempted device) — the failure-recovery hook of SURVEY.md §5. Rounds are
    pure functions of their keys, so a retry is exact."""
    last = None
    for attempt in range(retries + 1):
        try:
            return step(*args)
        except _NO_RETRY:
            raise
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
                  rounds_per_call: int = 4,
                  adaptive_min_errors: Optional[int] = None,
                  adaptive_max_blocks: Optional[int] = None,
                  adaptive_on_uncoded: bool = False) -> CurveResult:
    """Run the full SNR sweep of a block-fading experiment.

    blocks_per_snr is rounded up to a whole number of dispatches
    (n_devices * blocks_per_device * rounds_per_call blocks each);
    `rounds_per_call` rounds are scanned inside one dispatch to amortise
    the per-dispatch relay latency. A custom `step_factory` (fault-injection
    tests) keeps the legacy one-round-per-dispatch signature.

    adaptive_min_errors: sequential Monte-Carlo, same rule as run_cdl_curve —
    after the base budget at an SNR point, keep simulating extra rounds until
    EVERY detector has at least this many FAILED CODEWORDS (frame errors;
    coded bit errors cluster ~k/2 per failed codeword, so frame counts set
    the effective sample size), or the adaptive_max_blocks cap (default 4x
    blocks_per_snr) is hit. Deep-tail coded points (e.g. the 2x2 30 dB
    mmse_coded column) are carried by a handful of codewords at the base
    budget; the error-count rule pins their relative CI (~1/sqrt(n_err))
    instead of their block count. When LDPC is DISABLED the stopping unit is
    uncoded bit errors instead (independent bit flips — no clustering), so
    deep uncoded floors (e.g. siso_qpsk_awgn at 21+ dB) also sample to a
    fixed relative CI. Extra rounds extend the same per-(snr,
    global-block-id) key stream, so an adaptive run is a superset of the
    fixed-budget run's sample.
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

    def _to_host(counts):
        return jax.device_get(
            jax.tree.map(lambda x: np.asarray(x, dtype=np.int64)
                         if np.issubdtype(np.asarray(x).dtype, np.integer)
                         else np.asarray(x, dtype=np.float64), counts))

    # reuse the already-built scan step for adaptive top-ups (same traced
    # program as the base rounds); built lazily for the step_factory path
    adapt_state = {"step": step if step_factory is None else None}

    def _short_of_target(acc):
        """True while any detector is below the adaptive error target.
        Stopping unit: failed codewords when LDPC decodes (coded bit errors
        cluster per codeword), uncoded bit errors otherwise — or always
        uncoded bits with adaptive_on_uncoded (deep uncoded floors in coded
        presets, e.g. siso_qpsk_awgn at 21+ dB where the coded BER is an
        exact 0 and frame counts would always run to the cap)."""
        coded_unit = cfg.ldpc.enabled and not adaptive_on_uncoded
        counts = (acc.frame_errors if coded_unit else acc.bit_errors)
        return min(int(v) for v in counts.values()) < adaptive_min_errors

    def _adaptive_topup(jj, ebno, acc, base_blocks):
        """Sequential-MC extension: extra scanned rounds at this SNR until
        every detector's error count (failed codewords, or uncoded bit
        errors when LDPC is disabled) reaches adaptive_min_errors (or the
        block cap). Key ids continue past the base budget's."""
        if not adaptive_min_errors:
            return acc
        max_blocks = (4 * blocks_per_snr if adaptive_max_blocks is None
                      else adaptive_max_blocks)
        if adapt_state["step"] is None:
            adapt_state["step"] = make_sharded_nbf_scan_step(cfg, mesh)
        astep = adapt_state["step"]
        Ra = max(1, rounds_per_call)
        blocks = bid = base_blocks
        extra = 0
        # whole G-block rounds only: stop when the remaining budget is below
        # one round rather than dispatching past the cap (the previous
        # max(1, ...) overshot adaptive_max_blocks by up to G-1 blocks)
        while _short_of_target(acc) and max_blocks - blocks >= G:
            n_rounds = min(Ra, (max_blocks - blocks) // G)
            ids = jnp.arange(bid, bid + n_rounds * G, dtype=jnp.uint32)
            bid += n_rounds * G
            blocks += n_rounds * G
            extra += n_rounds * G
            keys = block_keys(root, jj, ids)
            keys = keys.reshape(n_rounds, G, *keys.shape[1:])
            cnt = _to_host(_call_with_retry(astep, (jnp.float32(ebno), keys),
                                            progress=progress))
            acc = _tree_add(acc, cnt)
        if progress is not None and extra:
            coded_unit = cfg.ldpc.enabled and not adaptive_on_uncoded
            unit = "failed codewords" if coded_unit else "bit errors"
            errs = {d: int(v) for d, v in
                    (acc.frame_errors if coded_unit
                     else acc.bit_errors).items()}
            progress(f"[mc] EbNo={ebno:g} dB adaptive: +{extra} blocks "
                     f"({blocks} total), {unit} {errs}")
        return acc

    # whole-grid fusion: one dispatch per experiment (int32 counter guard)
    total_rounds = rounds if step_factory is not None else rounds * R
    bits_per_snr = (total_rounds * G * cfg.data_symbols_per_block
                    * cfg.channel.n_tx * cfg.ofdm.n_subcarriers
                    * cfg.ofdm.bits_per_symbol)
    if (checkpoint is None and step_factory is None
            and bits_per_snr < 1.9e9):
        grid = make_fused_nbf_grid(cfg, mesh, blocks_per_device, total_rounds)
        stacked = _to_host(_call_with_retry(grid, (root,), progress=progress))
        acc_per_snr = [_adaptive_topup(jj, ebnos[jj],
                                       jax.tree.map(lambda x: x[jj], stacked),
                                       total_rounds * G)
                       for jj in range(len(ebnos))]
        if progress is not None:
            for jj, ebno in enumerate(ebnos):
                acc = acc_per_snr[jj]
                ber = {k: v / max(acc.total_bits, 1)
                       for k, v in acc.bit_errors.items()}
                progress(f"[mc] EbNo={ebno:g} dB done: "
                         + " ".join(f"{k}={v:.4g}"
                                    for k, v in sorted(ber.items())))
        return assemble_curve(cfg, ebnos, acc_per_snr)

    acc_per_snr = []
    for jj, ebno in enumerate(ebnos):
        if checkpoint is not None and checkpoint.has(jj):
            loaded = checkpoint.load_or_none(jj)
            if loaded is not None:
                acc_per_snr.append(loaded)
                continue
        acc = None
        for r in range(rounds):
            ids = jnp.arange(r * R * G, (r + 1) * R * G, dtype=jnp.uint32)
            keys = block_keys(root, jj, ids)
            if step_factory is None:
                keys = keys.reshape(R, G, *keys.shape[1:])
            counts = _call_with_retry(step, (jnp.float32(ebno), keys),
                                      progress=progress)
            counts = _to_host(counts)
            acc = counts if acc is None else _tree_add(acc, counts)
        if step_factory is None:
            acc = _adaptive_topup(jj, ebno, acc, rounds * R * G)
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
        # relay's ~35 ms/dispatch latency amortises over R). Detection runs
        # per round inside the scan; the BP decode is hoisted OUT of the
        # scan and runs ONCE on the round-stacked LLRs — one big grid pays
        # the decode path's fixed costs (pad/transpose/compaction sort)
        # once instead of per round. (Round-4 note: the round-3 'kernel is
        # 2-3x slower inside a scanned context' reading did not survive a
        # cleaner instrument — PARITY.md round-4 decode study — but the
        # fixed-cost amortisation stands.)
        # Bit-identical (per-codeword decode is independent);
        # run_cdl_curve caps R so the stacked LLRs stay within memory.
        zero = {d: jnp.zeros((), jnp.int32) for d in CDL_DETECTORS}

        def body(acc, bkeys):
            errs, tot, Lcs, u = run_cdl_detect_llrs(cfg, ebno_db, bkeys,
                                                    calib)
            aerrs, atot = acc
            return ({d: aerrs[d] + errs[d] for d in aerrs}, atot + tot), \
                (Lcs, u)

        (errs, tot), (Lcs_st, u_st) = jax.lax.scan(
            body, (zero, jnp.zeros((), jnp.int32)), bkeys2d)
        Lcs = {d: v.reshape(-1, v.shape[-1]) for d, v in Lcs_st.items()}
        u = u_st.reshape(-1, u_st.shape[-1])
        dec = cdl_decode_counters(cfg, Lcs, u)
        out = CdlCounts(bit_errors=errs, total_bits=tot,
                        info_errors=dec["info_errors"],
                        total_info_bits=jnp.asarray(u.size, jnp.int32),
                        frame_errors=dec["frame_errors"],
                        ldpc_iter_sum=dec["iter_sum"],
                        ldpc_unconverged=dec["unconv"],
                        ldpc_codewords=jnp.asarray(u.shape[0], jnp.int32))
        return jax.tree.map(lambda x: jax.lax.psum(x, TRIALS_AXIS), out)

    dec = jax.jit(jax.shard_map(
        dec_local, mesh=mesh, in_specs=(P(), P(None, TRIALS_AXIS), P()),
        out_specs=P(), check_vma=False))
    return cal, dec


def _cdl_snr_point(cfg: SimConfig, cal_sm, dec_sm, ebno, cal_keys,
                   dec_keys):
    """The per-SNR-point CDL program body shared by make_fused_cdl_snr_step
    and make_fused_cdl_grid: scanned cal rounds -> calibrator fit -> stacked
    decode rounds. One definition keeps the two dispatch modes bit-compatible
    by construction."""
    m = cfg.ofdm.bits_per_symbol

    def cal_body(acc, keys):
        out = cal_sm(ebno, keys)
        errs, tot = acc
        errs = {k: errs[k] + out.bit_errors[k] for k in errs}
        llr = {d: out.llr[d].reshape(-1, m) for d in out.llr}
        return (errs, tot + out.total_bits), (llr, out.bits.reshape(-1, m))

    zero = ({d: jnp.zeros((), jnp.int32) for d in CDL_DETECTORS},
            jnp.zeros((), jnp.int32))
    (errs, tot), (llrs, bits) = jax.lax.scan(cal_body, zero, cal_keys)
    calib = fit_calibrators(cfg, {d: llrs[d].reshape(-1, m) for d in llrs},
                            bits.reshape(-1, m))
    dec = dec_sm(ebno, dec_keys, calib)
    return errs, tot, dec, calib


def make_fused_cdl_snr_step(cfg: SimConfig, mesh):
    """ONE dispatch per SNR point: cal rounds + calibrator fit + decode
    rounds, all inside a single jitted program. The round counts are set by
    the shapes of the key arrays passed to the returned step.

    The axon relay adds heavy-tailed seconds-scale latency per
    dispatch+sync (docs/ENVIRONMENT.md); the previous per-SNR sequence of
    cal dispatch -> llr gather -> fit dispatch -> calib gather -> decode
    dispatch cost ~14 s/SNR of which <0.5 s was device compute. Counters
    accumulate in int32 on device — callers must keep per-SNR totals under
    ~2e9 bits (run_cdl_curve guards this).
    """
    cal_sm, dec_sm = make_sharded_cdl_steps(cfg, mesh)

    @jax.jit
    def snr_step(ebno, cal_keys, dec_keys):
        # cal_keys (Rc, G, ...), dec_keys (Rd, G, ...)
        return _cdl_snr_point(cfg, cal_sm, dec_sm, ebno, cal_keys, dec_keys)

    return snr_step


def make_fused_cdl_grid(cfg: SimConfig, mesh, blocks_per_device: int,
                        cal_rounds: int, dec_rounds: int):
    """ONE dispatch for the WHOLE CDL SNR grid: lax.scan over SNR points,
    each running cal rounds + calibrator fit + stacked decode rounds (the
    make_fused_cdl_snr_step body), with per-SNR counters and calibrators
    stacked in the output. Completes the NBF symmetry (make_fused_nbf_grid):
    the relay's heavy-tailed per-dispatch latency hits once per experiment
    instead of once per SNR.

    Per-block keys fold on-device from (root, snr index, global block id) —
    the identical stream to block_keys() on the host — so the fused grid is
    bit-compatible with the per-SNR dispatch path for every classical
    counter (asserted in tests/test_montecarlo.py)."""
    cal_sm, dec_sm = make_sharded_cdl_steps(cfg, mesh)
    n_dev = mesh.devices.size
    G = n_dev * blocks_per_device
    ebnos = jnp.asarray(cfg.ebno_db, dtype=jnp.float32)
    n_snr = ebnos.shape[0]

    @jax.jit
    def grid(root):
        def snr_body(_, jx):
            jj, ebno = jx
            ids = jnp.arange((cal_rounds + dec_rounds) * G, dtype=jnp.uint32)
            keys = block_keys(root, jj, ids)
            ck = keys[:cal_rounds * G].reshape(cal_rounds, G, -1)
            dk = keys[cal_rounds * G:].reshape(dec_rounds, G, -1)
            return None, _cdl_snr_point(cfg, cal_sm, dec_sm, ebno, ck, dk)

        _, out = jax.lax.scan(
            snr_body, None, (jnp.arange(n_snr, dtype=jnp.uint32), ebnos))
        return out                   # pytrees with leading (n_snr,) axis

    return grid


def run_cdl_curve(cfg: SimConfig, blocks_per_snr: int,
                  blocks_per_device: int = 2, mesh=None,
                  seed: Optional[int] = None,
                  progress: Optional[Callable[[str], None]] = print,
                  checkpoint=None, rounds_per_call: int = 4,
                  adaptive_min_errors: Optional[int] = None,
                  adaptive_max_blocks: Optional[int] = None,
                  adaptive_on_uncoded: bool = False):
    """SNR sweep of the calibrated CDL pipeline.

    adaptive_min_errors: sequential Monte-Carlo — after the base budget,
    keep running decode rounds at an SNR point until every detector has
    accumulated at least this many FAILED CODEWORDS (frame errors — the
    NBF sampler's round-3 lesson: coded bit errors cluster ~k/2 per
    failed codeword, so bit counts overstate the effective sample ~500x;
    with adaptive_on_uncoded the unit is uncoded bit errors instead), or
    the adaptive_max_blocks cap (default 4x blocks_per_snr) is reached. The
    waterfall cliff (12-15 dB, where the MMSE coded BER falls three decades
    across one grid step) is exactly where a fixed budget leaves run-to-run
    variance straddling the ±0.5 dB validation band; a min-error-count rule
    spends blocks there and nowhere else (error counts, not BER, set the
    relative CI: sigma_rel ~ 1/sqrt(n_err)).

    Returns (CurveResult-like dict, calibration params per SNR)."""
    mesh = mesh if mesh is not None else trials_mesh()
    n_dev = mesh.devices.size
    G = n_dev * blocks_per_device
    rounds = max(1, -(-blocks_per_snr // G))
    # cal + dec rounds total exactly `rounds` when rounds >= 2; a 1-round
    # budget cannot host both phases, so it is bumped to 1 + 1 — loudly.
    cal_rounds = min(max(1, round(rounds * cfg.calib.cal_fraction)),
                     max(rounds - 1, 1))
    dec_rounds = max(1, rounds - cal_rounds)
    if cal_rounds + dec_rounds != rounds and progress is not None:
        progress(f"[cdl] blocks_per_snr={blocks_per_snr} gives a single "
                 f"{G}-block round; the calibrated pipeline needs separate "
                 f"cal+decode rounds, so {cal_rounds + dec_rounds} rounds "
                 f"({(cal_rounds + dec_rounds) * G} blocks/SNR) will run")
    seed = cfg.seed if seed is None else seed
    root = jax.random.PRNGKey(seed)

    # int32 on-device counters: keep the fused dispatch's decode total under
    # ~1.9e9 bits; any excess decode rounds run as extra scanned dispatches
    bpb = (cfg.data_symbols_per_block * cfg.channel.n_tx
           * cfg.ofdm.n_subcarriers * cfg.ofdm.bits_per_symbol)
    # two caps on rounds per fused dispatch: int32 counters (~1.9e9 bits)
    # and the round-stacked f32 LLR buffers the batched decode holds
    # (~6e8 bytes per detector; see dec_local)
    max_rd = max(1, min(int(1.9e9 // (G * bpb)),
                        int(6e8 // (G * bpb * 4))))
    rd_fused = min(dec_rounds, max_rd)
    rd_extra = dec_rounds - rd_fused
    # whole-grid fusion (like run_nbf_curve): when no per-SNR checkpointing
    # is requested, ONE dispatch scans every SNR point's cal + fit + decode
    # on device — the relay's heavy-tailed dispatch+sync latency then hits
    # once per experiment. The key streams are identical to the per-SNR
    # path (on-device block_keys with the same (root, jj, id) folding), so
    # classical counters are bit-compatible (tests/test_montecarlo.py).
    grid_out = None
    if checkpoint is None:
        grid = make_fused_cdl_grid(cfg, mesh, blocks_per_device,
                                   cal_rounds, rd_fused)
        grid_out = jax.device_get(_call_with_retry(grid, (root,),
                                                   progress=progress))
    else:
        snr_step = make_fused_cdl_snr_step(cfg, mesh)
    dec_step = None
    if rd_extra:
        _, dec_step = make_sharded_cdl_steps(cfg, mesh)
        R = max(1, min(rounds_per_call, rd_extra))

    ebnos = np.asarray(cfg.ebno_db, dtype=np.float32)
    results = []
    for jj, ebno in enumerate(ebnos):
        if checkpoint is not None and checkpoint.has(jj):
            loaded = checkpoint.load_or_none(jj)
            if loaded is not None:
                results.append(loaded)
                continue
        bid = (cal_rounds + rd_fused) * G
        if grid_out is not None:
            errs_d, tot_d, dec_d, calib_d = jax.tree.map(
                lambda x: x[jj], grid_out)
        else:
            ckeys = block_keys(root, jj,
                               jnp.arange(cal_rounds * G, dtype=jnp.uint32))
            ckeys = ckeys.reshape(cal_rounds, G, *ckeys.shape[1:])
            dkeys = block_keys(root, jj, jnp.arange(
                cal_rounds * G, bid, dtype=jnp.uint32))
            dkeys = dkeys.reshape(rd_fused, G, *dkeys.shape[1:])
            errs_d, tot_d, dec_d, calib_d = _call_with_retry(
                snr_step, (jnp.float32(ebno), ckeys, dkeys),
                progress=progress)
        uncoded = {"bit_errors": jax.device_get(errs_d),
                   "total_bits": int(tot_d)}
        coded = jax.tree.map(lambda x: np.asarray(x, np.int64),
                             jax.device_get(dec_d))
        calib = jax.device_get(calib_d)

        for r in range(-(-rd_extra // R) if rd_extra else 0):
            n_r = min(R, rd_extra - r * R)
            ids = jnp.arange(bid, bid + n_r * G, dtype=jnp.uint32)
            bid += n_r * G
            keys = block_keys(root, jj, ids)
            keys = keys.reshape(n_r, G, *keys.shape[1:])
            calib_dev = {d: (jnp.asarray(a), jnp.asarray(b))
                         for d, (a, b) in calib.items()}
            cnt = jax.tree.map(lambda x: np.asarray(x, np.int64),
                               jax.device_get(
                                   dec_step(jnp.float32(ebno), keys,
                                            calib_dev)))
            coded = _tree_add(coded, cnt)

        if adaptive_min_errors:
            max_dec_blocks = (4 * blocks_per_snr if adaptive_max_blocks is None
                              else adaptive_max_blocks)
            if dec_step is None:
                _, dec_step = make_sharded_cdl_steps(cfg, mesh)
            Ra = max(1, rounds_per_call)
            calib_dev = {d: (jnp.asarray(a), jnp.asarray(b))
                         for d, (a, b) in calib.items()}
            dec_blocks = bid - cal_rounds * G
            extra = 0

            def _stop_unit():
                src = (coded.bit_errors if adaptive_on_uncoded
                       else coded.frame_errors)
                return min(int(v) for v in src.values())

            # whole G-block rounds only; stop when the remaining budget is
            # below one round instead of overshooting the cap
            while (_stop_unit() < adaptive_min_errors
                   and max_dec_blocks - dec_blocks >= G):
                n_rounds = min(Ra, (max_dec_blocks - dec_blocks) // G)
                ids = jnp.arange(bid, bid + n_rounds * G, dtype=jnp.uint32)
                bid += n_rounds * G
                dec_blocks += n_rounds * G
                extra += n_rounds * G
                keys = block_keys(root, jj, ids)
                keys = keys.reshape(n_rounds, G, *keys.shape[1:])
                cnt = jax.tree.map(lambda x: np.asarray(x, np.int64),
                                   jax.device_get(
                                       dec_step(jnp.float32(ebno), keys,
                                                calib_dev)))
                coded = _tree_add(coded, cnt)
            if progress is not None and extra:
                errs = {d: int(v) for d, v in coded.frame_errors.items()}
                progress(f"[cdl] EbNo={ebno:g} dB adaptive: +{extra} blocks "
                         f"({dec_blocks} decoded), failed codewords {errs}")

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
            # BP convergence telemetry (budget counted for unconverged)
            "ldpc_avg_iters": {
                d: int(coded.ldpc_iter_sum[d]) / max(int(coded.ldpc_codewords), 1)
                for d in coded.ldpc_iter_sum},
            "ldpc_unconverged_frac": {
                d: int(coded.ldpc_unconverged[d]) / max(int(coded.ldpc_codewords), 1)
                for d in coded.ldpc_unconverged},
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
