"""Real multi-process jax.distributed execution (SURVEY.md §5, VERDICT #3).

Launches 2 OS processes that initialise a jax.distributed group over a
localhost coordinator (through parallel/mesh.maybe_init_distributed), run
the fused NBF grid on a 4-device global CPU mesh (2 virtual devices per
process), and asserts the psum'd counters equal a single-process run over
the same 4-way mesh layout: per-block key folding makes the classical
counters a pure function of (root seed, snr index, global block id), and
the per-device ESN batches are identical too, so every integer counter must
match bit-for-bit.
"""
import json
import pytest
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from esn_ofdm_mimo_tpu.config import (
    SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
from esn_ofdm_mimo_tpu.parallel.mesh import trials_mesh
from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_nbf_grid

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _cfg():
    # must match tests/distributed_worker.py::tiny_cfg exactly
    return SimConfig(
        name="dist_tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4,
                        doppler_hz=3000.0),
        channel=ChannelConfig(kind="exp_pdp", n_tx=1, n_rx=1),
        esn=EsnConfig(n_reservoir=40, train_ebno_fixed_db=None),
        ldpc=LdpcConfig(enabled=False),
        ebno_db=(12.0,))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    out_file = tmp_path / "proc0.json"
    env = dict(os.environ)
    # a clean slate for the workers: they set their own platform/device flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "2", str(pid), str(out_file)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    rcs = [p.returncode for p in procs]
    assert rcs == [0, 0], f"worker rcs={rcs}\n--- p0 ---\n" \
                          f"{logs[0][-3000:]}\n--- p1 ---\n{logs[1][-3000:]}"
    dist = json.loads(out_file.read_text())
    assert dist["process_count"] == 2
    assert dist["device_count"] == 4

    # single-process reference on the same 4-way mesh layout
    cfg = _cfg()
    grid = make_fused_nbf_grid(cfg, trials_mesh(4), blocks_per_device=1,
                               rounds=2)
    ref = grid(jax.random.PRNGKey(cfg.seed))

    assert dist["total_bits"] == [int(x) for x in np.asarray(ref.total_bits)]
    assert dist["n_blocks"] == [int(x) for x in np.asarray(ref.n_blocks)]
    for det, errs in dist["bit_errors"].items():
        assert errs == [int(x) for x in np.asarray(ref.bit_errors[det])], det
    np.testing.assert_allclose(dist["capacity_sum"],
                               np.asarray(ref.capacity_sum), rtol=1e-5)



@pytest.mark.parametrize("n_procs,dpp", [(2, 2), (4, 1)])
@pytest.mark.slow
def test_multi_process_cdl_fused_path(tmp_path, n_procs, dpp):
    """The flagship fused CDL SNR program (cal + calibrator fit + LDPC
    decode, make_fused_cdl_snr_step) across real jax.distributed processes,
    including an asymmetric decomposition (4 procs x 1 device), must match
    the single-process 4-device run: with rng_mode='block' the uncoded
    counters are bit-identical; decoded counters get the codeword-flip band
    (ulp-level batch-shape sensitivity of the XLA CPU matmul — see
    test_rng_mode_block_is_layout_invariant); calibrators are float-close.
    VERDICT r02 #8."""
    from cdl_dist_common import cdl_cfg, make_cdl_root_step

    coord = f"127.0.0.1:{_free_port()}"
    out_file = tmp_path / "proc0.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(n_procs), str(pid),
             str(out_file), "cdl", str(dpp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for pid in range(n_procs)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    rcs = [p.returncode for p in procs]
    assert rcs == [0] * n_procs, "worker rcs=%s\n%s" % (
        rcs, "\n---\n".join(l[-2000:] for l in logs))
    dist = json.loads(out_file.read_text())
    assert dist["process_count"] == n_procs
    assert dist["device_count"] == 4

    cfg = cdl_cfg()
    errs, tot, dec, calib = make_cdl_root_step(cfg, trials_mesh(4))(
        jax.random.PRNGKey(cfg.seed))

    assert dist["cal_total_bits"] == int(tot)
    assert dist["dec_total_bits"] == int(dec.total_bits)
    assert dist["dec_total_info_bits"] == int(dec.total_info_bits)
    for d in ("esn", "mmse"):
        assert dist["cal_bit_errors"][d] == int(errs[d]), ("cal", d)
        assert dist["dec_bit_errors"][d] == int(dec.bit_errors[d]), ("dec", d)
        a_ref, b_ref = calib[d]
        np.testing.assert_allclose(dist["calib"][d][0], np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(dist["calib"][d][1], np.asarray(b_ref),
                                   rtol=1e-4, atol=1e-4)
    k_info = int(dec.total_info_bits) // (
        int(dec.ldpc_codewords) if int(dec.ldpc_codewords) else 1)
    for d in ("esn", "mmse"):
        diff = abs(dist["dec_info_errors"][d] - int(dec.info_errors[d]))
        assert diff <= 2 * k_info, (d, dist["dec_info_errors"][d],
                                    int(dec.info_errors[d]))


@pytest.mark.slow
def test_four_process_collective_overhead_fraction(tmp_path):
    """Timed 4-process asymmetric run (4 procs x 1 device) vs the same
    program on a single-process 4-device mesh: the wall-clock difference
    upper-bounds the cross-process collective + coordination overhead of
    the fused CDL SNR program (VERDICT r04 #4).

    UPPER bound, loudly: the CPU virtual devices share physical cores
    (this host has very few), so process scheduling inflates the
    multi-process number far beyond what ICI/DCN collectives would cost
    on real chips — the analytic model (tools/scaling_model.py) carries
    the hardware prediction; this test pins the measured CPU ceiling and
    guards the multi-process path's performance from regressions."""
    import time
    from cdl_dist_common import cdl_cfg, make_cdl_root_step

    coord = f"127.0.0.1:{_free_port()}"
    out_file = tmp_path / "timed.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, "4", str(pid), str(out_file),
             "cdl_timed", "1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for pid in range(4)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    rcs = [p.returncode for p in procs]
    assert rcs == [0] * 4, "worker rcs=%s\n%s" % (
        rcs, "\n---\n".join(l[-2000:] for l in logs))
    t_4p = json.loads(out_file.read_text())["seconds_per_step"]

    # same program, single process, 4 in-process virtual devices
    cfg = cdl_cfg()
    step = make_cdl_root_step(cfg, trials_mesh(4))
    jax.block_until_ready(step(jax.random.PRNGKey(cfg.seed)))
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        jax.block_until_ready(step(jax.random.PRNGKey(cfg.seed + i)))
    t_1p = (time.perf_counter() - t0) / reps

    frac = max(0.0, (t_4p - t_1p) / max(t_4p, 1e-9))
    print(f"[dist-timing] 4-process {t_4p:.3f}s vs single-process "
          f"{t_1p:.3f}s per step -> cross-process overhead fraction "
          f"{frac:.1%} (CPU shared-core UPPER bound)")
    # Measured 2026-08 on this 2-core container: 1.13 s vs 0.075 s
    # (93.4%) — four process-private XLA thread pools contending for two
    # cores; the inflation is host scheduling, so the collective bound is
    # trivial here and the hardware prediction lives in
    # tools/scaling_model.py. The assertion is a pathological-regression
    # guard only (a deadlocked collective would push the step to many
    # seconds / the 900 s timeout).
    assert t_4p > 0 and t_1p > 0
    assert t_4p < 60.0, f"multi-process step pathologically slow: {t_4p:.1f}s"
