"""Worker process for the multi-process jax.distributed tests.

Launched by tests/test_distributed.py as

    python distributed_worker.py <coordinator> <num_procs> <proc_id> <out> \
        [mode=nbf|cdl] [devices_per_process=2]

Each process contributes `devices_per_process` virtual CPU devices; after
`maybe_init_distributed()` the global mesh spans num_procs * dpp devices
and the fused program (whose only input, the root key, is replicated —
per-block keys fold on device, so no host array ever needs cross-process
sharding) runs one shard_map program with psum'd counters. Process 0
writes the counters to <out> as JSON.

mode=nbf runs the fused NBF grid; mode=cdl runs the flagship fused
CDL SNR step (cal rounds + calibrator fit + LDPC decode rounds,
parallel/montecarlo.make_fused_cdl_snr_step) — the multi-host coverage
VERDICT r02 #8 asked for.

This executes the real multi-process path of parallel/mesh.py —
jax.distributed.initialize via coordinator env vars — that single-process
CPU-mesh tests cannot reach (SURVEY.md §5 distributed backend).
"""
import json
import os
import sys

# running as a script puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MODE = sys.argv[5] if len(sys.argv) > 5 else "nbf"
_DPP = int(sys.argv[6]) if len(sys.argv) > 6 else 2

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_DPP}").strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[1]
os.environ["JAX_NUM_PROCESSES"] = sys.argv[2]
os.environ["JAX_PROCESS_ID"] = sys.argv[3]

import jax  # noqa: E402

# the container's sitecustomize pins the axon TPU platform at interpreter
# start; flip the already-imported config back to CPU before any backend init
jax.config.update("jax_platforms", "cpu")

from esn_ofdm_mimo_tpu.config import (  # noqa: E402
    SimConfig, OfdmConfig, ChannelConfig, EsnConfig, LdpcConfig)
from esn_ofdm_mimo_tpu.parallel.mesh import (  # noqa: E402
    maybe_init_distributed, trials_mesh)
from esn_ofdm_mimo_tpu.parallel.montecarlo import make_fused_nbf_grid  # noqa: E402


def tiny_cfg():
    # must match tests/test_distributed.py::_cfg exactly
    return SimConfig(
        name="dist_tiny",
        ofdm=OfdmConfig(n_subcarriers=32, bits_per_symbol=4,
                        doppler_hz=3000.0),
        channel=ChannelConfig(kind="exp_pdp", n_tx=1, n_rx=1),
        esn=EsnConfig(n_reservoir=40, train_ebno_fixed_db=None),
        ldpc=LdpcConfig(enabled=False),
        ebno_db=(12.0,))


def run_nbf():
    cfg = tiny_cfg()
    mesh = trials_mesh()
    grid = make_fused_nbf_grid(cfg, mesh, blocks_per_device=1, rounds=2)
    out = grid(jax.random.PRNGKey(cfg.seed))
    # out_specs are replicated -> every process holds the full counters
    return {
        "bit_errors": {k: [int(x) for x in jax.device_get(v)]
                       for k, v in out.bit_errors.items()},
        "total_bits": [int(x) for x in jax.device_get(out.total_bits)],
        "capacity_sum": [float(x) for x in jax.device_get(out.capacity_sum)],
        "n_blocks": [int(x) for x in jax.device_get(out.n_blocks)],
    }


def run_cdl(timed: bool = False):
    from cdl_dist_common import cdl_cfg, make_cdl_root_step
    cfg = cdl_cfg()
    mesh = trials_mesh()
    step = make_cdl_root_step(cfg, mesh)
    if timed:
        # collective-overhead measurement (VERDICT r04 #4): warm up
        # (compile + first run), then time N repeats of the fused CDL
        # SNR program. On CPU the virtual devices share physical cores,
        # so the multi-process wall is an UPPER bound on collective +
        # process-coordination overhead — documented in SCALING.md.
        import time
        jax.block_until_ready(step(jax.random.PRNGKey(cfg.seed)))
        reps, t0 = 3, time.perf_counter()
        for i in range(reps):
            jax.block_until_ready(step(jax.random.PRNGKey(cfg.seed + i)))
        return {"seconds_per_step": (time.perf_counter() - t0) / reps}
    errs, tot, dec, calib = step(jax.random.PRNGKey(cfg.seed))
    return {
        "cal_bit_errors": {k: int(v) for k, v in errs.items()},
        "cal_total_bits": int(tot),
        "dec_bit_errors": {k: int(v) for k, v in dec.bit_errors.items()},
        "dec_info_errors": {k: int(v) for k, v in dec.info_errors.items()},
        "dec_total_bits": int(dec.total_bits),
        "dec_total_info_bits": int(dec.total_info_bits),
        "calib": {k: [[float(x) for x in jax.device_get(a)],
                      [float(x) for x in jax.device_get(b)]]
                  for k, (a, b) in calib.items()},
    }


def main():
    num_procs = int(sys.argv[2])
    assert maybe_init_distributed(), "coordinator env vars not picked up"
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == _DPP * num_procs, jax.device_count()

    if _MODE == "cdl_timed":
        res = run_cdl(timed=True)
    elif _MODE == "cdl":
        res = run_cdl()
    else:
        res = run_nbf()
    res["process_count"] = jax.process_count()
    res["device_count"] = jax.device_count()
    if jax.process_index() == 0:
        with open(sys.argv[4], "w") as f:
            json.dump(res, f)


if __name__ == "__main__":
    main()
