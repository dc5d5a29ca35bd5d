"""Validate the analytic FLOP model (utils/flops.py) used for MFU numbers.

Two kinds of checks:
  * exact: for scan-free programs (fft_mxu) the analytic count must match
    XLA's own cost analysis (which uses the same 2*M*K*N dot convention);
  * bounding: for the full flagship programs XLA counts every while-loop
    body ONCE, so its number is a strict undercount — the analytic count
    must exceed it, but only by a factor explained by the loop trip counts
    (ESN recurrence T~138 steps, NS solve 40 iters, BP 100 iters).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esn_ofdm_mimo_tpu.config import SimConfig
from esn_ofdm_mimo_tpu.experiments.presets import mimo_4x8_cdl
from esn_ofdm_mimo_tpu.utils import flops as fl


def _xla_flops(fn, *args) -> float:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def test_fft_flops_matches_xla_cost():
    from esn_ofdm_mimo_tpu.ops.fft_mxu import fft_mxu
    rows, L = 64, 128
    x = jax.ShapeDtypeStruct((rows, L), jnp.complex64)
    got = _xla_flops(lambda z: fft_mxu(z, axis=-1), x)
    want = fl.fft_flops(rows, L)
    assert abs(got - want) / want < 0.02, (got, want)


def test_esn_predict_flops_bounds_xla():
    """Analytic predict count ~= hoisted part (XLA-counted once) + T * step
    work: the XLA count must sit below ours, and adding back (T-1) missing
    step bodies must roughly recover it."""
    from esn_ofdm_mimo_tpu.models.esn import (EsnScale, esn_predict,
                                              init_reservoir)
    B, T, n_res, n_in, n_out = 4, 50, 64, 16, 8
    res = init_reservoir(jax.random.PRNGKey(0), n_in, n_out, n_res)
    scale = EsnScale(input_scaling=jnp.float32(1.0),
                     input_shift=jnp.float32(0.0),
                     teacher_scaling=jnp.float32(1.0))
    Wt_out = jax.ShapeDtypeStruct((B, n_res + n_in, n_out), jnp.float32)
    x = jax.ShapeDtypeStruct((B, T, n_in), jnp.float32)

    def run(w, z):
        return esn_predict(res, scale, w, z, 0, jax.random.PRNGKey(1))

    got = _xla_flops(run, Wt_out, x)
    want = fl.esn_predict_flops(B, T, n_res, n_in, n_out)
    assert got < want, (got, want)
    # XLA sees the scan body unroll=4 group once -> missing ~(T/4 - 1) of
    # the per-step matmul work; our model must be within ~35% of the
    # reconstruction (elementwise/RNG slop).
    per_step = 2.0 * B * n_res * (n_res + 2 * n_out) + B * n_res
    reconstructed = got + (T - 4) * per_step
    assert abs(reconstructed - want) / want < 0.35, (reconstructed, want)


def test_cdl_flops_bound_and_structure():
    cfg = mimo_4x8_cdl()
    f = fl.cdl_flops(cfg, n_blocks=8)
    assert f.cal_counters < f.cal_full < f.decode_blocks
    # decode at 100 BP iterations dominates the extra decode-phase work
    assert f.decode > f.llr
    # scaling in B is exactly linear (everything is per-block batched)
    f2 = fl.cdl_flops(cfg, n_blocks=16)
    np.testing.assert_allclose(f2.cal_counters, 2 * f.cal_counters, rtol=1e-9)

    # XLA's scan-bodies-once count must be a strict undercount, but within
    # the factor the trip counts explain (< ~80x).
    from esn_ofdm_mimo_tpu.pipelines.cdl import run_cdl_cal_blocks
    small = 2
    ebno = jax.ShapeDtypeStruct((), jnp.float32)
    keys = jax.ShapeDtypeStruct((small, 2), jnp.uint32)

    def counters(e, k):
        out = run_cdl_cal_blocks(cfg, e, k)
        return out.bit_errors, out.total_bits

    got = _xla_flops(counters, ebno, keys)
    want = fl.cdl_flops(cfg, n_blocks=small).cal_counters
    assert got < want < 80 * got, (got, want)
