"""esn_ofdm_mimo_tpu — a TPU-native OFDM/MIMO physical-layer simulation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
`aoschu/esn-ofdm-mimo` repository (Monte-Carlo link-level OFDM/MIMO simulation
with ESN-based detection, classical ZF/LS/MMSE equalization and LDPC coding).

Design principles (TPU-first, not a port):
  * pure-functional, jittable end to end; explicit PRNG key threading
  * the *coherence block* (channel draw + ESN fit + data symbols) is the unit
    of parallel work: blocks are vmapped into device batches and batches are
    sharded over a `jax.sharding.Mesh` "trials" axis
  * error/bit counters are reduced with `jax.lax.psum`; per-block RNG keys are
    folded from global block ids so sharded runs are layout-independent
  * hot sequential kernels (ESN recurrence, LDPC BP) are built as batched
    scans whose per-step work is MXU-shaped matmuls, with Pallas kernels where
    XLA's stock lowering is not speed-of-light

Layer map (mirrors SURVEY.md §1 for the reference, redesigned):
  ops/        L1 modem primitives + L2 channel models (qam, ofdm, pa, channel,
              chanest, equalize, analytics, llr)
  ldpc/       code construction (host, cached), encoder, batched BP decoder
  models/     L3 learners: ESN engine, ELM, MLP/CNN/RNN zoo, classifiers
  pipelines/  L4 experiment drivers: block-fading NBF, 4x8 CDL, sionna-like
  parallel/   mesh setup, sharded Monte-Carlo engine, collectives
  utils/      rng folding, metrics registry, reporting
  experiments/ presets reproducing the five BASELINE.json configurations
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# The container's sitecustomize pins jax to the axon TPU backend at
# interpreter start, which silently overrides a user's JAX_PLATFORMS env var
# (set e.g. to run experiments on the CPU mesh while the chip is busy).
# Make the env var authoritative again.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# TPU matmuls default to single-pass bf16 on the MXU, which visibly shifts
# BER curves (a bf16 DFT alone floors the simulated EVM near the operating
# points). The framework therefore runs the data path at "high" (3-pass
# bf16, ~f32-accurate) and pins the solver-critical contractions (readout
# gram + Newton-Schulz, models/esn._readout_lstsq /
# ops/linalg_mxu.pd_solve_ns) to HIGHEST explicitly — at anything less the
# readout solve diverges. Validated on the flagship 4x8 CDL curve:
# "high" is BER-identical to "highest" for the classical detectors (same
# keys, 5-digit agreement) and within run-to-run variance for the ESN,
# while +37% detected-symbols/s (docs/ENVIRONMENT.md). Override with
# ESN_TPU_MATMUL_PRECISION={default,high,highest}.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("ESN_TPU_MATMUL_PRECISION", "high"))

from . import ops  # noqa: F401
