"""Deterministic PRNG key folding.

Every random draw in a simulation is derived by folding structured integers
(snr index, global block id, purpose tag) into one root key, so that a run
sharded N ways draws bit-identical randomness to a single-device run — the
bit-reproducibility requirement of SURVEY.md §4/§7.
"""
from __future__ import annotations

import jax


def fold_key(key, *ids):
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def block_keys(root, snr_idx, block_ids):
    """Vectorised per-block keys: fold snr then each global block id.

    block_ids: (B,) int32 array of *global* block indices; returns (B,) keys.
    """
    k = jax.random.fold_in(root, snr_idx)
    return jax.vmap(lambda b: jax.random.fold_in(k, b))(block_ids)
