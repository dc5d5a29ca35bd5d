"""Model/state checkpointing: save/load arbitrary pytrees of arrays.

The reference never persists model weights (SURVEY.md §5 — results only);
here any pytree (ESN reservoir + readouts, calibrator (a, b), RNG keys,
counter accumulators) round-trips through one .npz file, so a preempted run
can restore exactly. Loading reuses the caller's pytree structure (`like`),
with the stored structure string checked against it.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, os.path.basename(path) + ".tmp.npz")
    np.savez(tmp, __structure__=np.array(str(treedef)), **arrays)
    os.replace(tmp, path)


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like`."""
    leaves_like, treedef = jax.tree.flatten(like)
    with np.load(path, allow_pickle=False) as data:
        stored = str(data["__structure__"])
        if stored != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch:\n saved: {stored}\n "
                f"expected: {treedef}")
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, leaves)
