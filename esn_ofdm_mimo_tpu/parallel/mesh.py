"""Device mesh setup for sharded Monte-Carlo simulation.

The reference has no parallelism of any kind (SURVEY.md §2.4); here the
primary sharding axis is `trials` — independent coherence blocks — which maps
Monte-Carlo work data-parallel across chips/hosts with only a psum of the
error counters at the end of each round. Multi-host runs call
`maybe_init_distributed()` first (jax.distributed coordinator), after which
`jax.devices()` spans the pod slice and the same mesh code works unchanged.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

TRIALS_AXIS = "trials"


def device_count() -> int:
    return jax.device_count()


def trials_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over (up to) all visible devices with axis name 'trials'."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (TRIALS_AXIS,))


def maybe_init_distributed() -> bool:
    """Initialise jax.distributed from standard env vars if present.

    Returns True if a multi-process group was initialised. Single-process
    runs (tests, single chip) skip this and use the local devices only.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        return True
    return False
