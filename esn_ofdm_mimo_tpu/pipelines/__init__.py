"""L4 experiment drivers: batched coherence-block Monte-Carlo pipelines."""

from .blockfading import run_nbf_blocks, NbfCounts  # noqa: F401
from .common import BlockState, synth_block, detect_data_symbols  # noqa: F401
