"""Multi-host initialization and collective helpers.

Replaces the reference's NCCL process-group setup
(icefall.dist.setup_dist, ref trainer.py:52,867) with
``jax.distributed.initialize``: under a TPU pod slice each host sees its
local chips, GSPMD handles cross-host collectives over ICI/DCN.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0
