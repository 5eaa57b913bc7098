"""Multi-host (multi-slice) support.

The reference is single-host (SURVEY §2.3: no NCCL/MPI/collectives).
The TPU framework scales past one host with `jax.distributed`: every
host calls :func:`initialize_multihost` before any jax use, then builds
the global mesh — index rows shard across ALL devices; the search
all-gather rides ICI within a slice and crosses DCN only for the tiny
(k x devices) merge payload (SURVEY §5 "distributed communication
backend").

Single-host callers never need this module; everything degrades to the
local device list.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns True when running multi-process."""
    import jax

    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if not coord or nproc <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    return True


def global_mesh(shard: int = -1, tp: int = 1, axis_names=("shard", "tp")):
    """Mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize)."""
    from codemix_dense_retrieval_tpu.parallel.mesh import make_mesh

    return make_mesh(shard=shard, tp=tp, axis_names=axis_names)


def process_local_rows(n_total: int, rows_per_shard: int) -> range:
    """Row range this process materializes when feeding
    ``jax.make_array_from_process_local_data``-style uploads: processes own
    contiguous device blocks, so the local range is [first_local_shard *
    rows_per_shard, ...)."""
    import jax

    devs = jax.local_devices()
    all_devs = jax.devices()
    first = min(all_devs.index(d) for d in devs)
    start = first * rows_per_shard
    stop = min(n_total, start + rows_per_shard * len(devs))
    return range(start, max(start, stop))
