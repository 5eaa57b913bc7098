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


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def shard_rows_multihost(
    rows_fn,
    n_total: int,
    dim: int,
    dtype,
    mesh,
    *,
    axis: str = "shard",
    pad_multiple: int = 1024,
):
    """Multi-process analog of ``parallel.sharded_search.shard_rows``.

    Single-process ``shard_rows`` takes the full (N, d) host array; across
    processes that would force every host to materialize the whole corpus.
    Here each process supplies only ITS rows: ``rows_fn(start, stop)``
    returns the (stop-start, dim) block for a global row range, and is
    called only for ranges inside this process's
    :func:`process_local_rows` window (``jax.make_array_from_callback``
    invokes the callback for addressable shards only).

    Returns the same contract as ``shard_rows``:
    (docs (S*rows_per_shard, d) sharded P(axis, None),
     per-shard valid-row counts (S,) sharded P(axis),
     rows_per_shard).
    """
    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    s = mesh.shape[axis]
    rows_per_shard = _ceil_to(max(1, -(-n_total // s)), pad_multiple)
    n_pad = rows_per_shard * s
    counts_np = np.clip(
        n_total - rows_per_shard * np.arange(s), 0, rows_per_shard
    ).astype(np.int32)

    local = process_local_rows(n_pad, rows_per_shard)

    def _cb(index):
        start = index[0].start or 0
        stop = min(index[0].stop or n_pad, n_total)
        if not (local.start <= start and stop <= local.stop or start >= n_total):
            raise RuntimeError(
                f"non-local shard requested: [{start}, {stop}) outside "
                f"process-local rows [{local.start}, {local.stop})"
            )
        block = np.zeros((rows_per_shard, dim), dtype=dtype)
        if start < n_total:
            block[: stop - start] = rows_fn(start, stop)
        return block

    docs = jax.make_array_from_callback(
        (n_pad, dim), NamedSharding(mesh, P(axis, None)), _cb
    )
    counts = jax.make_array_from_callback(
        (s,), NamedSharding(mesh, P(axis)), lambda idx: counts_np[idx]
    )
    return docs, counts, rows_per_shard
