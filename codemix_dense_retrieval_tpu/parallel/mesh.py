"""Device-mesh construction.

The reference's only multi-device mechanisms are process-per-GPU job
scheduling and accelerate layer placement (SURVEY §2.3). The TPU-native
replacement is one ``jax.sharding.Mesh`` with two axes:

- ``shard``: corpus rows (the index's data-parallel axis; search
  collectives ride ICI on this axis);
- ``tp``: tensor parallelism for large encoders (Qwen3-4B/8B).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shard: int = -1,
    tp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names=("shard", "tp"),
) -> Mesh:
    """Build a (shard, tp) mesh. ``shard=-1`` uses all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shard == -1:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        shard = n // tp
    if shard * tp > n:
        raise ValueError(f"mesh {shard}x{tp} needs {shard * tp} devices, have {n}")
    grid = np.asarray(devs[: shard * tp]).reshape(shard, tp)
    return Mesh(grid, axis_names)


def shard_axis_size(mesh: Mesh, axis: str = "shard") -> int:
    return mesh.shape[axis]
