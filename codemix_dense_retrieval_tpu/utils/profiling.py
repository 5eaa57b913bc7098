"""Profiling hooks (SURVEY §5: the reference has only tqdm/log timing;
here jax.profiler traces are a first-class, env-gated facility)."""

from __future__ import annotations

import contextlib
import os
import pathlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def maybe_trace(name: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace when CDR_PROFILE_DIR (or ``trace_dir``)
    is set; otherwise a no-op. View with TensorBoard / xprof."""
    target = trace_dir or os.environ.get("CDR_PROFILE_DIR")
    if not target:
        yield
        return
    import jax

    out = pathlib.Path(target) / name
    out.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out)):
        yield


def timed_device_fn(fn, *args, iters: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Robust device timing: block_until_ready + a host transfer per
    iteration (async-dispatch platforms under-report otherwise)."""
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "iters": iters}
