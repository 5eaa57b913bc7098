"""On-chip autotuning for kernel and routing constants.

Every tile size, cover parameter, and dispatch crossover in ``ops/``
was measured on ONE dev chip (BENCH_NOTES); other TPU generations (or
future compiler versions) can prefer different configs. ``tune`` sweeps
the hot configurations on the LIVE backend and persists the winners to
a per-device-kind JSON that the auto pickers consult
(`ops.topk._auto_super_size`, the flash-attention dispatch), falling
back to the measured constants when no tuning file exists.

This replaces FAISS's parameter-space autotuner role
(`faiss.ParameterSpace`) for the TPU kernels: the reference relies on
FAISS's internally tuned GPU kernels (`onepass_dense_run.py:306-310`);
here the tuning is explicit, inspectable, and per-device-kind.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import tempfile
from typing import Dict, Optional, Sequence

_CACHE: Optional[Dict[str, object]] = None
_CACHE_PATH: Optional[str] = None

#: measured-on-dev-chip fallbacks (BENCH_NOTES r2/r3)
DEFAULTS = {
    "topk.super_size": 8,
    "topk.tile_b": 512,
    "topk.bin_size": 8,
    "flash.min_seq": 512,
    "flash.window": 2048,
}


def _device_kind_slug() -> str:
    try:
        import jax

        kind = jax.devices()[0].device_kind
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        kind, backend = "unknown", "none"
    return re.sub(r"[^A-Za-z0-9_.-]+", "-", f"{backend}-{kind}").lower()


def tune_file_path() -> pathlib.Path:
    """Tuning-store location: $CDR_TUNE_FILE or a per-device-kind file
    under ~/.cache (so one home dir can serve mixed fleets)."""
    env = os.environ.get("CDR_TUNE_FILE")
    if env:
        return pathlib.Path(env)
    root = pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", pathlib.Path.home() / ".cache")
    )
    return root / "codemix_dense_retrieval_tpu" / f"tuned-{_device_kind_slug()}.json"


def invalidate_cache() -> None:
    global _CACHE, _CACHE_PATH
    _CACHE, _CACHE_PATH = None, None


def load_tuned() -> Dict[str, object]:
    """Load (and memoize) the tuning store; {} when absent/corrupt."""
    global _CACHE, _CACHE_PATH
    path = str(tune_file_path())
    if _CACHE is not None and _CACHE_PATH == path:
        return _CACHE
    data: Dict[str, object] = {}
    try:
        with open(path) as f:
            raw = json.load(f)
        if isinstance(raw, dict):
            data = raw
    except (OSError, ValueError):
        data = {}
    _CACHE, _CACHE_PATH = data, path
    return data


def get_tuned(key: str, default=None, *, k: Optional[int] = None):
    """Look up a tuned value. With ``k``, ``key.k<k>`` takes precedence
    over the bare ``key`` (per-depth overrides); built-in DEFAULTS back
    everything."""
    store = load_tuned()
    if k is not None:
        v = store.get(f"{key}.k{k}")
        if v is not None:
            return v
    v = store.get(key)
    if v is not None:
        return v
    if default is not None:
        return default
    return DEFAULTS.get(key)


def save_tuned(update: Dict[str, object]) -> pathlib.Path:
    """Merge ``update`` into the store atomically."""
    path = tune_file_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    merged = dict(load_tuned())
    merged.update(update)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(merged, f, indent=2, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    invalidate_cache()
    return path


# --------------------------------------------------------------------------
# sweeps
# --------------------------------------------------------------------------

def _timed(fn, *args, iters: int = 3) -> float:
    from codemix_dense_retrieval_tpu.utils.profiling import timed_device_fn

    return timed_device_fn(fn, *args, iters=iters, warmup=1)["mean_s"]


def autotune_topk(
    *,
    rows: int = 262_144,
    dim: int = 1024,
    batch: int = 512,
    ks: Sequence[int] = (100, 1000),
    super_sizes: Sequence[int] = (4, 8, 16),
    tile_bs: Sequence[int] = (256, 512, 1024),
    bin_sizes: Sequence[int] = (8, 16),
    iters: int = 3,
    seed: int = 0,
    interpret: Optional[bool] = None,
) -> Dict[str, object]:
    """Sweep the two-level cover's (bin_size, super_size, tile_b) per
    depth on a synthetic normalized corpus; returns tuned keys +
    measured qps. The bin_size axis exists because the slice-gather tail
    is issue-bound: larger G shrinks the super-top_k domain at unchanged
    gather issue count but grows the final top_k domain — the balance is
    chip-specific."""
    import functools

    import jax.numpy as jnp
    import numpy as np

    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

    tile_bs = [tb for tb in tile_bs if tb <= batch] or [batch]
    rng = np.random.default_rng(seed)
    docs = rng.standard_normal((rows, dim)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs = jnp.asarray(docs, jnp.bfloat16)
    q = rng.standard_normal((batch, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q, jnp.bfloat16)

    out: Dict[str, object] = {}
    for k in ks:
        best = None
        for g in bin_sizes:
            for m in super_sizes:
                for tb in tile_bs:
                    if tb > batch:
                        continue
                    import jax

                    fn = jax.jit(functools.partial(
                        topk_ip_bins_two_level, k=k, bin_size=g,
                        super_size=m, tile_b=tb, interpret=interpret,
                    ))
                    dt = _timed(lambda a, b: fn(a, b)[0], q, docs, iters=iters)
                    qps = batch / dt
                    if best is None or qps > best[0]:
                        best = (qps, g, m, tb)
        assert best is not None
        out[f"topk.bin_size.k{k}"] = best[1]
        out[f"topk.super_size.k{k}"] = best[2]
        out[f"topk.tile_b.k{k}"] = best[3]
        out[f"topk.qps.k{k}"] = round(best[0], 1)
    return out


def autotune_flash(
    *,
    heads: int = 16,
    head_dim: int = 64,
    batch: int = 8,
    seqs: Sequence[int] = (128, 256, 512, 1024),
    windows: Sequence[int] = (1024, 2048, 4096),
    long_seq: int = 4096,
    iters: int = 3,
    seed: int = 0,
) -> Dict[str, object]:
    """Find the flash/XLA dispatch crossover (`flash.min_seq`) and the
    best K/V window (`flash.window`) on the live chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codemix_dense_retrieval_tpu.ops.flash_attention import (
        attention_flash,
        attention_xla,
    )

    rng = np.random.default_rng(seed)

    def mk(s, b=batch):
        x = jnp.asarray(
            rng.standard_normal((b, heads, s, head_dim)), jnp.bfloat16
        )
        return x, jnp.full((b,), s, jnp.int32)

    crossover = None
    for s in sorted(seqs):
        x, ln = mk(s)
        tf = _timed(jax.jit(
            lambda a, l: jnp.sum(attention_flash(a, a, a, l).astype(jnp.float32))
        ), x, ln, iters=iters)
        tx = _timed(jax.jit(
            lambda a, l: jnp.sum(attention_xla(a, a, a, l).astype(jnp.float32))
        ), x, ln, iters=iters)
        if tf < tx and crossover is None:
            crossover = s
    out: Dict[str, object] = {
        # dispatch uses s > min_seq; crossover seq itself should flash
        "flash.min_seq": (crossover - 1) if crossover else max(seqs),
    }

    best = None
    x, ln = mk(long_seq, b=max(1, batch // 4))
    for w in windows:
        t = _timed(jax.jit(
            lambda a, l, w=w: jnp.sum(
                attention_flash(a, a, a, l, window=w).astype(jnp.float32))
        ), x, ln, iters=iters)
        if best is None or t < best[0]:
            best = (t, w)
    assert best is not None
    out["flash.window"] = best[1]
    return out


def run_autotune(
    *,
    topk: bool = True,
    flash: bool = True,
    save: bool = True,
    **kwargs,
) -> Dict[str, object]:
    """Run the requested sweeps and persist winners; returns the update."""
    update: Dict[str, object] = {}
    if topk:
        tk = {k: v for k, v in kwargs.items()
              if k in ("rows", "dim", "batch", "ks", "super_sizes",
                       "tile_bs", "iters", "interpret")}
        update.update(autotune_topk(**tk))
    if flash:
        fl = {k: v for k, v in kwargs.items()
              if k in ("heads", "head_dim", "seqs", "long_seq", "iters")}
        update.update(autotune_flash(**fl))
    if save:
        update["_device"] = _device_kind_slug()
        save_tuned(update)
    return update
