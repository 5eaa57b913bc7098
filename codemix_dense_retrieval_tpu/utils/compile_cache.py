"""Persistent XLA compilation cache.

Remote compiles through the axon relay cost 1-10 minutes per program;
JAX's persistent compilation cache keys serialized executables by
(HLO, backend, flags) so a re-run of bench/CLI programs skips the
compile entirely. Harmless where the backend does not support
serialization — JAX logs a warning and compiles as usual.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT_DIR = os.environ.get(
    "CDR_COMPILE_CACHE", os.path.expanduser("~/.cache/cdr_jax_cache")
)


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Idempotently point JAX at a persistent compilation cache dir."""
    import jax

    d = cache_dir or _DEFAULT_DIR
    pathlib.Path(d).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        # cache even mid-sized programs: everything here is worth a disk hit
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: best-effort only
        pass
    return d
