"""Relay-proof device bootstrap.

The dev TPU is reached through a network relay that can be *down* in a
way ``jax`` does not surface as an exception: ``jax.devices()`` simply
blocks (observed for hours).  Any driver entry point that touches the
backend unguarded therefore risks hanging until an external timeout
kills it — turning a healthy framework into a red record.

This module gives every entry point a bounded, deadlock-free way to
decide between the real accelerator and a virtual CPU mesh:

- :func:`probe_device_count` asks a **subprocess** (never this process)
  how many devices a fresh ``jax`` sees, with a hard deadline.  A hung
  relay costs ``timeout`` seconds, not the round.
- :func:`force_cpu_platform` flips the current process to an
  ``n``-device virtual CPU platform even after the env's sitecustomize
  pinned the TPU plugin (clears backend caches first, same recipe as
  tests/conftest.py).
- :func:`ensure_devices` composes the two: probe, use the real devices
  when they can satisfy the request, otherwise fall back to CPU.

Design note: the in-process backend is only ever initialized *after*
a successful subprocess probe, so this process never blocks inside
``xla_bridge`` holding its lock — the failure mode that made a
daemon-thread-with-timeout approach deadlock-prone (the hung thread
would hold ``_backend_lock`` and the CPU fallback needs it too).
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]

PROBE_TIMEOUT_ENV = "CDR_DEVICE_PROBE_TIMEOUT"
DEFAULT_PROBE_TIMEOUT = 90.0  # relay backend init takes ~10-30 s when up

_PROBE_SNIPPET = "import jax; print('DEVCOUNT=%d' % len(jax.devices()))"


def probe_timeout() -> float:
    try:
        return float(os.environ.get(PROBE_TIMEOUT_ENV, DEFAULT_PROBE_TIMEOUT))
    except ValueError:
        return DEFAULT_PROBE_TIMEOUT


def probe_device_count(timeout: float | None = None) -> int:
    """Device count a fresh python process sees, or 0 on hang/failure.

    Runs in a subprocess with a hard deadline so a dead relay (where
    ``jax.devices()`` blocks forever in-process) costs ``timeout``
    seconds instead of the caller's life.  The child runs from the repo
    root with the environment INHERITED UNCHANGED: the axon PJRT plugin
    registers through the env's own ``PYTHONPATH`` sitecustomize, so
    stripping or overriding PYTHONPATH silently downgrades every probe
    to CPU-only (measured; only *additional* PYTHONPATH entries break
    registration).
    """
    if timeout is None:
        timeout = probe_timeout()
    env = dict(os.environ)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET],
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=str(_REPO_ROOT),
            env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return 0
    if out.returncode != 0:
        return 0
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("DEVCOUNT="):
            try:
                return int(line.split("=", 1)[1])
            except ValueError:
                return 0
    return 0


def force_cpu_platform(n_devices: int):
    """Flip this process to an ``n_devices``-way virtual CPU platform.

    Safe to call after the sitecustomize pinned the TPU plugin but
    before any in-process backend touch: clears the backend caches,
    then re-points ``jax_platforms``/``jax_num_cpu_devices``.
    Returns the device list.
    """
    import jax

    try:
        from jax._src import xla_bridge as xb

        xb._clear_backends()
        xb.get_backend.cache_clear()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", max(n_devices, 1))
    except Exception:
        # Older jax: XLA_FLAGS is honored only if the CPU client has
        # never been created in this process.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"could not bootstrap {n_devices} CPU devices (have {len(devs)})"
        )
    return devs[:n_devices]


def ensure_devices(n_devices: int, timeout: float | None = None):
    """Return >= n_devices jax devices without ever hanging on the relay.

    Order of preference:
    1. ``CDR_FORCE_CPU_MESH=1`` or an already-CPU platform: virtual mesh.
    2. A subprocess probe (time-bounded) reports >= n real devices:
       initialize the real backend in-process.
    3. Otherwise: virtual ``n_devices``-way CPU mesh.
    """
    import jax

    if os.environ.get("CDR_FORCE_CPU_MESH") == "1" or (
        os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
    ):
        return force_cpu_platform(n_devices)
    if getattr(jax.config, "jax_platforms", None) == "cpu":
        return force_cpu_platform(n_devices)

    if probe_device_count(timeout) >= n_devices:
        # The probe just answered, so an in-process init is near-certain
        # to return promptly; a relay dying in this window is the one
        # residual (and externally-timed-out) risk.
        devs = jax.devices()
        if len(devs) >= n_devices:
            return devs[:n_devices]
    return force_cpu_platform(n_devices)


def tpu_available(timeout: float | None = None, retries: int = 1) -> bool:
    """Bounded check that a real (non-CPU) backend answers.

    Used by bench.py to decide between the TPU workload and an honest
    CPU-fallback record when the relay is down.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return False
    for _ in range(max(1, retries)):
        if probe_device_count(timeout) >= 1:
            return True
    return False
