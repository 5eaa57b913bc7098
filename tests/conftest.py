"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (``jax_platforms=cpu`` +
``--xla_force_host_platform_device_count=8``) so the sharded-search /
collective paths are exercised without TPU hardware, per SURVEY §4.

The environment's sitecustomize imports jax and registers a TPU PJRT
plugin before conftest runs, so the platform is flipped in-process via
``jax.config`` (safe because backends initialize lazily, on first device
access — which has not happened at conftest import time). Set
``CDR_TEST_TPU=1`` to run the suite on the real TPU chip instead (slow:
remote compiles).
"""

import os
import pathlib
import sys

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO_ROOT))

if os.environ.get("CDR_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # the in-process config flip below does NOT export to child
    # processes: scheduler-spawned CLI jobs (test_repro_roundtrip,
    # test_cli_orchestrate) inherit the environment's JAX_PLATFORMS=axon
    # and silently ran on the REAL TPU — passing when the relay was
    # free, deadlocking the suite when another process held the chip.
    # cli.main() honors JAX_PLATFORMS=cpu, so exporting it pins children.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_cpu_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip(f"need 8 devices for mesh tests, have {len(devs)}")
    return devs[:8]


@pytest.fixture(scope="session")
def fastio_lib():
    """Build (if needed) and return the native fast-IO module, else skip."""
    from codemix_dense_retrieval_tpu.io import _fastio

    if not _fastio.available() and not _fastio.build():
        pytest.skip("native fastio unavailable (no g++/make)")
    return _fastio
