"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (``JAX_PLATFORMS=cpu`` +
``--xla_force_host_platform_device_count=8``) so the sharded-search /
collective paths are exercised without TPU hardware, per SURVEY §4.

This environment registers an 'axon' TPU PJRT plugin via a sitecustomize
hook that overrides in-process env vars, so we re-exec pytest once with a
clean environment before JAX is imported. Set ``CDR_TEST_TPU=1`` to run
the suite on the real TPU chip instead (slow: remote compiles).
"""

import os
import pathlib
import sys

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

if (
    os.environ.get("CDR_TEST_REEXEC") != "1"
    and os.environ.get("CDR_TEST_TPU") != "1"
    and "jax" not in sys.modules
):
    env = dict(os.environ)
    env["CDR_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    # Drop the axon sitecustomize dir from PYTHONPATH so the TPU plugin
    # does not register and override JAX_PLATFORMS.
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and "axon" not in p]
    parts.insert(0, str(_REPO_ROOT))
    env["PYTHONPATH"] = os.pathsep.join(parts)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

sys.path.insert(0, str(_REPO_ROOT))

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
