"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference repo has no unit tests (its CI is GPU-cluster E2E only, reference
.gitlab-ci.yml:58-88); this suite is the "fake backend" replacement —
single-process, CPU devices, multi-chip sharding validated on a virtual mesh.
"""

import os

# Must happen before any backend is initialized. The image pins
# JAX_PLATFORMS=axon (real TPU) at a level that overrides the env var, so the
# reliable switch is jax.config.update after import, before first use. Unit
# tests validate semantics on an 8-device virtual CPU mesh; TPU perf runs
# live in bench.py.
import re

flags = os.environ.get("XLA_FLAGS", "")
m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(m.group(1)) < 8:
    # The suite hard-requires 8 virtual devices; a developer's exported
    # smaller count would fail every mesh fixture with opaque errors.
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
