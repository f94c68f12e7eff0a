"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective code paths are
exercised without real multi-chip hardware. The container's sitecustomize
registers the axon TPU plugin at interpreter start and pins JAX to it, so we
re-exec pytest once with a cleaned environment before anything imports jax.
"""

import os
import sys

if os.environ.get("BBT_TEST_REEXEC") != "1" and "jax" not in sys.modules:
    env = dict(os.environ)
    env["BBT_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon PJRT registration
    env["JAX_PLATFORMS"] = "cpu"
    xla = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla:
        env["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
