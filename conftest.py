"""Root pytest bootstrap: re-exec onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and pins JAX to the single real TPU chip; env changes after
startup cannot undo that, so the suite re-execs itself with a cleaned
environment. The re-exec must happen in ``pytest_cmdline_main`` (not at
conftest import): during initial conftest loading pytest's fd-level capture
is active, and a child exec'ed there would inherit the capture tmpfile as
stdout and its report would vanish. By ``pytest_cmdline_main`` the global
capture has been suspended and fd 1 is the real console again.
"""

import os
import sys

import pytest


@pytest.hookimpl(tryfirst=True)
def pytest_cmdline_main(config):
    if os.environ.get("BBT_TEST_REEXEC") == "1":
        return None
    if os.environ.get("BBT_TPU_TESTS") == "1":
        return None  # run on the real TPU (for -m tpu tests)
    env = dict(os.environ)
    env["BBT_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon PJRT registration
    env["JAX_PLATFORMS"] = "cpu"
    xla = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla:
        env["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *config.invocation_params.args],
        env,
    )
