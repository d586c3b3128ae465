"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding code is
exercised without TPU hardware (the piece the reference's test suite lacks —
see SURVEY.md §4).

The container's sitecustomize registers and initialises the `axon` TPU
backend in every Python process before user code runs, so an in-process
`JAX_PLATFORMS=cpu` is too late — we re-exec pytest once with a clean
environment.  Set ``CVT_TEST_TPU=1`` to run the suite on the real TPU chip
instead.
"""

import os
import sys


def _needs_cpu_reexec() -> bool:
    return (
        os.environ.get("_CVT_CPU_REEXEC") != "1"
        and os.environ.get("CVT_TEST_TPU") != "1"
        and (os.environ.get("JAX_PLATFORMS") != "cpu" or bool(os.environ.get("PALLAS_AXON_POOL_IPS")))
    )


def pytest_configure(config):
    if not _needs_cpu_reexec():
        return
    env = dict(os.environ)
    env["_CVT_CPU_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disables the axon sitecustomize hook
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # restore real stdout/stderr before replacing the process, else the
    # re-exec'd pytest writes into this process's capture tempfiles
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _prevent_leaking_rng():
    """Keep NumPy's global RNG deterministic per-test (mirrors the reference's
    ``prevent_leaking_rng`` fixture, ``test/conftest.py:102``)."""
    state = np.random.get_state()
    yield
    np.random.set_state(state)
