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


# ---------------------------------------------------------- fast/slow tiers
#
# `pytest -m "not slow"` is the fast CI tier: it must stay under ~15 min on
# one CPU core while still exercising every op/kernel/transform once.  The
# slow tier holds the exhaustive sweeps: the expect-file fingerprint of all
# 123 builders, the live-reference numerical-parity files (which import and
# run the reference's own torch code), full-zoo param parity, and the
# learning-proof training runs.  (Mirrors the reference's split of unit
# tests vs test_models.py expect tier, SURVEY.md §4.)

_SLOW_FILES = {
    "test_expect_models.py",      # all-builder fingerprint sweep
    "test_reference_logits.py",   # live torch reference, every family
    "test_detection_parity.py",   # live reference detection forwards
    "test_param_parity.py",       # 79-builder param table vs reference
    "test_learning.py",           # held-out learning proofs (training)
    "test_references_detection.py",
    "test_references_flow_similarity.py",
    "test_model_coverage.py",     # inits every registered builder
    "test_models_extra.py",       # heavy forward passes (maxvit/mvit/...)
    "test_fcos_ssdlite_maxvit.py",
    "test_video_swin.py",
    "test_stereo.py",
    "test_qat.py",
    # measured >2 min/file on one core (see round-3 timing pass): full
    # detection-model forwards and exhaustive dataset-layout sweeps; their
    # ops/parsers stay covered in the fast tier by test_detection,
    # test_boxes_roi and test_datasets_simple/longtail
    "test_detection_extra.py",
    "test_models.py",
    "test_faster_rcnn.py",
    "test_datasets_extra.py",
    "test_datasets_utils_train.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _SLOW_FILES or fname.endswith("_vs_reference.py"):
            item.add_marker(pytest.mark.slow)


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
