"""Test configuration: run on the CPU backend with 8 virtual devices.

Env vars must be set BEFORE the CPU backend initialises.  In axon-style
environments a sitecustomize module imports jax at interpreter startup with
``JAX_PLATFORMS=axon``, so the env var alone is not enough — the config
update below overrides it at runtime (the CPU client itself initialises
lazily, so the XLA_FLAGS device-count flag still takes effect).

The 8-device virtual CPU mesh is the "multi-node without a cluster" harness
for sharding tests (the reference has no distributed tests; SURVEY §4).
"""

import os

# Set LIGHTFM_TPU_TEST_BACKEND=native to run the suite on the real device
# backend (e.g. to exercise the TPU-only fused Pallas paths); default is the
# 8-virtual-device CPU mesh.
_NATIVE = os.environ.get("LIGHTFM_TPU_TEST_BACKEND") == "native"

_flags = os.environ.get("XLA_FLAGS", "")
if not _NATIVE and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _NATIVE:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # already initialised on another platform
        pass


# --- test tiers ------------------------------------------------------------
# The statistical batteries (oracle parity, accuracy floors, fuzzing, the
# multi-process smoke test) dominate suite wall time on this 1-core CPU
# host.  They are marked `slow` and SKIPPED by default so `pytest -q` stays
# a sub-5-minute CI gate; run the full depth with `--runslow`
# (`make test-full`).


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the slow statistical batteries too",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: statistical battery (skipped unless --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(
        reason="slow statistical battery; run with --runslow (make test-full)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
