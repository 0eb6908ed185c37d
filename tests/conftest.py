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

if not _NATIVE:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # already initialised on another platform
        pass
