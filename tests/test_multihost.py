"""2-process jax.distributed smoke test (CPU backend).

Validates the actual multi-process runtime path — initialize_multihost,
per-host ingestion via build_local_train_data (each process packs only its
slice), and a sharded WARP fit with host-local shuffles — by launching two
real processes against a local coordinator.  The reference has nothing
multi-process to compare against (SURVEY §2.3); this is the repo's own
BASELINE north-star path.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# Statistical battery: skipped by default, run via --runslow (make test-full).
pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fit(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"table_{i}.npy") for i in range(2)]
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        # repo_root ONLY: deliberately drops any ambient sitecustomize dir
        # (e.g. axon's) whose import would initialise an XLA backend before
        # jax.distributed.initialize runs in the worker.
        "PYTHONPATH": repo_root,
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out.decode(errors="replace"))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"

    # Replicated tables must agree across processes bit-for-bit.
    t0, t1 = np.load(outs[0]), np.load(outs[1])
    assert np.array_equal(t0, t1)
