"""Worker script for the 2-process jax.distributed smoke test.

Each process initialises the distributed runtime (CPU backend, one local
device), builds ONLY ITS SLICE of the training interactions through
``build_local_train_data``, and runs a short WARP fit over a 2-device data
mesh with host-local shuffles.  Run by tests/test_multihost.py.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import os
import sys


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lightfm_tpu.parallel import initialize_multihost

    initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == num_processes  # one CPU device per process

    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp

    from lightfm_tpu.config import Hyperparams
    from lightfm_tpu.parallel import build_local_train_data, make_mesh, shard_state
    from lightfm_tpu.sparse import identity_rows
    from lightfm_tpu.state import init_state
    from lightfm_tpu.train import run_epochs

    # Deterministic global dataset; each process keeps only its slice
    # (round-robin by example index — any partition works).
    rng = np.random.RandomState(0)
    n_users, n_items, nnz = 128, 96, 4096
    rows = rng.randint(0, n_users, nnz).astype(np.int32)
    cols = rng.randint(0, n_items, nnz).astype(np.int32)
    full = sp.coo_matrix(
        (np.ones(nnz, np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    full.sum_duplicates()
    n_global = full.nnz

    mine = np.arange(n_global) % num_processes == process_id
    local = sp.coo_matrix(
        (full.data[mine], (full.row[mine], full.col[mine])), shape=full.shape
    )

    mesh = make_mesh(n_data=num_processes, n_model=1)
    hp = Hyperparams(no_components=8, loss="warp", batch_size=256)
    data = build_local_train_data(
        local, None,
        identity_rows(n_users), identity_rows(n_items),
        hp, 256, mesh, n_examples_global=n_global,
        global_positives=sp.csr_matrix(full),
    )

    state = shard_state(
        init_state(8, n_items, n_users, np.random.RandomState(10), adagrad=True),
        mesh, "replicated",
    )
    seeds = np.random.RandomState(10).randint(0, 2**31 - 1, 2).astype(np.uint32)
    state = run_epochs(state, data, jnp.asarray(seeds), hp, 256, mesh=mesh,
                       shuffle="local")

    table = np.asarray(jax.device_get(state.item_table))
    if not np.all(np.isfinite(table)):
        return 2
    if np.abs(table).max() == 0:
        return 3
    np.save(out_path, table)
    return 0


if __name__ == "__main__":
    sys.exit(main())
