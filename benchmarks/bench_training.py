"""Training throughput across the BASELINE.json configs.

Usage: python benchmarks/bench_training.py [--config quickstart|5m|25m|all]

Synthetic stand-ins are used where real datasets need network egress; shapes
and sparsity match the named configs.  Numbers print as JSON lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp


def _timed_epochs(coo, D, epochs, batch_size=None, loss="warp"):
    import jax
    import jax.numpy as jnp

    from lightfm_tpu import LightFM

    model = LightFM(loss=loss, no_components=D, random_state=10, batch_size=batch_size)
    model.fit(coo, epochs=epochs)  # includes compile
    model = LightFM(loss=loss, no_components=D, random_state=10, batch_size=batch_size)
    t0 = time.perf_counter()
    model.fit(coo, epochs=epochs)
    wall = time.perf_counter() - t0
    return wall, model


def quickstart():
    """ML-100k, WARP, D=10, 30 epochs (the reference's headline config)."""
    from lightfm_tpu.datasets import generate_synthetic

    data = generate_synthetic(seed=42)
    train = data["train"].tocsr()
    train.data = np.where(train.data >= 5, train.data, 0).astype(np.float32)
    train.eliminate_zeros()
    coo = train.tocoo()
    wall, _ = _timed_epochs(coo, D=10, epochs=30)
    return {
        "config": "ml100k-warp-d10-30ep",
        "examples_per_sec": round(coo.nnz * 30 / wall, 1),
        "wall_s": round(wall, 4),
        "reference_cpu_2thread_wall_s": 0.838,
    }


def synthetic(n_users, n_items, nnz, D, epochs, name, batch_size=131072):
    """Multi-epoch so one-time host prep + host->device upload amortise.

    NOTE: in remote-TPU environments (device behind a network tunnel) the
    upload adds seconds per fit that a co-located TPU host would not pay;
    steady-state epoch throughput is the architecture-relevant number.
    """
    rng = np.random.RandomState(0)
    rows = rng.randint(0, n_users, nnz).astype(np.int32)
    cols = rng.randint(0, n_items, nnz).astype(np.int32)
    coo = sp.coo_matrix(
        (np.ones(nnz, np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    coo.sum_duplicates()
    wall, _ = _timed_epochs(coo, D=D, epochs=epochs, batch_size=batch_size)
    return {
        "config": name,
        "examples_per_sec": round(coo.nnz * epochs / wall, 1),
        "wall_s": round(wall, 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="all")
    args = p.parse_args()

    runs = []
    if args.config in ("quickstart", "all"):
        runs.append(quickstart())
    if args.config in ("5m", "all"):
        runs.append(
            synthetic(200_000, 100_000, 5_000_000, 64, 5, "synth-5m-warp-d64")
        )
    if args.config in ("25m", "all"):
        runs.append(
            synthetic(330_000, 165_000, 25_000_000, 128, 2, "synth-25m-warp-d128")
        )
    for r in runs:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
