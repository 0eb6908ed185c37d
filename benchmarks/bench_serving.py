"""Serving-path benchmarks: predict_rank throughput and top-k retrieval QPS.

Usage: python benchmarks/bench_serving.py [--users 50000 --items 100000 --d 64]

Covers the BASELINE.json retrieval configs: full dot-product top-k (exact and
approx_max_k) and the int8 ANN-style compressed path, plus the fused Pallas
ranking kernel the evaluation stack runs on.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=50_000)
    p.add_argument("--items", type=int, default=100_000)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--batch", type=int, default=4096)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lightfm_tpu import retrieval
    from lightfm_tpu.ops import ranking
    from lightfm_tpu.sparse import identity_rows
    from lightfm_tpu.state import init_state

    rng = np.random.RandomState(0)
    state = init_state(args.d, args.items, args.users, rng, adagrad=True)
    uf, itf = identity_rows(args.users), identity_rows(args.items)

    results = []

    # predict_rank (fused Pallas kernel on TPU)
    T = 10
    rows = np.repeat(np.arange(args.users), T)
    cols = rng.randint(0, args.items, args.users * T)
    test = sp.csr_matrix(
        (np.ones(args.users * T, np.float32), (rows, cols)),
        shape=(args.users, args.items),
    )
    train = sp.csr_matrix((args.users, args.items), dtype=np.float32)
    _ = ranking.predict_ranks_padded(state, uf, itf, test, train)  # compile
    t0 = time.perf_counter()
    _ = ranking.predict_ranks_padded(state, uf, itf, test, train)
    dt = time.perf_counter() - t0
    results.append(
        {
            "metric": "predict_rank",
            "users_per_sec": round(args.users / dt, 1),
            "gpairs_per_sec": round(args.users * args.items / dt / 1e9, 2),
        }
    )

    # top-k paths
    uid = jnp.arange(args.batch, dtype=jnp.int32)

    def qps(fn, name):
        s, i = fn()
        jax.block_until_ready(i)
        t0 = time.perf_counter()
        for _ in range(5):
            s, i = fn()
        jax.block_until_ready(i)
        _ = np.asarray(i[0, 0])
        dt = (time.perf_counter() - t0) / 5
        results.append({"metric": f"topk_{name}", "qps": round(args.batch / dt, 1)})

    qps(
        lambda: retrieval.top_k(
            state, uf, itf, uid, args.k, args.items, method="approx"
        ),
        "approx",
    )
    index = retrieval.build_compressed_index(state, itf, args.items)
    qps(
        lambda: retrieval.top_k_compressed(state, uf, index, uid, args.k),
        "compressed_int8",
    )

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
