"""On-device candidate retrieval — the reference's ANN example, TPU-native.

The reference exports item embeddings to Annoy/nmslib on CPU and reports
<50ms per query (`examples/ann/annoy_nsmlib_example.ipynb`).  On TPU the
catalog scoring is a dense MXU matmul, so retrieval stays on-device with
three quality/speed points: exact top-k, the hardware's approximate top-k
with exact rerank, and int8 two-stage compressed scoring.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic


def main():
    # A larger catalog than ML-100k to make the comparison meaningful.
    data = generate_synthetic(n_users=2048, n_items=50_000, seed=0)
    train = data["train"]
    model = LightFM(loss="warp", no_components=64, random_state=0)
    model.fit(train, epochs=5)
    print("trained:", model.fit_stats_.as_dict())

    users = np.arange(1024, dtype=np.int32)
    k = 10

    def bench(mode):
        s, i = model.recommend(users, k=k, mode=mode)  # compile
        t0 = time.perf_counter()
        for _ in range(5):
            s, i = model.recommend(users, k=k, mode=mode)
        dt = (time.perf_counter() - t0) / 5
        return s, i, len(users) / dt

    s_exact, i_exact, qps_exact = bench("exact")
    s_apx, i_apx, qps_apx = bench("approx")
    s_c, i_c, qps_c = bench("compressed")

    def recall(ids):
        return np.mean(
            [len(set(i_exact[u]) & set(ids[u])) / k for u in range(len(users))]
        )

    print(f"exact:      {qps_exact:8.0f} users/s  recall 1.000")
    print(f"approx:     {qps_apx:8.0f} users/s  recall {recall(i_apx):.3f}")
    print(f"compressed: {qps_c:8.0f} users/s  recall {recall(i_c):.3f}")


if __name__ == "__main__":
    main()
