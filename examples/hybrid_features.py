"""Hybrid (metadata-features) example — the reference's
`doc/examples/hybrid_crossvalidated.rst` workflow: collaborative filtering
vs metadata features for cold-start generalisation, using the Dataset
builder and a random train/test split.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run from the repo

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score


def load():
    try:
        from lightfm_tpu.datasets import fetch_stackexchange

        data = fetch_stackexchange("crossvalidated")
        return data["train"], data["test"], data["item_features"]
    except Exception:
        # Offline stand-in with a genuine COLD-START split: hold out entire
        # items, so collaborative filtering has nothing to learn for them
        # and only shared metadata features can transfer.
        import scipy.sparse as sp

        from lightfm_tpu.datasets import generate_synthetic

        data = generate_synthetic(seed=7)
        inter = data["train"].tocoo()
        rng = np.random.RandomState(0)
        cold = rng.rand(inter.shape[1]) < 0.2
        is_cold = cold[inter.col]
        train = sp.coo_matrix(
            (inter.data[~is_cold], (inter.row[~is_cold], inter.col[~is_cold])),
            shape=inter.shape,
        )
        test = sp.coo_matrix(
            (inter.data[is_cold], (inter.row[is_cold], inter.col[is_cold])),
            shape=inter.shape,
        )
        return train, test, data["item_genre_features"]


def main():
    train, test, item_features = load()

    # Pure collaborative filtering: cold-start items get nothing.
    cf = LightFM(loss="warp", random_state=2)
    cf.fit(train, epochs=10)
    print(
        "CF        AUC train %.3f / test %.3f"
        % (
            auc_score(cf, train.tocsr(), check_intersections=False).mean(),
            auc_score(cf, test.tocsr(), train_interactions=train.tocsr()).mean(),
        )
    )

    # Hybrid: items are bags of shared metadata features; representations
    # transfer to unseen items (the reference's tag-features run).
    hybrid = LightFM(loss="warp", item_alpha=1e-6, random_state=2)
    hybrid.fit(train, item_features=item_features, epochs=10)
    print(
        "Hybrid    AUC train %.3f / test %.3f"
        % (
            auc_score(
                hybrid, train.tocsr(), item_features=item_features,
                check_intersections=False,
            ).mean(),
            auc_score(
                hybrid, test.tocsr(), item_features=item_features,
                train_interactions=train.tocsr(),
            ).mean(),
        )
    )


if __name__ == "__main__":
    main()
