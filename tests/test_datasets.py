"""Dataset fetcher tests.

Network-dependent fetchers are exercised only when a cached copy exists
(this environment has no egress); the synthetic generator is always tested.
"""

import os

import numpy as np
import pytest

from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.datasets._common import get_data_dir


def test_synthetic_shapes_and_determinism():
    d1 = generate_synthetic(n_users=100, n_items=80, seed=1)
    d2 = generate_synthetic(n_users=100, n_items=80, seed=1)
    assert d1["train"].shape == (100, 80)
    assert d1["item_features"].shape[0] == 80
    assert (d1["train"] != d2["train"]).nnz == 0
    assert (d1["test"] != d2["test"]).nnz == 0
    # per-user holdout
    test_counts = np.asarray(
        (d1["test"].tocsr() > 0).sum(axis=1)
    ).ravel()
    assert test_counts.max() <= 10


def test_synthetic_split_disjoint():
    d = generate_synthetic(n_users=100, n_items=80, seed=2)
    assert d["train"].multiply(d["test"]).nnz == 0


def test_synthetic_learnable():
    from lightfm_tpu import LightFM
    from lightfm_tpu.evaluation import auc_score

    d = generate_synthetic(n_users=200, n_items=150, seed=3)
    train = d["train"].astype(np.float32)
    train.data = np.where(train.data >= 4, 1.0, -1.0).astype(np.float32)
    model = LightFM(loss="warp", random_state=1).fit(train, epochs=5)
    pos = train.tocsr().copy()
    pos.data[pos.data < 0] = 0
    pos.eliminate_zeros()
    assert auc_score(model, pos).mean() > 0.8


@pytest.mark.skipif(
    not os.path.isfile(
        os.path.join(get_data_dir(), "movielens100k", "movielens.zip")
    ),
    reason="MovieLens zip not cached and no network egress",
)
def test_movielens_fetch_shapes():
    from lightfm_tpu.datasets import fetch_movielens

    data = fetch_movielens(download_if_missing=False)
    assert data["train"].shape == (943, 1682)
    assert data["test"].shape == (943, 1682)
    assert (data["train"].nnz + data["test"].nnz) == 100000


def test_movielens_missing_raises_without_download():
    from lightfm_tpu.datasets import fetch_movielens

    if os.path.isfile(os.path.join(get_data_dir(), "movielens100k", "movielens.zip")):
        pytest.skip("zip is cached")
    with pytest.raises(IOError):
        fetch_movielens(download_if_missing=False, data_home="/tmp/nonexistent_lfm")
