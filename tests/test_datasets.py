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


def _make_ml100k_zip(path, n_users=20, n_items=15, n_genres=3, seed=0):
    """Build a miniature ml-100k-format zip to exercise the full parse path."""
    import zipfile

    rng = np.random.RandomState(seed)
    lines_base, lines_test = [], []
    for u in range(1, n_users + 1):
        items = rng.choice(n_items, 6, replace=False) + 1
        for i in items[:4]:
            lines_base.append(f"{u}\t{i}\t{rng.randint(1, 6)}\t874965758")
        for i in items[4:]:
            lines_test.append(f"{u}\t{i}\t{rng.randint(1, 6)}\t874965758")
    genre_lines = [f"genre{g}|{g}" for g in range(n_genres)]
    item_lines = []
    for i in range(1, n_items + 1):
        flags = "|".join(str(int(rng.rand() < 0.4)) for _ in range(n_genres))
        item_lines.append(
            f"{i}|Movie {i}|01-Jan-1995||http://example.com|{flags}"
        )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("ml-100k/ua.base", "\n".join(lines_base) + "\n")
        z.writestr("ml-100k/ua.test", "\n".join(lines_test) + "\n")
        z.writestr("ml-100k/u.item", "\n".join(item_lines) + "\n")
        z.writestr("ml-100k/u.genre", "\n".join(genre_lines) + "\n")


def test_movielens_fetch_offline_roundtrip(tmp_path):
    # Full fetcher path (zip parse -> matrices -> metadata) without network:
    # pre-seed the cache layout the fetcher expects.
    from lightfm_tpu.datasets import fetch_movielens

    cache = tmp_path / "movielens100k"
    cache.mkdir(parents=True)
    _make_ml100k_zip(str(cache / "movielens.zip"))

    data = fetch_movielens(data_home=str(tmp_path), download_if_missing=False)
    assert data["train"].shape == data["test"].shape == (20, 15)
    assert data["train"].multiply(data["test"]).nnz == 0
    assert data["train"].nnz == 20 * 4 and data["test"].nnz == 20 * 2
    assert data["item_features"].shape == (15, 15)  # indicator features
    assert data["item_labels"][0] == "Movie 1"

    hybrid = fetch_movielens(
        data_home=str(tmp_path), download_if_missing=False,
        genre_features=True,
    )
    assert hybrid["item_features"].shape == (15, 15 + 3)

    rated = fetch_movielens(
        data_home=str(tmp_path), download_if_missing=False, min_rating=4.0
    )
    assert rated["train"].nnz < data["train"].nnz
    assert np.all(rated["train"].data >= 4.0)


def test_stackexchange_fetch_offline_roundtrip(tmp_path):
    # Pre-seed the npz the stackexchange fetcher loads; checks the
    # time-based split and tag-feature assembly (reference :118-142).
    from lightfm_tpu.datasets import fetch_stackexchange

    rng = np.random.RandomState(0)
    n_users, n_items, nnz = 30, 40, 200
    # Unique (user, item) pairs: the fetcher sums duplicate timestamps.
    flat = rng.choice(n_users * n_items, nnz, replace=False)
    rows, cols = flat // n_items, flat % n_items
    ts = rng.randint(1, 10**6, nnz).astype(np.float64)

    cache = tmp_path / "stackexchange" / "crossvalidated"
    cache.mkdir(parents=True)
    np.savez(
        str(cache / "data.npz"),
        interactions_data=ts,
        interactions_row=rows,
        interactions_col=cols,
        interactions_shape=np.array([n_users, n_items]),
        features_data=np.ones(60, np.float32),
        features_row=rng.randint(0, n_items, 60),
        features_col=rng.randint(0, 8, 60),
        features_shape=np.array([n_items, 8]),
        labels=np.array([f"tag{i}" for i in range(8)]),
    )

    data = fetch_stackexchange(
        "crossvalidated", data_home=str(tmp_path),
        download_if_missing=False, tag_features=True,
        min_training_interactions=0,
    )
    train, test = data["train"], data["test"]
    assert train.shape == test.shape
    assert train.multiply(test).nnz == 0
    # Time split: every train interaction earlier than every test one.
    d = {}
    for r, c, t in zip(rows, cols, ts):
        d[(r, c)] = max(d.get((r, c), 0), t)
    train_ts = [d[(r, c)] for r, c in zip(train.row, train.col)]
    test_ts = [d[(r, c)] for r, c in zip(test.row, test.col)]
    assert max(train_ts) <= min(test_ts)
    assert data["item_features"].shape[1] == train.shape[1] + 8


def test_synthetic_matches_ml100k_marginals():
    # The twin must track the real dataset's marginals (the floors in
    # test_accuracy are only meaningful if the data distribution is close):
    # rating histogram, degree quantiles, interaction count.
    d = generate_synthetic(seed=42)
    full = (d["train"] + d["test"]).tocoo()
    hist = np.bincount(full.data.astype(int), minlength=6)[1:]
    frac = hist / hist.sum()
    ml = np.array([0.0611, 0.1137, 0.2715, 0.3417, 0.2120])
    assert np.abs(frac - ml).max() < 0.02
    deg = np.bincount(full.row)
    assert deg.min() >= 20
    assert 55 <= np.median(deg) <= 80
    assert 90 <= deg.mean() <= 115
    assert deg.max() <= 737
    assert 85_000 <= full.nnz <= 105_000
