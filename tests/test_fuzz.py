"""Randomized property tests across the public API surface.

Each trial draws a random configuration (shape, loss, schedule, features,
weights) and drives fit -> predict -> predict_rank -> recommend, checking
structural invariants that hold for ANY input: finite outputs, ranks within
[0, n_items), rank uniqueness per user, recommend ids within the catalog
and consistent with predict scores.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM

# Statistical battery: skipped by default, run via --runslow (make test-full).
pytestmark = pytest.mark.slow

LOSSES = ["logistic", "bpr", "warp", "warp-kos"]


def _random_config(rng):
    n_users = int(rng.randint(3, 60))
    n_items = int(rng.randint(3, 80))
    nnz = int(rng.randint(1, n_users * n_items // 2 + 2))
    flat = rng.choice(n_users * n_items, size=min(nnz, n_users * n_items), replace=False)
    rows, cols = flat // n_items, flat % n_items
    vals = rng.choice([1.0, -1.0, 3.0], size=len(flat)).astype(np.float32)
    inter = sp.coo_matrix((vals, (rows, cols)), shape=(n_users, n_items))

    item_features = None
    if rng.rand() < 0.4:
        n_feats = int(rng.randint(2, 12))
        fr = rng.randint(0, n_items, n_items * 2)
        fc = rng.randint(0, n_feats, n_items * 2)
        item_features = sp.csr_matrix(
            (np.ones(len(fr), np.float32), (fr, fc)), shape=(n_items, n_feats + 0)
        )
        # every item needs at least one feature for normalize-free use
        item_features = sp.hstack(
            [sp.identity(n_items, format="csr", dtype=np.float32), item_features]
        ).tocsr()

    loss = LOSSES[rng.randint(len(LOSSES))]
    schedule = ["adagrad", "adadelta"][rng.randint(2)]
    alpha = float(rng.choice([0.0, 1e-6]))
    return inter, item_features, loss, schedule, alpha


@pytest.mark.parametrize("trial", range(12))
def test_api_invariants_random_config(trial):
    rng = np.random.RandomState(100 + trial)
    inter, item_features, loss, schedule, alpha = _random_config(rng)
    n_users, n_items = inter.shape

    model = LightFM(
        loss=loss,
        learning_schedule=schedule,
        no_components=int(rng.randint(2, 12)),
        item_alpha=alpha,
        user_alpha=alpha,
        random_state=trial,
    )
    weights = None
    if loss != "warp-kos" and rng.rand() < 0.3:
        weights = sp.coo_matrix(
            (rng.rand(inter.nnz).astype(np.float32), (inter.row, inter.col)),
            shape=inter.shape,
        )
    model.fit(
        inter, item_features=item_features, sample_weight=weights,
        epochs=int(rng.randint(1, 4)),
    )

    # predict: finite
    uid = rng.randint(0, n_users, 10).astype(np.int32)
    iid = rng.randint(0, n_items, 10).astype(np.int32)
    scores = model.predict(uid, iid, item_features=item_features)
    assert np.isfinite(scores).all()

    # predict_rank over everything: per-user permutation within range
    full = sp.csr_matrix(np.ones((n_users, n_items), np.float32))
    ranks = model.predict_rank(
        full, item_features=item_features, check_intersections=False
    )
    r = ranks.toarray()
    assert (r >= 0).all() and (r < n_items).all()
    for u in range(n_users):
        assert len(set(r[u])) == n_items  # a permutation per user

    # recommend: ids in catalog, scores match predict
    k = int(rng.randint(1, n_items + 5))
    s, ids = model.recommend(
        np.arange(min(4, n_users)), k=k, item_features=item_features,
        n_items=n_items,
    )
    assert ids.max() < n_items
    for i, u in enumerate(range(min(4, n_users))):
        p = model.predict(int(u), ids[i].astype(np.int32), item_features=item_features)
        assert np.allclose(p, s[i], atol=1e-3)
