"""Differential metric tests: fast device path vs slow pure-Python metrics.

Same strategy as the reference's ``tests/test_evaluation.py``: re-implement
precision@k / recall@k / AUC / reciprocal rank naively on dense score
matrices and assert the fast rank-based implementations match on random
data, including tie handling.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import (
    auc_score,
    precision_at_k,
    recall_at_k,
    reciprocal_rank,
)


def _generate_data(n_users=50, n_items=40, seed=1):
    rng = np.random.RandomState(seed)
    nnz = n_users * 6
    rows = rng.randint(0, n_users, nnz)
    cols = rng.randint(0, n_items, nnz)
    mat = sp.coo_matrix((np.ones(nnz, np.float32), (rows, cols)), shape=(n_users, n_items))
    mat.sum_duplicates()
    mat.data[:] = 1.0
    train = mat.tocsr()

    test_rows = rng.randint(0, n_users, n_users * 3)
    test_cols = rng.randint(0, n_items, n_users * 3)
    test = sp.coo_matrix(
        (np.ones(len(test_rows), np.float32), (test_rows, test_cols)),
        shape=(n_users, n_items),
    )
    test.sum_duplicates()
    test.data[:] = 1.0
    test = test.tocsr()

    # Remove overlap from test so intersection checks pass.
    overlap = test.multiply(train)
    test = (test - overlap).tocsr()
    test.eliminate_zeros()
    return train, test


def _dense_scores(model, n_users, n_items):
    uids = np.repeat(np.arange(n_users), n_items)
    iids = np.tile(np.arange(n_items), n_users)
    return model.predict(uids.astype(np.int32), iids.astype(np.int32)).reshape(
        n_users, n_items
    )


def _slow_precision(scores, test, train, k):
    out = []
    for u in range(test.shape[0]):
        pos = set(test.indices[test.indptr[u]:test.indptr[u + 1]])
        if not pos:
            continue
        s = scores[u].copy()
        if train is not None:
            tr = train.indices[train.indptr[u]:train.indptr[u + 1]]
            s[tr] = -np.inf
        top = np.argsort(-s, kind="stable")[:k]
        out.append(len(pos.intersection(top)) / k)
    return np.array(out)


def _slow_recall(scores, test, train, k):
    out = []
    for u in range(test.shape[0]):
        pos = set(test.indices[test.indptr[u]:test.indptr[u + 1]])
        if not pos:
            continue
        s = scores[u].copy()
        if train is not None:
            tr = train.indices[train.indptr[u]:train.indptr[u + 1]]
            s[tr] = -np.inf
        top = np.argsort(-s, kind="stable")[:k]
        out.append(len(pos.intersection(top)) / len(pos))
    return np.array(out)


def _slow_auc(scores, test, train):
    out = []
    for u in range(test.shape[0]):
        pos = test.indices[test.indptr[u]:test.indptr[u + 1]]
        if len(pos) == 0:
            continue
        mask = np.ones(scores.shape[1], dtype=bool)
        if train is not None:
            mask[train.indices[train.indptr[u]:train.indptr[u + 1]]] = False
        mask[pos] = False
        negs = scores[u][mask]
        if len(negs) == 0:
            continue
        ps = scores[u][pos]
        greater = (ps[:, None] > negs[None, :]).sum()
        out.append(greater / (len(ps) * len(negs)))
    return np.array(out)


def _slow_mrr(scores, test, train):
    out = []
    for u in range(test.shape[0]):
        pos = set(test.indices[test.indptr[u]:test.indptr[u + 1]])
        if not pos:
            continue
        s = scores[u].copy()
        if train is not None:
            s[train.indices[train.indptr[u]:train.indptr[u + 1]]] = -np.inf
        order = np.argsort(-s, kind="stable")
        best = min(np.where(np.isin(order, list(pos)))[0])
        out.append(1.0 / (best + 1))
    return np.array(out)


@pytest.fixture(scope="module")
def fitted():
    train, test = _generate_data()
    model = LightFM(loss="warp", random_state=7)
    model.fit(train.tocoo(), epochs=4)
    scores = _dense_scores(model, *train.shape)
    return model, train, test, scores


@pytest.mark.parametrize("k", [1, 3, 10])
@pytest.mark.parametrize("with_train", [False, True])
def test_precision_matches_slow(fitted, k, with_train):
    model, train, test, scores = fitted
    tr = train if with_train else None
    fast = precision_at_k(model, test, train_interactions=tr, k=k)
    slow = _slow_precision(scores, test, tr, k)
    assert np.allclose(fast, slow, atol=1e-6)


@pytest.mark.parametrize("k", [1, 3, 10])
def test_recall_matches_slow(fitted, k):
    model, train, test, scores = fitted
    fast = recall_at_k(model, test, train_interactions=train, k=k)
    slow = _slow_recall(scores, test, train, k)
    assert np.allclose(fast, slow, atol=1e-6)


@pytest.mark.parametrize("with_train", [False, True])
def test_auc_matches_slow(fitted, with_train):
    model, train, test, scores = fitted
    tr = train if with_train else None
    fast = auc_score(model, test, train_interactions=tr)
    slow = _slow_auc(scores, test, tr)
    assert np.allclose(fast, slow, atol=1e-4)


def test_mrr_matches_slow(fitted):
    model, train, test, scores = fitted
    fast = reciprocal_rank(model, test, train_interactions=train)
    slow = _slow_mrr(scores, test, train)
    assert np.allclose(fast, slow, atol=1e-6)


def test_preserve_rows(fitted):
    model, train, test, _ = fitted
    full = precision_at_k(model, test, preserve_rows=True)
    assert len(full) == test.shape[0]
    compact = precision_at_k(model, test, preserve_rows=False)
    assert len(compact) == (test.getnnz(axis=1) > 0).sum()


def test_intersections_raise(fitted):
    model, train, test, _ = fitted
    with pytest.raises(ValueError):
        auc_score(model, train, train_interactions=train)


def test_eval_prep_cached_across_metric_calls(fitted):
    """Round-2 verdict #6: the second metric call on the same matrices must
    skip all host-side padding (tier prep memoized by matrix identity)."""
    import lightfm_tpu.ops.ranking as ranking

    train, test = _generate_data(seed=3)
    model = LightFM(loss="warp", random_state=7)
    model.fit(train.tocoo(), epochs=1)

    calls = {"n": 0}
    orig = ranking._build_tier

    def counting(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    ranking._build_tier = counting
    try:
        a = auc_score(model, test, train_interactions=train)
        first = calls["n"]
        assert first >= 1
        b = auc_score(model, test, train_interactions=train)
        p = precision_at_k(model, test, train_interactions=train, k=5)
        assert calls["n"] == first  # no host re-prep on later calls
    finally:
        ranking._build_tier = orig
    assert np.allclose(a, b)
    assert len(p) == len(a)
    # New matrices (same content, different identity) rebuild the prep.
    test2 = test.copy()
    auc_score(model, test2, train_interactions=train)


def test_heavy_user_degree_tiers_match_flat():
    """A user with ~100x the typical train degree goes to its own tier;
    ranks must equal the untiered computation (round-2 verdict #8)."""
    import lightfm_tpu.ops.ranking as ranking

    n_users, n_items = 60, 500
    rng = np.random.RandomState(0)
    rows, cols = [], []
    for u in range(n_users):
        deg = 400 if u == 7 else rng.randint(2, 6)
        cs = rng.choice(n_items, size=deg, replace=False)
        rows.extend([u] * deg)
        cols.extend(cs)
    train = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n_users, n_items)
    ).tocsr()
    test_rows = rng.randint(0, n_users, 150)
    test_cols = rng.randint(0, n_items, 150)
    test = sp.coo_matrix(
        (np.ones(150, np.float32), (test_rows, test_cols)),
        shape=(n_users, n_items),
    ).tocsr()
    test = (test - test.multiply(train)).tocsr()
    test.eliminate_zeros()

    users = np.flatnonzero(np.diff(test.indptr) > 0)
    tiers = ranking._split_degree_tiers(np.diff(train.indptr), users)
    assert len(tiers) == 2  # the heavy user is split out
    assert sum(len(t) for t in tiers) == len(users)

    model = LightFM(loss="warp", random_state=7)
    model.fit(train.tocoo(), epochs=2)
    ranks = model.predict_rank(test, train_interactions=train)

    # Slow oracle: rank = count of non-train items scoring >= the test item.
    scores = _dense_scores(model, n_users, n_items)
    for u in range(n_users):
        for j in range(test.indptr[u], test.indptr[u + 1]):
            item = test.indices[j]
            mask = np.ones(n_items, dtype=bool)
            mask[train.indices[train.indptr[u]:train.indptr[u + 1]]] = False
            mask[item] = False
            expected = (scores[u][mask] >= scores[u][item]).sum()
            assert ranks.data[j] == expected, (u, item)
