"""API/unit tests with synthetic sparse fixtures.

Covers the same contract surface as the reference's ``tests/test_api.py``:
input coercion across scipy formats, duplicate entries, error paths,
predict_rank rank properties (permutation, train-exclusion cap, pessimistic
ties), sample-weight validation, divergence detection, WARP edge cases.
"""

import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM


def _random_interactions(n_users=30, n_items=25, nnz=120, seed=0):
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, n_users, nnz)
    cols = rng.randint(0, n_items, nnz)
    data = np.ones(nnz, dtype=np.float32)
    mat = sp.coo_matrix((data, (rows, cols)), shape=(n_users, n_items))
    mat.sum_duplicates()
    mat.data[:] = 1.0
    return mat


def test_all_sparse_formats_accepted():
    base = _random_interactions()
    for fmt in ("coo", "csr", "csc", "lil", "dok"):
        mat = base.asformat(fmt)
        model = LightFM(random_state=1)
        model.fit(mat, epochs=1)
        assert model.item_embeddings is not None


def test_all_dtypes_accepted():
    base = _random_interactions()
    for dtype in (np.int32, np.int64, np.float32, np.float64):
        model = LightFM(random_state=1)
        model.fit(base.astype(dtype), epochs=1)


def test_duplicate_coo_entries():
    # Duplicate (row, col) pairs in COO input must not corrupt training
    # (regression in the reference, test_api.py:57-74).
    rng = np.random.RandomState(3)
    rows = np.concatenate([rng.randint(0, 20, 50)] * 2)
    cols = np.concatenate([rng.randint(0, 15, 50)] * 2)
    mat = sp.coo_matrix((np.ones(100, np.float32), (rows, cols)), shape=(20, 15))
    for loss in ("logistic", "warp", "bpr"):
        LightFM(loss=loss, random_state=1).fit(mat, epochs=2)


def test_predict_int_and_array_equivalent():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=2)
    items = np.arange(5, dtype=np.int32)
    a = model.predict(2, items)
    b = model.predict(np.repeat(np.int32(2), 5), items)
    assert np.allclose(a, b)


def test_predict_length_mismatch_raises():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    with pytest.raises(ValueError):
        model.predict([0, 1], np.arange(3, dtype=np.int32))


def test_not_fitted_raises():
    model = LightFM()
    with pytest.raises(ValueError):
        model.predict(np.array([0]), np.array([0]))
    with pytest.raises(ValueError):
        model.predict_rank(_random_interactions().tocsr())


def test_negative_ids_raise():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    with pytest.raises(ValueError):
        model.predict(np.array([-1], dtype=np.int32), np.array([0], dtype=np.int32))


def test_feature_dimension_mismatch_raises():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    bad_features = sp.identity(mat.shape[1] + 5, format="csr", dtype=np.float32)
    with pytest.raises(ValueError):
        model.fit_partial(mat, item_features=bad_features)


def test_feature_rows_fewer_than_entities_raises():
    mat = _random_interactions()
    model = LightFM(random_state=1)
    short = sp.identity(mat.shape[1] - 3, format="csr", dtype=np.float32)
    with pytest.raises(Exception):
        model.fit(mat, item_features=short)


def test_sample_weight_validation():
    mat = _random_interactions()
    model = LightFM(random_state=1)

    # Must be COO
    with pytest.raises(ValueError):
        model.fit(mat, sample_weight=mat.tocsr(), epochs=1)

    # Shape mismatch
    wrong_shape = sp.coo_matrix(np.ones((3, 3), dtype=np.float32))
    with pytest.raises(ValueError):
        model.fit(mat, sample_weight=wrong_shape, epochs=1)

    # Order mismatch
    shuffled = sp.coo_matrix(
        (mat.data, (mat.row[::-1], mat.col[::-1])), shape=mat.shape
    )
    with pytest.raises(ValueError):
        model.fit(mat, sample_weight=shuffled, epochs=1)

    # k-OS does not support sample weights
    weights = sp.coo_matrix((mat.data, (mat.row, mat.col)), shape=mat.shape)
    kos = LightFM(loss="warp-kos", random_state=1)
    with pytest.raises(NotImplementedError):
        kos.fit(mat, sample_weight=weights, epochs=1)


def test_nan_input_raises():
    mat = _random_interactions().astype(np.float32)
    mat.data[0] = np.nan
    with pytest.raises(ValueError):
        LightFM(random_state=1).fit(mat, epochs=1)


def test_divergence_raises():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    model.item_embeddings = np.full_like(model.item_embeddings, np.inf)
    with pytest.raises(ValueError):
        model.fit_partial(mat, epochs=1)


def test_predict_rank_is_permutation():
    n_users, n_items = 20, 30
    mat = _random_interactions(n_users, n_items, 150, seed=2)
    model = LightFM(loss="warp", random_state=1).fit(mat, epochs=3)

    full = sp.csr_matrix(
        (
            np.ones(n_items, np.float32),
            (np.zeros(n_items, int), np.arange(n_items)),
        ),
        shape=(n_users, n_items),
    )
    ranks = model.predict_rank(full).tocsr()
    assert np.array_equal(np.sort(ranks.data), np.arange(n_items, dtype=np.float32))


def test_predict_rank_train_exclusion_caps_max_rank():
    n_users, n_items = 25, 40
    mat = _random_interactions(n_users, n_items, 300, seed=4).tocsr()
    from lightfm_tpu.cross_validation import random_train_test_split

    train, test = random_train_test_split(mat.tocoo(), random_state=0)
    model = LightFM(loss="warp", random_state=1).fit(train, epochs=2)
    ranks = model.predict_rank(test.tocsr(), train_interactions=train.tocsr()).tocsr()
    tr_counts = np.diff(train.tocsr().indptr)
    for u in range(n_users):
        s, e = ranks.indptr[u], ranks.indptr[u + 1]
        if e > s:
            assert ranks.data[s:e].max() <= n_items - 1 - tr_counts[u]


def test_predict_rank_ties_pessimistic_with_zero_embeddings():
    n_users, n_items = 10, 15
    mat = _random_interactions(n_users, n_items, 60, seed=5)
    model = LightFM(random_state=1).fit(mat, epochs=1)
    for field in ("item_embeddings", "user_embeddings", "item_biases", "user_biases"):
        setattr(model, field, np.zeros_like(getattr(model, field)))
    full = sp.csr_matrix(
        (
            np.ones(n_items, np.float32),
            (np.zeros(n_items, int), np.arange(n_items)),
        ),
        shape=(n_users, n_items),
    )
    ranks = model.predict_rank(full).tocsr()
    assert np.all(ranks.data == n_items - 1)


def test_warp_fewer_items_than_max_sampled_terminates():
    mat = sp.coo_matrix(
        (np.ones(3, np.float32), ([0, 1, 2], [0, 1, 1])), shape=(3, 2)
    )
    LightFM(loss="warp", max_sampled=10, random_state=1).fit(mat, epochs=2)


def test_max_sampled_zero_rejected():
    with pytest.raises(ValueError):
        LightFM(max_sampled=0)


def test_state_views_support_inplace_mutation():
    """The reference's state attributes are plain numpy arrays users edit in
    place (`lightfm/lightfm.py:243-257`); in-place edits through our views
    must be visible to subsequent predictions."""
    n_users, n_items = 10, 15
    mat = _random_interactions(n_users, n_items, 60, seed=5)
    model = LightFM(random_state=1).fit(mat, epochs=1)
    model.item_embeddings[:] = 0
    model.user_embeddings[:] = 0
    model.item_biases[:] = 0
    model.user_biases[:] = 0
    full = sp.csr_matrix(
        (np.ones(n_items, np.float32), (np.zeros(n_items, int), np.arange(n_items))),
        shape=(n_users, n_items),
    )
    ranks = model.predict_rank(full).tocsr()
    # Zeroed model scores everything identically -> pessimistic max rank.
    assert (ranks.data == n_items - 1).all()
    # Reads after the sync see the edited values, not stale mirrors.
    assert (model.item_embeddings == 0).all()


def test_inplace_mutation_survives_pickle_and_warm_fit():
    mat = _random_interactions(seed=3)
    model = LightFM(loss="warp", random_state=2).fit(mat, epochs=2)
    emb = model.item_embeddings
    emb *= 0.5  # in-place scale through the view
    expected = np.array(emb, copy=True)
    clone = pickle.loads(pickle.dumps(model))
    assert np.array_equal(clone.item_embeddings, expected)
    # A warm re-fit resumes FROM the edited state: with 0 epochs the edit is
    # exactly preserved on the device tables.
    model.fit_partial(mat, epochs=0)
    assert np.array_equal(model.item_embeddings, expected)
    # Views handed out before a real fit are snapshots: training must not
    # be overwritten by stale mirror contents afterwards.
    stale = model.item_embeddings
    model.fit_partial(mat, epochs=1)
    trained = np.array(model.item_embeddings, copy=True)
    stale[:] = -1.0
    assert np.array_equal(model.item_embeddings, trained)
    float(model.predict(np.arange(3), np.arange(3)).sum())  # no sync-back
    assert np.array_equal(model.item_embeddings, trained)


def test_field_assignment_folds_pending_view_edits():
    """Assigning one state field must not discard in-place edits made through
    another field's view beforehand."""
    mat = _random_interactions(seed=4)
    model = LightFM(random_state=2).fit(mat, epochs=1)
    model.item_embeddings[:] = 3.0  # pending in-place edit (same table)
    model.user_biases = np.zeros_like(model.user_biases)  # assignment
    assert (model.item_embeddings == 3.0).all()
    assert (model.user_biases == 0).all()


def test_max_sampled_zero_mutation_is_noop():
    """The reference's suite reaches fit with max_sampled=0 by mutating the
    attribute post-construction; every epoch must then be an exact no-op
    (`tests/test_movielens.py:247-263`)."""
    mat = _random_interactions()
    model = LightFM(loss="warp", max_sampled=1, random_state=1)
    model.fit(mat, epochs=1)  # initialise + one real epoch
    before = np.array(model.item_embeddings, copy=True)
    model.max_sampled = 0
    model.fit_partial(mat, epochs=3)
    assert (model.item_embeddings == before).all()
    # The verbose per-epoch dispatch path must be the same exact no-op
    # (it goes through run_epoch, not run_epochs' early return).
    model.fit_partial(mat, epochs=2, verbose=True)
    assert (model.item_embeddings == before).all()


def test_choose_batch_size_keeps_step_floor():
    """Power-of-two round-up must not drop the >=40 optimizer-steps/epoch
    regime the large-batch accuracy floors were calibrated in."""
    from lightfm_tpu.train import choose_batch_size

    for n in (600_000, 2**19 + 1, 1_000_000, 5_000_000, 50_000_000):
        b = choose_batch_size(n, None)
        assert b & (b - 1) == 0  # power of two
        assert n // b >= 40, (n, b)


def test_eval_cache_detects_inplace_mutation():
    """In-place mutation of a caller's test matrix between metric calls must
    produce fresh ranks, not a stale cache hit."""
    from lightfm_tpu.evaluation import auc_score

    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=2)
    test = mat.tocsr().astype(np.float32)
    float(auc_score(model, test).mean())  # populate the cache
    # Move every test interaction to a different item IN PLACE (same nnz,
    # same object identity — the exact pattern that used to hit stale).
    n_items = test.shape[1]
    test.indices = (test.indices + 1) % n_items
    test.sort_indices()
    ranks_mutated = model.predict_rank(test).tocsr()
    fresh = sp.csr_matrix(
        (test.data.copy(), test.indices.copy(), test.indptr.copy()),
        shape=test.shape,
    )
    ranks_fresh = model.predict_rank(fresh).tocsr()
    assert (ranks_mutated.data == ranks_fresh.data).all()


def test_eval_cache_detects_sum_preserving_mutation():
    """A swap of two interactions between users preserves nnz and the data/
    indices SUMS — the CRC fingerprint must still miss the cache."""
    from lightfm_tpu.evaluation import auc_score

    mat = _random_interactions(n_users=20, n_items=30, nnz=80, seed=9)
    model = LightFM(random_state=1).fit(mat, epochs=2)
    test = mat.tocsr().astype(np.float32)
    float(auc_score(model, test).mean())  # populate the cache
    # Swap the first stored item of user 0 with the first of user 1 IN
    # PLACE: indices sum unchanged, data all-ones unchanged.
    i0, i1 = test.indptr[0], test.indptr[1]
    a, b = test.indices[i0], test.indices[i1]
    if a == b:  # ensure the swap changes content
        test.indices[i1] = (b + 1) % test.shape[1]
        b = test.indices[i1]
    test.indices[i0], test.indices[i1] = b, a
    test.sort_indices()
    ranks_mutated = model.predict_rank(test).tocsr()
    fresh = sp.csr_matrix(
        (test.data.copy(), test.indices.copy(), test.indptr.copy()),
        shape=test.shape,
    )
    ranks_fresh = model.predict_rank(fresh).tocsr()
    assert (ranks_mutated.data == ranks_fresh.data).all()


def test_serving_cache_bounded_under_streaming_matrices():
    """Streaming a fresh live test matrix through every metric call must not
    grow the serving cache without bound (weakref entries stay dead-free
    because each build may return the input object itself)."""
    from lightfm_tpu.evaluation import auc_score

    mat = _random_interactions(n_users=15, n_items=20, nnz=60, seed=2)
    model = LightFM(random_state=1).fit(mat, epochs=1)
    kept = []
    for s in range(90):
        t = _random_interactions(n_users=15, n_items=20, nnz=40, seed=100 + s)
        t = t.tocsr().astype(np.float32)
        kept.append(t)  # keep alive: worst case for the sweep
        float(auc_score(model, t).mean())
    assert len(model._serving_cache) < 60, len(model._serving_cache)


def test_intersection_check():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    with pytest.raises(ValueError):
        model.predict_rank(mat.tocsr(), train_interactions=mat.tocsr())
    # check_intersections=False tolerates overlap
    model.predict_rank(
        mat.tocsr(), train_interactions=mat.tocsr(), check_intersections=False
    )


def test_get_set_params_sklearn_contract():
    model = LightFM(no_components=7)
    params = model.get_params()
    assert params["no_components"] == 7
    model.set_params(no_components=11)
    assert model.no_components == 11
    with pytest.raises(ValueError):
        model.set_params(bogus_param=1)


def test_pickle_before_and_after_fit():
    model = LightFM(random_state=1)
    pickle.loads(pickle.dumps(model))
    mat = _random_interactions()
    model.fit(mat, epochs=2)
    clone = pickle.loads(pickle.dumps(model))
    assert np.allclose(
        model.predict(np.array([0, 1]), np.array([2, 3])),
        clone.predict(np.array([0, 1]), np.array([2, 3])),
    )


def test_representations_roundtrip():
    mat = _random_interactions()
    model = LightFM(random_state=1).fit(mat, epochs=1)
    biases, emb = model.get_item_representations()
    assert emb.shape == (mat.shape[1], model.no_components)
    feats = sp.identity(mat.shape[1], format="csr", dtype=np.float32)
    biases2, emb2 = model.get_item_representations(features=feats)
    assert np.allclose(emb, emb2, atol=1e-6)


def test_get_params_covers_all_constructor_args():
    # sklearn contract: clone() rebuilds from get_params(); every
    # constructor argument must round-trip (review regression).
    import inspect

    sig = inspect.signature(LightFM.__init__)
    ctor_args = {p for p in sig.parameters if p != "self"}
    model = LightFM(batch_size=1024, table_partition="rows", shard_examples=True)
    params = model.get_params()
    assert ctor_args == set(params)
    clone = LightFM(**params)
    assert clone.batch_size == 1024
    assert clone.table_partition == "rows"
    assert clone.shard_examples is True
    model.set_params(batch_size=2048)
    assert model.batch_size == 2048
