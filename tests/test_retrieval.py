"""Retrieval-path tests: exact, sharded, and compressed top-k.

The reference offloads retrieval to external ANN libraries (its
`examples/ann/annoy_nsmlib_example.ipynb`); these tests pin our on-device
equivalents against brute-force scoring via ``predict``.
"""

import numpy as np
import scipy.sparse as sp
import pytest

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic

SEED = 10

_data = generate_synthetic(n_users=128, n_items=512, seed=3)
_train = _data["train"]


@pytest.fixture(scope="module")
def model():
    m = LightFM(loss="warp", no_components=16, random_state=SEED)
    m.fit(_train, epochs=3)
    return m


def _brute_force_topk(model, user_ids, k, n_items, exclude_csr=None):
    out_scores, out_ids = [], []
    items = np.arange(n_items, dtype=np.int32)
    for u in user_ids:
        scores = model.predict(int(u), items)
        if exclude_csr is not None:
            row = exclude_csr.indices[exclude_csr.indptr[u] : exclude_csr.indptr[u + 1]]
            scores[row] = -np.inf
        top = np.argsort(-scores)[:k]
        out_ids.append(top)
        out_scores.append(scores[top])
    return np.array(out_scores), np.array(out_ids)


def test_exact_topk_matches_brute_force(model):
    user_ids = np.arange(16, dtype=np.int32)
    k = 10
    scores, ids = model.recommend(user_ids, k=k, n_items=512)
    bf_scores, _ = _brute_force_topk(model, user_ids, k, 512)
    # Scores must match to float tolerance; ids may differ only on exact ties.
    assert np.allclose(np.sort(scores, axis=1), np.sort(bf_scores, axis=1), atol=1e-4)
    # Returned ids must actually achieve the returned scores.
    pred = np.array(
        [model.predict(int(u), ids[i].astype(np.int32)) for i, u in enumerate(user_ids)]
    )
    assert np.allclose(pred, scores, atol=1e-4)


def test_topk_excludes_train_positives(model):
    user_ids = np.arange(32, dtype=np.int32)
    train_csr = _train.tocsr()
    _, ids = model.recommend(
        user_ids, k=20, train_interactions=train_csr, n_items=512
    )
    for i, u in enumerate(user_ids):
        positives = set(
            train_csr.indices[train_csr.indptr[u] : train_csr.indptr[u + 1]]
        )
        assert not positives.intersection(ids[i].tolist())


def test_compressed_topk_high_recall(model):
    user_ids = np.arange(64, dtype=np.int32)
    k = 10
    _, exact_ids = model.recommend(user_ids, k=k, n_items=512)
    _, comp_ids = model.recommend(
        user_ids, k=k, n_items=512, mode="compressed", rerank_mult=4
    )
    recall = np.mean(
        [
            len(set(exact_ids[i]).intersection(comp_ids[i])) / k
            for i in range(len(user_ids))
        ]
    )
    assert recall > 0.9


def test_compressed_topk_with_catalog_padding(model):
    # Regression: catalogs not multiple of 128 pad with -inf bias; the int8
    # quantizer must not see the sentinel (inf scale -> NaN rows -> recall 0).
    user_ids = np.arange(32, dtype=np.int32)
    k = 10
    _, exact_ids = model.recommend(user_ids, k=k, n_items=500)
    _, comp_ids = model.recommend(user_ids, k=k, n_items=500, mode="compressed")
    assert np.all(comp_ids < 500)
    recall = np.mean(
        [
            len(set(exact_ids[i]).intersection(comp_ids[i])) / k
            for i in range(len(user_ids))
        ]
    )
    assert recall > 0.9


def test_sharded_topk_matches_unsharded(model):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from lightfm_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    user_ids = np.arange(16, dtype=np.int32)
    k = 10
    scores, ids = model.recommend(user_ids, k=k, n_items=512)
    model.mesh = mesh
    try:
        s_scores, s_ids = model.recommend(user_ids, k=k, n_items=512)
    finally:
        model.mesh = None
    assert np.allclose(np.sort(scores, 1), np.sort(s_scores, 1), atol=1e-4)


def test_recommend_with_features(model):
    # Hybrid path: genre features only (cold-start style).
    feats = _data["item_features"]
    m = LightFM(loss="warp", no_components=8, random_state=SEED)
    m.fit(_train, item_features=feats, epochs=2)
    scores, ids = m.recommend(np.arange(4), k=5, item_features=feats)
    assert ids.shape == (4, 5)
    assert np.all(ids < feats.shape[0])
    assert np.all(np.isfinite(scores))


def test_approx_topk_high_recall(model):
    user_ids = np.arange(64, dtype=np.int32)
    k = 10
    _, exact_ids = model.recommend(user_ids, k=k, n_items=512, mode="exact")
    _, approx_ids = model.recommend(user_ids, k=k, n_items=512, mode="approx")
    recall = np.mean(
        [
            len(set(exact_ids[i]).intersection(approx_ids[i])) / k
            for i in range(len(user_ids))
        ]
    )
    assert recall > 0.9


def test_auto_mode_small_catalog_is_exact(model):
    user_ids = np.arange(8, dtype=np.int32)
    s_auto, i_auto = model.recommend(user_ids, k=5, n_items=512)  # auto -> exact
    s_ex, i_ex = model.recommend(user_ids, k=5, n_items=512, mode="exact")
    assert np.array_equal(i_auto, i_ex)


def test_sharded_approx_topk_high_recall(model):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from lightfm_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    user_ids = np.arange(32, dtype=np.int32)
    k = 10
    _, exact_ids = model.recommend(user_ids, k=k, n_items=512, mode="exact")
    model.mesh = mesh
    try:
        _, a_ids = model.recommend(user_ids, k=k, n_items=512, mode="approx")
    finally:
        model.mesh = None
    recall = np.mean(
        [len(set(exact_ids[i]) & set(a_ids[i])) / k for i in range(len(user_ids))]
    )
    assert recall > 0.9


def test_recommend_k_clamped_to_catalog(model):
    scores, ids = model.recommend(np.arange(3), k=10_000, n_items=512)
    assert ids.shape == (3, 512)
    assert ids.max() < 512
    assert np.isfinite(scores).all()


def test_streaming_topk_matches_dense(model, monkeypatch):
    # Huge-catalog streaming path (per-block approx candidates + exact
    # merge), forced via a tiny limit; high recall vs the dense exact path.
    from lightfm_tpu import retrieval
    from lightfm_tpu.sparse import identity_rows

    monkeypatch.setattr(retrieval, "STREAMING_CATALOG_LIMIT", 100)
    uf, itf = identity_rows(128), identity_rows(512)
    uid = np.arange(32, dtype=np.int32)
    import jax.numpy as jnp

    s_d, i_d = retrieval._top_k_dense(
        model._state, uf,
        retrieval.build_catalog(model._state, itf, 512),
        jnp.asarray(uid), None, 10, 512, "exact",
    )
    s_s, i_s = retrieval.top_k(
        model._state, uf, itf, jnp.asarray(uid), 10, 512, item_block=128
    )
    recall = np.mean(
        [
            len(set(np.asarray(i_d[r])) & set(np.asarray(i_s[r]))) / 10
            for r in range(len(uid))
        ]
    )
    assert recall > 0.9
    assert int(np.asarray(i_s).max()) < 512


def test_compressed_exclusions_never_leak(model):
    # Review regression: rerank must not resurrect excluded items even when
    # the coarse stage runs out of finite candidates (rerank_mult*k exceeds
    # the user's non-excluded catalog).
    train_csr = _train.tocsr()
    user_ids = np.arange(16, dtype=np.int32)
    _, ids = model.recommend(
        user_ids, k=100, n_items=512, mode="compressed", rerank_mult=8,
        train_interactions=train_csr,
    )
    for i, u in enumerate(user_ids):
        positives = set(
            train_csr.indices[train_csr.indptr[u] : train_csr.indptr[u + 1]]
        )
        assert not positives.intersection(ids[i].tolist())


def test_streaming_exact_is_exact(model, monkeypatch):
    # Review regression: mode="exact" through the streaming path must return
    # the true global top-k (per-tile exact + exact merge), not approx.
    from lightfm_tpu import retrieval
    from lightfm_tpu.sparse import identity_rows
    import jax.numpy as jnp

    monkeypatch.setattr(retrieval, "STREAMING_CATALOG_LIMIT", 100)
    uf, itf = identity_rows(128), identity_rows(512)
    uid = np.arange(16, dtype=np.int32)
    s_d, i_d = retrieval._top_k_dense(
        model._state, uf, retrieval.build_catalog(model._state, itf, 512),
        jnp.asarray(uid), None, 10, 512, "exact",
    )
    s_s, i_s = retrieval.top_k(
        model._state, uf, itf, jnp.asarray(uid), 10, 512,
        method="exact", item_block=128,
    )
    assert np.allclose(np.sort(np.asarray(s_d), 1), np.sort(np.asarray(s_s), 1),
                       atol=1e-5)


def test_recommend_requires_features_for_hybrid_models():
    feats = _data["item_features"]
    m = LightFM(loss="warp", no_components=8, random_state=SEED)
    # genre-only features (non-identity)
    genre = sp.csr_matrix(
        (np.ones(512, np.float32),
         (np.arange(512), np.arange(512) % 7)), shape=(512, 7),
    )
    m.fit(_train, item_features=genre, epochs=1)
    with pytest.raises(ValueError, match="item_features"):
        m.recommend(np.arange(4), k=5)
    s, i = m.recommend(np.arange(4), k=5, item_features=genre)
    assert i.shape == (4, 5)


def test_recommend_defaults_to_fitted_catalog(model):
    # n_items defaults to the fitted interaction matrix's width.
    s, i = model.recommend(np.arange(4), k=5)
    assert i.max() < _train.shape[1]


def test_recommend_requires_user_features_for_hybrid_models():
    # Mirror of the item-side guard: a model fitted with non-identity
    # user_features must not silently treat user ids as feature-row ids.
    n_users = _train.shape[0]
    user_feats = sp.csr_matrix(
        (np.ones(n_users, np.float32),
         (np.arange(n_users), np.arange(n_users) % 5)), shape=(n_users, 5),
    )
    m = LightFM(loss="warp", no_components=8, random_state=SEED)
    m.fit(_train, user_features=user_feats, epochs=1)
    with pytest.raises(ValueError, match="user_features"):
        m.recommend(np.arange(4), k=5)
    s, i = m.recommend(np.arange(4), k=5, user_features=user_feats)
    assert i.shape == (4, 5)
