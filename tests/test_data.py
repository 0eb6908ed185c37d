"""Dataset builder tests (mirrors the reference's ``tests/test_data.py``)."""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu.data import Dataset


def test_fit_shapes():
    users, items = ["a", "b", "c"], [1, 2]
    ds = Dataset()
    ds.fit(users, items)
    assert ds.interactions_shape() == (3, 2)
    # identity features allocated by default
    assert ds.user_features_shape() == (3, 3)
    assert ds.item_features_shape() == (2, 2)
    assert ds.model_dimensions() == (3, 2)


def test_no_identity_features():
    ds = Dataset(user_identity_features=False, item_identity_features=False)
    ds.fit(["a", "b"], [1], user_features=["f1"], item_features=["g1", "g2"])
    assert ds.user_features_shape() == (2, 1)
    assert ds.item_features_shape() == (1, 2)


def test_build_interactions_and_weights():
    ds = Dataset()
    ds.fit(["u1", "u2"], ["i1", "i2", "i3"])
    interactions, weights = ds.build_interactions(
        [("u1", "i1"), ("u2", "i3", 3.0)]
    )
    assert interactions.shape == (2, 3)
    assert interactions.nnz == 2
    assert np.all(interactions.data == 1)
    assert set(weights.data) == {1.0, 3.0}


def test_unknown_ids_raise():
    ds = Dataset()
    ds.fit(["u1"], ["i1"])
    with pytest.raises(ValueError):
        ds.build_interactions([("nope", "i1")])
    with pytest.raises(ValueError):
        ds.build_interactions([("u1", "nope")])
    with pytest.raises(ValueError):
        ds.build_item_features([("i1", ["unknown_feature"])])


def test_feature_builder_identity_plus_features():
    ds = Dataset()
    ds.fit(["u1"], ["i1", "i2"], item_features=["genre:a", "genre:b"])
    feats = ds.build_item_features(
        [("i1", ["genre:a"]), ("i2", {"genre:b": 3.0})], normalize=False
    )
    assert feats.shape == (2, 4)  # 2 identity + 2 genres
    dense = feats.toarray()
    # identity weight 1 + feature weights
    assert dense[0, 0] == 1.0 and dense[0, 2] == 1.0
    assert dense[1, 1] == 1.0 and dense[1, 3] == 3.0


def test_l1_normalization():
    ds = Dataset()
    ds.fit(["u1"], ["i1"], item_features=["f"])
    feats = ds.build_item_features([("i1", {"f": 3.0})], normalize=True)
    assert np.allclose(np.asarray(feats.sum(axis=1)).ravel(), 1.0)

    # zero-norm rows raise
    ds2 = Dataset(item_identity_features=False)
    ds2.fit(["u1"], ["i1", "i2"], item_features=["f"])
    with pytest.raises(ValueError):
        ds2.build_item_features([("i1", {"f": 1.0})], normalize=True)


def test_fit_partial_extends_mappings():
    ds = Dataset()
    ds.fit(["u1"], ["i1"])
    ds.fit_partial(users=["u2"], items=["i2"])
    assert ds.interactions_shape() == (2, 2)
    # fit resets
    ds.fit(["x"], ["y"])
    assert ds.interactions_shape() == (1, 1)


def test_mapping_roundtrip():
    ds = Dataset()
    ds.fit(["u1", "u2"], ["i1"])
    umap, ufmap, imap, ifmap = ds.mapping()
    assert umap == {"u1": 0, "u2": 1}
    assert imap == {"i1": 0}


def test_interactions_out_of_bounds_raise():
    from lightfm_tpu.data import _IncrementalCOOMatrix

    m = _IncrementalCOOMatrix((2, 2), np.float32)
    with pytest.raises(Exception):
        m.append(2, 0, 1.0)


def test_end_to_end_with_model():
    from lightfm_tpu import LightFM

    ds = Dataset()
    users = ["u%d" % i for i in range(30)]
    items = ["i%d" % i for i in range(20)]
    ds.fit(users, items, item_features=["f1", "f2"])
    rng = np.random.RandomState(0)
    pairs = [(users[rng.randint(30)], items[rng.randint(20)]) for _ in range(100)]
    interactions, weights = ds.build_interactions(pairs)
    item_features = ds.build_item_features(
        ((i, ["f1"] if idx % 2 else ["f2"]) for idx, i in enumerate(items))
    )
    model = LightFM(random_state=1)
    model.fit(interactions, item_features=item_features, sample_weight=weights, epochs=2)
    assert model.item_embeddings.shape[0] == ds.model_dimensions()[1]


def test_fit_accepts_generators():
    # One-shot iterables must populate BOTH the id mapping and the identity
    # feature mapping (regression: a two-pass refactor left feature
    # mappings empty for generators).
    ds = Dataset()
    ds.fit((u for u in ["a", "b"]), (i for i in ["x", "y", "z"]))
    assert ds.interactions_shape() == (2, 3)
    assert ds.user_features_shape() == (2, 2)
    assert ds.item_features_shape() == (3, 3)
    assert ds.model_dimensions() == (2, 3)
