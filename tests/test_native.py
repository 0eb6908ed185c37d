"""Native ingest engine tests: C++ fast paths must match the pure-Python
reference semantics exactly (insertion order, error behavior)."""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import native
from lightfm_tpu.data import Dataset

pytestmark = pytest.mark.skipif(
    not native.AVAILABLE, reason="native ingest library not built"
)


def test_map_ids_first_seen_order():
    ids = np.array([5, 3, 5, 9, 3, 7], dtype=np.int64)
    uniq = native.map_ids(np.empty(0, np.int64), ids)
    assert uniq.tolist() == [5, 3, 9, 7]
    more = native.map_ids(uniq, np.array([9, 1, 5, 2], dtype=np.int64))
    assert more.tolist() == [1, 2]


def test_lookup_ids_missing_is_minus_one():
    keys = np.array([5, 3, 9], dtype=np.int64)
    out = native.lookup_ids(keys, np.array([3, 42, 9], dtype=np.int64))
    assert out.tolist() == [1, -1, 2]


def test_parse_interactions():
    data = b"1\t10\t4.0\n2\t20\nbad line\n3\t30\t2.5\n"
    u, i, v = native.parse_interactions(data)
    assert u.tolist() == [1, 2, 3]
    assert i.tolist() == [10, 20, 30]
    assert np.allclose(v, [4.0, 1.0, 2.5])


def test_dataset_fast_fit_matches_python():
    rng = np.random.RandomState(0)
    users = rng.randint(0, 50, 500)
    items = rng.randint(100, 180, 500)

    fast = Dataset()
    fast.fit(users, items)  # numpy int arrays -> native path

    slow = Dataset()
    slow.fit([int(u) for u in users], [int(i) for i in items])  # Python ints

    assert fast.mapping()[0] == slow.mapping()[0]
    assert fast.mapping()[2] == slow.mapping()[2]
    assert fast.mapping()[1] == slow.mapping()[1]


def test_dataset_fast_build_interactions_matches_python():
    rng = np.random.RandomState(1)
    users = rng.randint(0, 50, 300)
    items = rng.randint(0, 80, 300)
    weights = rng.rand(300).astype(np.float32)

    ds = Dataset()
    ds.fit(users, items)

    fast_i, fast_w = ds.build_interactions((users, items, weights))
    slow_i, slow_w = ds.build_interactions(
        [(int(u), int(i), float(w)) for u, i, w in zip(users, items, weights)]
    )
    assert (sp.csr_matrix(fast_i) != sp.csr_matrix(slow_i)).nnz == 0
    assert np.allclose(
        sp.csr_matrix(fast_w).toarray(), sp.csr_matrix(slow_w).toarray()
    )


def test_dataset_fast_build_unknown_id_raises():
    ds = Dataset()
    ds.fit(np.arange(10), np.arange(10))
    with pytest.raises(ValueError, match="User id 99"):
        ds.build_interactions((np.array([99]), np.array([1])))
    with pytest.raises(ValueError, match="Item id 99"):
        ds.build_interactions((np.array([1]), np.array([99])))


def test_fit_partial_mixed_paths():
    # Native fast path then Python path (string ids) must coexist.
    ds = Dataset()
    ds.fit_partial(users=np.array([7, 8], dtype=np.int64), items=np.array([1]))
    ds.fit_partial(users=["alice"], items=["thing"])
    umap = ds.mapping()[0]
    assert umap[7] == 0 and umap[8] == 1 and umap["alice"] == 2


def test_feature_builder_arrays_match_python():
    rng = np.random.RandomState(2)
    items = np.arange(40)
    feats = np.arange(100, 112)
    ds = Dataset()
    ds.fit(np.arange(5), items, item_features=feats)

    e = rng.randint(0, 40, 120)
    f = feats[rng.randint(0, len(feats), 120)]
    w = rng.rand(120).astype(np.float32)

    fast = ds.build_item_features((e, f, w), normalize=True)
    slow = ds.build_item_features(
        [(int(a), {int(b): float(c)}) for a, b, c in zip(e, f, w)], normalize=True
    )
    assert np.allclose(fast.toarray(), slow.toarray(), atol=1e-6)

    # no-weights variant
    fast1 = ds.build_item_features((e, f), normalize=False)
    slow1 = ds.build_item_features(
        [(int(a), [int(b)]) for a, b in zip(e, f)], normalize=False
    )
    assert np.allclose(fast1.toarray(), slow1.toarray(), atol=1e-6)


def test_feature_builder_arrays_unknown_raises():
    ds = Dataset()
    ds.fit(np.arange(5), np.arange(10), item_features=np.arange(100, 105))
    with pytest.raises(ValueError, match="not in item id mappings"):
        ds.build_item_features((np.array([99]), np.array([100])))
    with pytest.raises(ValueError, match="not in feature mapping"):
        ds.build_item_features((np.array([1]), np.array([999])))


def test_fit_partial_mixed_feature_mapping_keeps_identity_entries():
    # Regression: when int-array ids take the native path but the feature
    # mapping already holds string keys, identity entries must still be
    # registered via the Python fallback.
    ds = Dataset()
    ds.fit_partial(item_features=["tag:a"])           # string feature first
    ds.fit_partial(items=np.array([5, 6], np.int64))  # native id path
    fmap = ds.mapping()[3]
    assert fmap["tag:a"] == 0 and fmap[5] == 1 and fmap[6] == 2


def test_parse_trailing_delimiter_does_not_consume_next_line():
    # Regression: strtof skips '\n' as whitespace, so "1\t2\t\n" used to
    # steal the next line's uid as this row's value.
    from lightfm_tpu import native

    if not native.AVAILABLE:
        pytest.skip("no native library")
    uids, iids, vals = native.parse_interactions(b"1\t2\t\n3\t4\t5\n")
    assert uids.tolist() == [1, 3]
    assert iids.tolist() == [2, 4]
    assert vals.tolist() == [1.0, 5.0]
