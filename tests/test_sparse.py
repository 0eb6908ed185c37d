"""Sparse-structure unit tests — the analogue of the reference's
``tests/test_fast_functions.py`` (its exported ``__test_in_positives``
bsearch helper)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from lightfm_tpu.sparse import (
    in_positives,
    in_positives_slots,
    identity_rows,
    pad_csr,
    pad_csr_sorted,
)


def _fixture():
    mat = sp.csr_matrix(
        np.array(
            [
                [0, 1, 1, 0, 0],
                [1, 0, 0, 0, 1],
                [0, 0, 0, 0, 0],
                [1, 1, 1, 1, 1],
            ],
            dtype=np.float32,
        )
    )
    return pad_csr_sorted(mat)


def test_in_positives_matches_membership():
    rows = _fixture()
    row_ids = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    col_ids = jnp.asarray([[1, 3], [0, 1], [0, 4], [2, 4]], dtype=jnp.int32)
    got = np.asarray(in_positives(rows, row_ids, col_ids))
    want = np.array([[True, False], [True, False], [False, False], [True, True]])
    assert np.array_equal(got, want)


def test_in_positives_slots_orientation():
    rows = _fixture()
    row_ids = jnp.asarray([0, 1, 3], dtype=jnp.int32)
    # [K=2, B=3] slot-major
    col_ids = jnp.asarray([[1, 0, 2], [3, 4, 0]], dtype=jnp.int32)
    got = np.asarray(in_positives_slots(rows, row_ids, col_ids))
    want = np.array([[True, True, True], [False, True, True]])
    assert np.array_equal(got, want)


def test_in_positives_1d():
    rows = _fixture()
    got = np.asarray(
        in_positives(
            rows,
            jnp.asarray([0, 1, 2], dtype=jnp.int32),
            jnp.asarray([2, 2, 2], dtype=jnp.int32),
        )
    )
    assert got.tolist() == [True, False, False]


def test_pad_csr_roundtrip():
    rng = np.random.RandomState(0)
    mat = sp.random(13, 29, density=0.2, format="csr", dtype=np.float32, random_state=rng)
    padded = pad_csr(mat, pad_multiple=8)
    assert padded.idx.shape[1] % 8 == 0
    dense = np.zeros(mat.shape, np.float32)
    idx, wts = np.asarray(padded.idx), np.asarray(padded.wts)
    for r in range(mat.shape[0]):
        for c, w in zip(idx[r], wts[r]):
            dense[r, c] += w
    assert np.allclose(dense, mat.toarray())


def test_sentinel_padding_never_matches():
    mat = sp.csr_matrix((2, 5), dtype=np.float32)  # empty rows
    rows = pad_csr_sorted(mat)
    got = np.asarray(
        in_positives(
            rows,
            jnp.asarray([0, 1], dtype=jnp.int32),
            jnp.asarray([[0, 4], [1, 3]], dtype=jnp.int32),
        )
    )
    assert not got.any()


def test_identity_rows_shape():
    rows = identity_rows(7)
    assert rows.n_rows == 7
    assert rows.n_cols == 7
    assert rows.max_nnz == 1


def test_pad_csr_sorted_width_cap():
    rng = np.random.RandomState(0)
    # one heavy row (40 entries), others light
    rows = np.concatenate([np.zeros(40, int), [1, 2]])
    cols = np.concatenate([np.arange(40) * 2, [5, 9]])
    mat = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(3, 100)
    )
    capped = pad_csr_sorted(mat, pad_multiple=8, max_width=16)
    assert capped.idx.shape[1] == 16
    assert int(capped.lengths[0]) == 16  # clipped
    assert int(capped.lengths[1]) == 1
    # Kept entries are the first (sorted) 16 of the heavy row.
    assert np.asarray(capped.idx)[0, :16].tolist() == (np.arange(16) * 2).tolist()
    # Light rows keep exact membership.
    got = np.asarray(
        in_positives(
            capped,
            jnp.asarray([1, 1], dtype=jnp.int32),
            jnp.asarray([5, 6], dtype=jnp.int32),
        )
    )
    assert got.tolist() == [True, False]
