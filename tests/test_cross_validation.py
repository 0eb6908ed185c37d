"""Split tests (mirrors the reference's ``tests/test_cross_validation.py``)."""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu.cross_validation import random_train_test_split


def _interactions(n=1000, shape=(100, 80), seed=0):
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, shape[0], n)
    cols = rng.randint(0, shape[1], n)
    mat = sp.coo_matrix((np.ones(n, np.float32), (rows, cols)), shape=shape)
    mat.sum_duplicates()
    return mat


def test_split_fractions_exact():
    mat = _interactions()
    train, test = random_train_test_split(mat, test_percentage=0.2, random_state=0)
    assert train.nnz == int(0.8 * mat.nnz)
    assert train.nnz + test.nnz == mat.nnz


def test_split_disjoint():
    mat = _interactions()
    train, test = random_train_test_split(mat, test_percentage=0.3, random_state=1)
    assert train.multiply(test).nnz == 0


def test_split_seeded_reproducible():
    mat = _interactions()
    t1, _ = random_train_test_split(mat, random_state=5)
    t2, _ = random_train_test_split(mat, random_state=5)
    assert (t1 != t2).nnz == 0


def test_split_rejects_dense():
    with pytest.raises(ValueError):
        random_train_test_split(np.ones((3, 3)))
