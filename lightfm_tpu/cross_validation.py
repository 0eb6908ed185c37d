"""Dataset splitting functions (mirrors ``lightfm/cross_validation.py``)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["random_train_test_split"]


def _shuffle(uids, iids, data, random_state):
    shuffle_indices = np.arange(len(uids))
    random_state.shuffle(shuffle_indices)
    return (uids[shuffle_indices], iids[shuffle_indices], data[shuffle_indices])


def random_train_test_split(interactions, test_percentage=0.2, random_state=None):
    """Randomly split interactions into disjoint train and test COO matrices.

    Semantics match `lightfm/cross_validation.py:18-80` — including the use of
    a shared ``random_state`` seed to split a sample-weight matrix along the
    same lines.
    """
    if not sp.issparse(interactions):
        raise ValueError("Interactions must be a scipy.sparse matrix.")

    if not isinstance(random_state, np.random.RandomState):
        random_state = np.random.RandomState(seed=random_state)

    interactions = interactions.tocoo()

    shape = interactions.shape
    uids, iids, data = (interactions.row, interactions.col, interactions.data)

    uids, iids, data = _shuffle(uids, iids, data, random_state)

    cutoff = int((1.0 - test_percentage) * len(uids))

    train_idx = slice(None, cutoff)
    test_idx = slice(cutoff, None)

    train = sp.coo_matrix(
        (data[train_idx], (uids[train_idx], iids[train_idx])),
        shape=shape,
        dtype=interactions.dtype,
    )
    test = sp.coo_matrix(
        (data[test_idx], (uids[test_idx], iids[test_idx])),
        shape=shape,
        dtype=interactions.dtype,
    )

    return train, test
