"""Rank-based evaluation metrics, mirroring ``lightfm/evaluation.py``.

All four metrics derive from :meth:`LightFM.predict_rank` (the TPU-resident
dense ranking path); the O(test_nnz) rank→metric reductions run as vectorised
host numpy, exactly as the reference runs them on the CSR data arrays.
``auc_score`` reproduces ``calculate_auc_from_rank``
(`_lightfm_fast.pyx.template:1326-1376`) including its tie de-duplication.
"""

from __future__ import annotations

import numpy as np

__all__ = ["precision_at_k", "recall_at_k", "auc_score", "reciprocal_rank"]


def _check_threads(num_threads):
    if num_threads < 1:
        raise ValueError("Number of threads must be 1 or larger.")


def precision_at_k(
    model,
    test_interactions,
    train_interactions=None,
    k=10,
    user_features=None,
    item_features=None,
    preserve_rows=False,
    num_threads=1,
    check_intersections=True,
):
    """Fraction of known positives in the first k ranked results per user.

    Mirrors `lightfm/evaluation.py:14-87`.
    """
    _check_threads(num_threads)

    ranks = model.predict_rank(
        test_interactions,
        train_interactions=train_interactions,
        user_features=user_features,
        item_features=item_features,
        num_threads=num_threads,
        check_intersections=check_intersections,
    )

    ranks.data = np.less(ranks.data, k, ranks.data)
    precision = np.squeeze(np.array(ranks.sum(axis=1))) / k

    if not preserve_rows:
        precision = precision[test_interactions.getnnz(axis=1) > 0]

    return precision


def recall_at_k(
    model,
    test_interactions,
    train_interactions=None,
    k=10,
    user_features=None,
    item_features=None,
    preserve_rows=False,
    num_threads=1,
    check_intersections=True,
):
    """Hits in the first k over number of test positives per user
    (`lightfm/evaluation.py:90-166`)."""
    _check_threads(num_threads)

    ranks = model.predict_rank(
        test_interactions,
        train_interactions=train_interactions,
        user_features=user_features,
        item_features=item_features,
        num_threads=num_threads,
        check_intersections=check_intersections,
    )

    ranks.data = np.less(ranks.data, k, ranks.data)
    retrieved = np.squeeze(test_interactions.getnnz(axis=1))
    hit = np.squeeze(np.array(ranks.sum(axis=1)))

    if not preserve_rows:
        hit = hit[test_interactions.getnnz(axis=1) > 0]
        retrieved = retrieved[test_interactions.getnnz(axis=1) > 0]

    return hit / retrieved


def _auc_from_ranks(ranks_csr, num_train_positives):
    """Vectorised port of ``calculate_auc_from_rank`` (template:1326-1376).

    Per user: sort positive ranks ascending, subtract the number of
    better-ranked positives (floor 0), average ``1 - rank/num_negatives``.
    """
    n_users, n_items = ranks_csr.shape
    indptr = ranks_csr.indptr
    lengths = np.diff(indptr)
    auc = np.full(n_users, 0.5, dtype=np.float32)

    if ranks_csr.nnz == 0:
        return auc

    row_of = np.repeat(np.arange(n_users), lengths)
    # Sort ranks within each row: lexsort by (rank, row).
    order = np.lexsort((ranks_csr.data, row_of))
    sorted_ranks = ranks_csr.data[order].astype(np.float64)
    pos_in_row = np.arange(ranks_csr.nnz) - np.repeat(indptr[:-1], lengths)

    adj = np.maximum(sorted_ranks - pos_in_row, 0.0)
    num_neg = (n_items - lengths - num_train_positives).astype(np.float64)
    num_neg_per_nnz = num_neg[row_of]

    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = 1.0 - adj / num_neg_per_nnz

    nonzero = lengths > 0
    sums = np.add.reduceat(contrib, indptr[:-1][nonzero])
    user_auc = sums / lengths[nonzero]

    # Single-class users keep 0.5 (template:1344-1348).
    auc_vals = np.full(int(nonzero.sum()), 0.5, dtype=np.float64)
    keep = num_neg[nonzero] != n_items
    auc_vals[keep] = user_auc[keep]
    auc[nonzero] = auc_vals.astype(np.float32)
    return auc


def auc_score(
    model,
    test_interactions,
    train_interactions=None,
    user_features=None,
    item_features=None,
    preserve_rows=False,
    num_threads=1,
    check_intersections=True,
):
    """ROC AUC per user (`lightfm/evaluation.py:169-254`)."""
    _check_threads(num_threads)

    ranks = model.predict_rank(
        test_interactions,
        train_interactions=train_interactions,
        user_features=user_features,
        item_features=item_features,
        num_threads=num_threads,
        check_intersections=check_intersections,
    )

    assert np.all(ranks.data >= 0)

    if train_interactions is not None:
        num_train_positives = np.squeeze(
            np.array(train_interactions.getnnz(axis=1)).astype(np.int32)
        )
    else:
        num_train_positives = np.zeros(test_interactions.shape[0], dtype=np.int32)

    auc = _auc_from_ranks(ranks.tocsr(), num_train_positives)

    if not preserve_rows:
        auc = auc[test_interactions.getnnz(axis=1) > 0]

    return auc


def reciprocal_rank(
    model,
    test_interactions,
    train_interactions=None,
    user_features=None,
    item_features=None,
    preserve_rows=False,
    num_threads=1,
    check_intersections=True,
):
    """1 / rank of the best-ranked test positive (`lightfm/evaluation.py:257-327`)."""
    _check_threads(num_threads)

    ranks = model.predict_rank(
        test_interactions,
        train_interactions=train_interactions,
        user_features=user_features,
        item_features=item_features,
        num_threads=num_threads,
        check_intersections=check_intersections,
    )

    ranks.data = 1.0 / (ranks.data + 1.0)
    ranks = np.squeeze(np.array(ranks.max(axis=1).todense()))

    if not preserve_rows:
        ranks = ranks[test_interactions.getnnz(axis=1) > 0]

    return ranks
