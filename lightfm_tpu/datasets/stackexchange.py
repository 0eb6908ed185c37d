"""StackExchange fetcher (mirrors ``lightfm/datasets/stackexchange.py``).

Users answering questions; time-based train/test split (all interactions
before the cutoff timestamp go to train, `stackexchange.py:118-121` in the
reference), optional minimum-interaction filtering and tag features.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.sparse as sp

from lightfm_tpu.datasets import _common

URLS = {
    "crossvalidated": (
        "https://github.com/maciejkula/lightfm_datasets/releases/"
        "download/v0.1.0/stackexchange_crossvalidated.npz"
    ),
    "stackoverflow": (
        "https://github.com/maciejkula/lightfm_datasets/releases/"
        "download/v0.1.0/stackexchange_stackoverflow.npz"
    ),
}


def fetch_stackexchange(
    dataset,
    test_set_fraction=0.2,
    min_training_interactions=1,
    data_home=None,
    indicator_features=True,
    tag_features=False,
    download_if_missing=True,
):
    """Fetch a StackExchange dataset ('crossvalidated' or 'stackoverflow').

    Returns a dict with keys ``train``, ``test``, ``item_features``,
    ``item_feature_labels`` — identical structure to the reference fetcher
    (`stackexchange.py:10-165`).
    """
    if not (indicator_features or tag_features):
        raise ValueError(
            "At least one of item_indicator_features or tag_features must be True"
        )
    if dataset not in ("crossvalidated", "stackoverflow"):
        raise ValueError("Unknown dataset")
    if not (0.0 < test_set_fraction < 1.0):
        raise ValueError("Test set fraction must be between 0 and 1")

    path = _common.get_data(
        data_home,
        URLS[dataset],
        os.path.join("stackexchange", dataset),
        "data.npz",
        download_if_missing,
    )

    data = np.load(path)

    interactions = sp.coo_matrix(
        (
            data["interactions_data"],
            (data["interactions_row"], data["interactions_col"]),
        ),
        shape=data["interactions_shape"].flatten(),
    )
    interactions.sum_duplicates()

    tag_features_mat = sp.coo_matrix(
        (data["features_data"], (data["features_row"], data["features_col"])),
        shape=data["features_shape"].flatten(),
    )
    tag_labels = data["labels"]

    # Time-based split: interaction values are timestamps.
    test_cutoff_index = int(len(interactions.data) * (1.0 - test_set_fraction))
    test_cutoff_timestamp = np.sort(interactions.data)[test_cutoff_index]
    in_train = interactions.data < test_cutoff_timestamp
    in_test = np.logical_not(in_train)

    train = sp.coo_matrix(
        (
            np.ones(in_train.sum(), dtype=np.float32),
            (interactions.row[in_train], interactions.col[in_train]),
        ),
        shape=interactions.shape,
    )
    test = sp.coo_matrix(
        (
            np.ones(in_test.sum(), dtype=np.float32),
            (interactions.row[in_test], interactions.col[in_test]),
        ),
        shape=interactions.shape,
    )

    if min_training_interactions > 0:
        include = np.squeeze(np.array(train.getnnz(axis=1))) > min_training_interactions
        train = train.tocsr()[include].tocoo()
        test = test.tocsr()[include].tocoo()

    if indicator_features and not tag_features:
        features = sp.identity(train.shape[1], format="csr", dtype=np.float32)
        labels = np.array(["question_id:{}".format(x) for x in range(train.shape[1])])
    elif not indicator_features and tag_features:
        features = tag_features_mat.tocsr()
        labels = tag_labels
    else:
        id_features = sp.identity(train.shape[1], format="csr", dtype=np.float32)
        features = sp.hstack([id_features, tag_features_mat]).tocsr()
        labels = np.concatenate(
            [
                np.array(["question_id:{}".format(x) for x in range(train.shape[1])]),
                tag_labels,
            ]
        )

    return {
        "train": train,
        "test": test,
        "item_features": features,
        "item_feature_labels": labels,
    }
