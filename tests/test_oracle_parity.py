"""Statistical parity: batched TPU training vs the sequential oracle.

The reference validates its Hogwild parallelism by comparing multithreaded
accuracy against single-threaded accuracy (its test_movielens.py:536-546).
The analogous contract here: our synchronous batched reformulation must land
within a small margin of the sequential per-sample algorithm (the oracle is
an independent numpy implementation of the reference's exact loops) across
every (loss, schedule) combination.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score
from lightfm_tpu.datasets import generate_synthetic

from _reference_oracle import SequentialOracle

SEED = 10
EPOCHS = 5

_data = generate_synthetic(n_users=150, n_items=120, seed=5)
_train = _data["train"].tocsr().astype(np.float32)
_train.data = np.where(_train.data >= 4, 1.0, -1.0).astype(np.float32)
_pos = _train.copy()
_pos.data[_pos.data < 0] = 0.0
_pos.eliminate_zeros()
# Membership/sampling structures use the FULL interaction rows (all
# nonzeros, including negative-valued entries) — exactly what the reference
# passes to its positives_lookup (`lightfm/lightfm.py:681-686`) and what our
# build_train_data pads.
_all_sets = {
    u: set(_train.indices[_train.indptr[u] : _train.indptr[u + 1]])
    for u in range(_train.shape[0])
}


def _oracle_auc(loss, schedule):
    o = SequentialOracle(
        _train.shape[0],
        _train.shape[1],
        loss=loss if loss != "warp-kos" else "warp",
        learning_schedule=schedule,
        seed=SEED,
    )
    coo = _train.tocoo()
    if loss == "warp-kos":
        plists = [
            list(_train.indices[_train.indptr[u] : _train.indptr[u + 1]])
            for u in range(_train.shape[0])
        ]
        for _ in range(EPOCHS):
            o.fit_epoch_kos(coo.row, plists, _all_sets)
    else:
        w = np.ones(coo.nnz)
        for _ in range(EPOCHS):
            o.fit_epoch(coo.row, coo.col, coo.data, w, _all_sets)
    return o.auc(_pos)


def _model_auc(loss, schedule):
    m = LightFM(loss=loss, learning_schedule=schedule, random_state=SEED)
    m.fit(_train.tocoo(), epochs=EPOCHS)
    return float(auc_score(m, _pos, check_intersections=False).mean())


@pytest.mark.parametrize("loss", ["logistic", "bpr", "warp", "warp-kos"])
@pytest.mark.parametrize("schedule", ["adagrad", "adadelta"])
def test_batched_training_matches_sequential_oracle(loss, schedule):
    ours = _model_auc(loss, schedule)
    oracle = _oracle_auc(loss, schedule)
    # Same statistical bar the reference applies to Hogwild: the batched
    # reformulation must not trail the sequential algorithm meaningfully.
    assert ours > oracle - 0.08, (loss, schedule, ours, oracle)
    assert ours > 0.55, (loss, schedule, ours)
