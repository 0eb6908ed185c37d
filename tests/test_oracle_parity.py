"""Statistical parity: batched TPU training vs the sequential oracle.

The reference validates its Hogwild parallelism by comparing multithreaded
accuracy against single-threaded accuracy (its test_movielens.py:536-546).
The analogous contract here: our synchronous batched reformulation must land
within a small margin of the sequential per-sample algorithm (the oracle is
an independent numpy implementation of the reference's exact loops) across
every (loss, schedule) combination, with regularisation (lazy-L2 scale
bookkeeping) parity-checked too, and a Zipf-skewed-degree case exercising
the width-capped rejection structure and the scaled BPR try budget against
heavy users.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score
from lightfm_tpu.datasets import generate_synthetic

from _reference_oracle import SequentialOracle

# Statistical battery: skipped by default, run via --runslow (make test-full).
pytestmark = pytest.mark.slow

SEED = 10
EPOCHS = 10

_data = generate_synthetic(
    n_users=500, n_items=400, interactions_per_user=40, seed=5
)
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


_ORACLE_CACHE: dict = {}


def _oracle_auc(train_csr, pos_csr, loss, schedule, all_sets,
                item_alpha=0.0, user_alpha=0.0, epochs=EPOCHS):
    # The oracle is deterministic given its arguments; memoize so the
    # fast-path parity tests reuse the generic tests' runs (the sequential
    # numpy loops dominate this file's runtime).
    cache_key = (id(train_csr), loss, schedule, item_alpha, user_alpha, epochs)
    if cache_key in _ORACLE_CACHE:
        return _ORACLE_CACHE[cache_key]
    o = SequentialOracle(
        train_csr.shape[0],
        train_csr.shape[1],
        loss=loss if loss != "warp-kos" else "warp",
        learning_schedule=schedule,
        item_alpha=item_alpha,
        user_alpha=user_alpha,
        seed=SEED,
    )
    coo = train_csr.tocoo()
    if loss == "warp-kos":
        plists = [
            list(train_csr.indices[train_csr.indptr[u] : train_csr.indptr[u + 1]])
            for u in range(train_csr.shape[0])
        ]
        for _ in range(epochs):
            o.fit_epoch_kos(coo.row, plists, all_sets)
    else:
        w = np.ones(coo.nnz)
        for _ in range(epochs):
            o.fit_epoch(coo.row, coo.col, coo.data, w, all_sets)
    _ORACLE_CACHE[cache_key] = o.auc(pos_csr)
    return _ORACLE_CACHE[cache_key]


def _model_auc(train_csr, pos_csr, loss, schedule,
               item_alpha=0.0, user_alpha=0.0, epochs=EPOCHS):
    m = LightFM(
        loss=loss, learning_schedule=schedule, random_state=SEED,
        item_alpha=item_alpha, user_alpha=user_alpha,
    )
    m.fit(train_csr.tocoo(), epochs=epochs)
    return float(auc_score(m, pos_csr, check_intersections=False).mean())


@pytest.mark.parametrize("loss", ["logistic", "bpr", "warp", "warp-kos"])
@pytest.mark.parametrize("schedule", ["adagrad", "adadelta"])
def test_batched_training_matches_sequential_oracle(loss, schedule):
    ours = _model_auc(_train, _pos, loss, schedule)
    oracle = _oracle_auc(_train, _pos, loss, schedule, _all_sets)
    # Same statistical bar the reference applies to Hogwild: the batched
    # reformulation must not trail the sequential algorithm meaningfully.
    assert ours > oracle - 0.05, (loss, schedule, ours, oracle)
    assert ours > 0.6, (loss, schedule, ours)


@pytest.mark.parametrize("loss", ["warp", "bpr", "logistic"])
def test_fast_path_matches_sequential_oracle(loss, monkeypatch):
    """The specialised fast path (pool negatives / item-sorted batches /
    sorted Pallas updates) must clear the SAME oracle bar as the generic
    path — not merely match the generic path statistically.  Eligibility
    is forced (the oracle dataset is below the production size gate)."""
    import lightfm_tpu.fast_warp as fw

    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "1")
    monkeypatch.setattr(fw, "MIN_TABLE_ELEMS", 0)
    m = LightFM(loss=loss, learning_schedule="adagrad", random_state=SEED)
    m.fit(_train.tocoo(), epochs=EPOCHS)
    assert m._staged_fast, "fast path did not engage"
    ours = float(auc_score(m, _pos, check_intersections=False).mean())
    oracle = _oracle_auc(_train, _pos, loss, "adagrad", _all_sets)
    assert ours > oracle - 0.05, (loss, ours, oracle)
    assert ours > 0.6, (loss, ours)


@pytest.mark.parametrize("loss", ["warp", "logistic"])
def test_lazy_l2_matches_sequential_oracle(loss):
    # alpha != 0 exercises the log-space scale accumulators and the
    # scatter-mul regularisation path (ops/updates.py) against the oracle's
    # exact per-step (1 + alpha*lr) multiplies.
    ours = _model_auc(_train, _pos, loss, "adagrad",
                      item_alpha=1e-4, user_alpha=1e-4)
    oracle = _oracle_auc(_train, _pos, loss, "adagrad", _all_sets,
                         item_alpha=1e-4, user_alpha=1e-4)
    assert ours > oracle - 0.05, (loss, ours, oracle)
    assert ours > 0.6, (loss, ours)


def _zipf_dataset(n_users=200, n_items=800, seed=3):
    """Skewed-degree interactions: user degree ~ Zipf, with the heaviest
    user holding >512 positives (beyond the rejection-structure width cap)
    and a large share of the empirical item distribution."""
    rng = np.random.RandomState(seed)
    degrees = np.minimum(
        (n_items * 0.9 / np.arange(1, n_users + 1) ** 1.1).astype(int) + 3,
        int(n_items * 0.9),
    )
    rows = np.repeat(np.arange(n_users), degrees)
    cols = np.concatenate(
        [rng.choice(n_items, d, replace=False) for d in degrees]
    ).astype(np.int32)
    train = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    return train


@pytest.mark.parametrize("loss", ["bpr", "warp"])
def test_skewed_degrees_match_sequential_oracle(loss):
    # Heavy users: the 512-cap rejection structure and the scaled BPR try
    # budget must not measurably degrade training vs the uncapped
    # sequential algorithm (which rejects against FULL positive sets).
    train = _zipf_dataset()
    sets = {
        u: set(train.indices[train.indptr[u] : train.indptr[u + 1]])
        for u in range(train.shape[0])
    }
    ours = _model_auc(train, train, loss, "adagrad", epochs=5)
    oracle = _oracle_auc(train, train, loss, "adagrad", sets, epochs=5)
    assert ours > oracle - 0.05, (loss, ours, oracle)


def test_bpr_tries_scale_with_degree_skew():
    from lightfm_tpu.model import LightFM as M

    def worst_p(csr):
        # Probability an empirical draw hits the worst user's positives:
        # the mass of their positive ITEMS over all interactions.
        csr = sp.csr_matrix(csr)
        counts = np.asarray(csr.getnnz(axis=0), dtype=np.float64).ravel()
        ind = csr.copy()
        ind.data = np.ones_like(ind.data)
        return float(ind.dot(counts).max()) / csr.nnz

    for data in (
        _zipf_dataset(),
        generate_synthetic(n_users=100, n_items=80, seed=1)["train"],
        generate_synthetic(seed=1)["train"],  # ML-100k shape
    ):
        tries = M._bpr_tries_for(data)
        p = min(worst_p(data), 0.99)
        assert 8 <= tries <= 64
        # The sized budget must push fall-through under 1e-3 (unless
        # already at the 64-try cap).
        assert p**tries < 1e-3 or tries == 64
