"""Statistical integration tests on the planted-structure synthetic dataset.

The reference enforces metric floors on MovieLens 100k
(`tests/test_movielens.py`); this environment has no network egress, so the
same strategy runs against :func:`generate_synthetic` instead.  Floors are
calibrated against the sequential oracle (tests/_reference_oracle.py), an
independent numpy implementation of the reference's per-sample algorithm,
which reaches on this dataset (10 epochs, seed 10; twin recalibrated to
ML-100k marginals in round 2):

    warp     AUC train/test = 0.9479 / 0.9060
    bpr      AUC train/test = 0.9254 / 0.8842
    logistic AUC train/test = 0.7355 / 0.6871
    warp-kos AUC train/test = 0.8443 / 0.8074

Our batched trainer measures within 0.013 AUC of the oracle on every row
(logistic 0.7310, bpr 0.9138, warp 0.9427, kos 0.8404 train AUC).  Floors
below sit a small margin under those measurements, exactly how the
reference's CI floors sit under its typical metrics.
"""

import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.evaluation import auc_score, precision_at_k

# Statistical battery: skipped by default, run via --runslow (make test-full).
pytestmark = pytest.mark.slow

SEED = 10


def _binarize(dataset):
    dataset = dataset.copy().astype(np.float32)
    positives = dataset.data >= 4.0
    dataset.data[positives] = 1.0
    dataset.data[np.logical_not(positives)] = -1.0
    return dataset


_data = generate_synthetic(seed=42)
train, test = _binarize(_data["train"]), _binarize(_data["test"])


def _get_metrics(model, train_set, test_set):
    train_set = train_set.tocsr().copy()
    test_set = test_set.tocsr().copy()
    train_set.data[train_set.data < 0] = 0.0
    test_set.data[test_set.data < 0] = 0.0
    train_set.eliminate_zeros()
    test_set.eliminate_zeros()
    return (
        precision_at_k(model, train_set).mean(),
        precision_at_k(model, test_set).mean(),
        auc_score(model, train_set).mean(),
        auc_score(model, test_set).mean(),
    )


def test_logistic_accuracy():
    model = LightFM(random_state=SEED)
    model.fit_partial(train, epochs=10)
    ptr, pte, atr, ate = _get_metrics(model, train, test)
    # Oracle parity is tight (0.731 vs 0.736); absolute logistic numbers on
    # the twin run below the reference's real-data 0.84 (documented delta
    # in datasets/synthetic.py).
    assert ptr > 0.19
    assert atr > 0.71
    assert ate > 0.66


def test_bpr_accuracy():
    model = LightFM(learning_rate=0.05, loss="bpr", random_state=SEED)
    model.fit_partial(train, epochs=10)
    ptr, pte, atr, ate = _get_metrics(model, train, test)
    assert ptr > 0.45
    assert pte > 0.05
    assert atr > 0.89
    assert ate > 0.85


def test_warp_accuracy():
    model = LightFM(learning_rate=0.05, loss="warp", random_state=SEED)
    model.fit_partial(train, epochs=10)
    ptr, pte, atr, ate = _get_metrics(model, train, test)
    assert ptr > 0.5
    assert pte > 0.06
    assert atr > 0.92
    assert ate > 0.88


def test_warp_adadelta_accuracy():
    model = LightFM(
        learning_schedule="adadelta",
        rho=0.95,
        epsilon=1e-6,
        loss="warp",
        random_state=SEED,
    )
    model.fit_partial(train, epochs=10)
    ptr, pte, atr, ate = _get_metrics(model, train, test)
    assert ptr > 0.55
    assert atr > 0.94
    assert ate > 0.90


def test_warp_kos_accuracy():
    # The oracle reaches 0.8443/0.8074 on this dataset; k-OS is weaker than
    # WARP here because it optimises the k-th order statistic over ALL
    # interactions including low-rated ones.  The principled check against
    # the oracle at matched config is tests/test_oracle_parity.py.
    model = LightFM(loss="warp-kos", k=5, random_state=SEED)
    model.fit_partial(train, epochs=10)
    ptr, pte, atr, ate = _get_metrics(model, train, test)
    assert ptr > 0.39
    assert atr > 0.82
    assert ate > 0.78


def test_max_sampled_zero_negatives_means_no_learning():
    # max_sampled=1 with an always-violating margin barely learns; the
    # reference's analogue is test_movielens.py:247-263.  With max_sampled
    # so small that violators are rarely found, accuracy must drop well
    # below the full-warp floor.
    model = LightFM(loss="warp", max_sampled=1, random_state=SEED)
    model.fit_partial(train, epochs=1)
    _, _, atr, _ = _get_metrics(model, train, test)
    full = LightFM(loss="warp", random_state=SEED)
    full.fit_partial(train, epochs=10)
    _, _, atr_full, _ = _get_metrics(full, train, test)
    assert atr_full > atr


def test_zero_sample_weights_mean_no_learning():
    weights = sp.coo_matrix(
        (np.zeros_like(train.data), (train.row, train.col)), shape=train.shape
    )
    model = LightFM(random_state=SEED)
    model.fit_partial(train, sample_weight=weights, epochs=3)
    _, _, atr, ate = _get_metrics(model, train, test)
    assert 0.45 < atr < 0.55
    assert 0.45 < ate < 0.55


def test_regularization_degrades_but_stays_finite():
    model = LightFM(item_alpha=1e7, user_alpha=1e7, loss="warp", random_state=SEED)
    model.fit_partial(train, epochs=3)
    _, _, atr, _ = _get_metrics(model, train, test)
    assert np.isfinite(model.item_embeddings).all()
    assert atr < 0.7


def test_moderate_regularization_trains():
    model = LightFM(item_alpha=1e-5, user_alpha=1e-5, loss="warp", random_state=SEED)
    model.fit_partial(train, epochs=10)
    _, _, atr, ate = _get_metrics(model, train, test)
    assert atr > 0.9


def test_random_state_fixing_bitwise():
    a = LightFM(loss="warp", random_state=SEED).fit(train, epochs=2)
    b = LightFM(loss="warp", random_state=SEED).fit(train, epochs=2)
    assert np.array_equal(a.item_embeddings, b.item_embeddings)
    assert np.array_equal(a.user_embeddings, b.user_embeddings)


def test_rng_advances_between_epochs():
    model = LightFM(loss="warp", random_state=SEED).fit(train, epochs=1)
    e1 = model.item_embeddings.copy()
    model.fit_partial(train, epochs=1)
    assert not np.array_equal(e1, model.item_embeddings)


def test_fit_resets_state_fit_partial_resumes():
    model = LightFM(loss="warp", random_state=SEED).fit(train, epochs=2)
    after_fit = model.item_embeddings.copy()
    model.fit_partial(train, epochs=2)
    resumed = model.item_embeddings.copy()
    assert not np.array_equal(after_fit, resumed)

    # Same seed refit produces the initial-epochs result again.
    model2 = LightFM(loss="warp", random_state=SEED).fit(train, epochs=2)
    assert np.array_equal(after_fit, model2.item_embeddings)


def test_pickle_roundtrip_preserves_metrics():
    model = LightFM(loss="warp", random_state=SEED)
    model.fit_partial(train, epochs=5)
    clone = pickle.loads(pickle.dumps(model))
    m1 = _get_metrics(model, train, test)
    m2 = _get_metrics(clone, train, test)
    assert np.allclose(m1, m2)


def test_training_schedule_state_invariants():
    # adagrad accumulators grow from their init of 1 and momentum stays 0;
    # adadelta touches both accumulators (reference test_movielens.py:602-652).
    model = LightFM(loss="warp", learning_schedule="adagrad", random_state=SEED)
    model.fit_partial(train, epochs=1)
    assert (model.item_embedding_gradients >= 1.0).all()
    assert (model.item_embedding_momentum == 0.0).all()

    model = LightFM(loss="warp", learning_schedule="adadelta", random_state=SEED)
    model.fit_partial(train, epochs=1)
    assert (model.item_embedding_gradients > 0.0).any()
    assert (model.item_embedding_momentum > 0.0).any()


def test_sklearn_cv_compatibility():
    from sklearn.model_selection import RandomizedSearchCV, KFold

    model = LightFM(loss="warp", random_state=SEED)
    search = RandomizedSearchCV(
        model,
        param_distributions={"no_components": [5, 10], "learning_rate": [0.05, 0.1]},
        n_iter=2,
        cv=KFold(n_splits=2),
        scoring=lambda est, X, y=None: float(
            auc_score(est, X.tocsr(), check_intersections=False).mean()
        ),
        random_state=SEED,
    )
    small = train.tocsr()[:200].tocoo()
    # sklearn splits examples along axis 0; we just need fit/predict to
    # interoperate with clone/get_params/set_params.
    search.fit(small)
    assert search.best_score_ > 0.5


def test_hybrid_features_cold_start_transfer():
    # Genre-style features shared across items let a model generalise (the
    # reference's genre-features contract, test_movielens.py:289-317).  The
    # synthetic generator provides genres correlated with the planted
    # factors, like real genres correlate with preferences.
    item_feats = _data["item_genre_features"]
    model = LightFM(loss="warp", random_state=SEED)
    model.fit_partial(train, item_features=item_feats, epochs=10)
    _, _, atr, ate = _get_metrics_features(model, train, test, item_feats)
    assert atr > 0.6
    assert ate > 0.6


def _get_metrics_features(model, train_set, test_set, item_features):
    train_set = train_set.tocsr().copy()
    test_set = test_set.tocsr().copy()
    train_set.data[train_set.data < 0] = 0.0
    test_set.data[test_set.data < 0] = 0.0
    train_set.eliminate_zeros()
    test_set.eliminate_zeros()
    return (
        precision_at_k(model, train_set, item_features=item_features).mean(),
        precision_at_k(model, test_set, item_features=item_features).mean(),
        auc_score(model, train_set, item_features=item_features).mean(),
        auc_score(model, test_set, item_features=item_features).mean(),
    )


def test_sample_weights_scaled_down_still_learns():
    # Uniformly scaled-down weights still learn (the reference's
    # test_movielens_accuracy_sample_weights, :415-434).
    weights = train.copy()
    weights.data = np.ones(train.getnnz(), dtype=np.float32) * 0.5
    # Floors calibrated on this dataset (batched adagrad adapts over ~85
    # steps/epoch rather than the reference's per-sample cadence, so the
    # half-weight drop is steeper for the lr-sensitive losses).
    for loss, floor in (("logistic", 0.58), ("bpr", 0.70), ("warp", 0.88)):
        model = LightFM(loss=loss, random_state=SEED)
        model.fit_partial(train, sample_weight=weights, epochs=10)
        _, _, atr, _ = _get_metrics(model, train, test)
        assert atr > floor, (loss, atr)


def test_zero_weight_users_accumulate_no_gradient():
    # Zero-weight samples must not move adagrad accumulators (the
    # reference's grad-accumulation contract, test_movielens.py:437-460).
    weights = train.copy()
    weights.data = np.ones(train.getnnz(), dtype=np.float32)
    even_users = weights.row % 2 == 0
    weights.data *= even_users

    even_idx = np.arange(train.shape[0]) % 2 == 0
    odd_idx = ~even_idx

    for loss in ("logistic", "bpr", "warp"):
        model = LightFM(loss=loss, random_state=SEED)
        model.fit_partial(train, sample_weight=weights, epochs=1)

        assert np.allclose(model.user_embedding_gradients[odd_idx], 1.0)
        assert np.allclose(model.user_bias_gradients[odd_idx], 1.0)
        assert not np.allclose(model.user_embedding_gradients[even_idx], 1.0)
        assert not np.allclose(model.user_bias_gradients[even_idx], 1.0)


def test_hybrid_beats_cf_on_cold_start_items():
    # Hold out entire items: CF has nothing to learn for them; shared
    # metadata features must transfer (the reference's StackExchange
    # hybrid contract, doc/examples/hybrid_crossvalidated.rst).
    inter = _data["train"].tocoo()
    rng = np.random.RandomState(0)
    cold = rng.rand(inter.shape[1]) < 0.2
    is_cold = cold[inter.col]
    cold_train = sp.coo_matrix(
        (inter.data[~is_cold], (inter.row[~is_cold], inter.col[~is_cold])),
        shape=inter.shape,
    )
    cold_test = sp.coo_matrix(
        (inter.data[is_cold], (inter.row[is_cold], inter.col[is_cold])),
        shape=inter.shape,
    ).tocsr()
    feats = _data["item_genre_features"]

    cf = LightFM(loss="warp", random_state=SEED).fit(cold_train, epochs=10)
    cf_auc = auc_score(
        cf, cold_test, train_interactions=cold_train.tocsr()
    ).mean()

    hy = LightFM(loss="warp", random_state=SEED)
    hy.fit(cold_train, item_features=feats, epochs=10)
    hy_auc = auc_score(
        hy, cold_test, item_features=feats,
        train_interactions=cold_train.tocsr(),
    ).mean()

    assert hy_auc > cf_auc + 0.1
    assert hy_auc > 0.52
