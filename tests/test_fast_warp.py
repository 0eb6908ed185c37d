"""Tests for the specialised WARP fast path (lightfm_tpu.fast_warp).

The fast path must (1) fire exactly for its gated configuration, (2) keep
the epoch shuffle a true permutation with item-sorted batches and a
consistent user-sort/sigma, and (3) train to the same statistical quality
as the generic `losses.warp_step` path on planted-structure data — the
same bar the reference applies to its Hogwild parallelism
(`tests/test_movielens.py:536-546`).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score
import lightfm_tpu.fast_warp as fw
from lightfm_tpu.train import build_train_data, run_epochs


def _planted(nu=1500, ni=8000, per_user=30, d=16, seed=7):
    rng = np.random.RandomState(seed)
    U = rng.randn(nu, d)
    V = rng.randn(ni, d)
    top = np.argsort(-(U @ V.T), axis=1)[:, :per_user]
    rows = np.repeat(np.arange(nu), per_user)
    cols = top.ravel()
    return sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(nu, ni)
    )


@pytest.fixture(scope="module")
def planted():
    return _planted()


def _tag_feats(ni, n_tags=300, per_item=3):
    """Identity + ``per_item`` distinct tag columns per item (the hybrid
    genre/tag shape; deterministic so padded widths are exact)."""
    rows = np.repeat(np.arange(ni), per_item)
    cols = (rows + np.tile(np.arange(per_item), ni) * 37) % n_tags
    tags = sp.coo_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)), shape=(ni, n_tags)
    ).tocsr()
    return sp.hstack(
        [sp.identity(ni, dtype=np.float32, format="csr"), tags], format="csr"
    )


@pytest.fixture(autouse=True)
def _force_fast_path(monkeypatch):
    """Eligibility defaults to TPU backends only; force it on so the CPU
    suite exercises the fast path through the public fit API (the env var
    overrides every model's fast_path knob at fit time)."""
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "1")


def test_eligibility_gate(planted):
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=1)
    assert m._staged_fast  # big identity/adagrad/alpha-0 config -> fast

    # Logistic is eligible too (sorted updates only — no sampling).
    m_log = LightFM(loss="logistic", no_components=64, random_state=10)
    m_log.fit(planted, epochs=0)
    assert m_log._staged_fast

    # Each disqualifier must kill the gate.
    for kw in (
        dict(loss="warp-kos"),
        dict(learning_schedule="adadelta"),
        dict(item_alpha=1e-5),
        dict(user_alpha=1e-5),
        dict(no_components=4),  # table under MIN_TABLE_ELEMS
    ):
        m2 = LightFM(
            **{**dict(loss="warp", no_components=64, random_state=10), **kw}
        )
        m2.fit(planted, epochs=0)
        assert not m2._staged_fast, kw

    # Hybrid: narrow explicit feature matrices (the genre/tag case) are
    # eligible for the pairwise losses...
    m3 = LightFM(loss="warp", no_components=64, random_state=10)
    m3.fit(planted, epochs=0, item_features=_tag_feats(8000))
    assert m3._staged_fast

    # ... but wide rows (> MAX_FAST_FEAT_NNZ) stay on the generic/chunked
    # path, and logistic (whose fast path is ONLY the identity-touch
    # sorted-update kernel) rejects features entirely.
    wide = _tag_feats(8000, per_item=fw.MAX_FAST_FEAT_NNZ + 1)
    m4 = LightFM(loss="warp", no_components=64, random_state=10)
    m4.fit(planted, epochs=0, item_features=wide)
    assert not m4._staged_fast

    m5 = LightFM(loss="logistic", no_components=64, random_state=10)
    m5.fit(planted, epochs=0, item_features=_tag_feats(8000))
    assert not m5._staged_fast


def test_shuffle_item_sorted_invariants():
    rng = np.random.RandomState(0)
    n, B = 4096, 512
    n_batches = n // B
    users = rng.randint(0, 300, n).astype(np.int32)
    items = rng.randint(0, 500, n).astype(np.int32)
    packed = np.zeros((8, n), dtype=np.int32)
    packed[0] = users
    packed[1] = items
    packed[2] = np.arange(n)  # unique tag to track the permutation
    packed[3] = 7
    packed[4] = 1
    shuffled, suid, sigma = jax.jit(
        fw.shuffle_item_sorted, static_argnums=(2, 3)
    )(jnp.asarray(packed), jax.random.key(3), n_batches, B)
    # The packed-u32-key formulation (engaged when id bits fit) must be
    # BITWISE identical to the two-key sorts (lax.sort is stable and equal
    # packed keys are exactly equal key pairs).
    p_sh, p_su, p_sg = jax.jit(
        fw.shuffle_item_sorted, static_argnums=(2, 3, 4, 5, 6)
    )(jnp.asarray(packed), jax.random.key(3), n_batches, B, "feistel", 300, 500)
    assert np.array_equal(np.asarray(p_sh), np.asarray(shuffled))
    assert np.array_equal(np.asarray(p_su), np.asarray(suid))
    assert np.array_equal(np.asarray(p_sg), np.asarray(sigma))
    shuffled = np.asarray(shuffled)
    suid = np.asarray(suid)
    sigma = np.asarray(sigma)

    # Every example appears exactly once (tags are a permutation).
    assert sorted(shuffled[:, 2, :].ravel().tolist()) == list(range(n))
    for b in range(n_batches):
        ib = shuffled[b, 1, :]
        ub = shuffled[b, 0, :]
        tag = shuffled[b, 2, :]
        # batches item-sorted; tag/user consistent with the original arrays
        assert (np.diff(ib) >= 0).all()
        assert (items[tag] == ib).all()
        assert (users[tag] == ub).all()
        # user-sort metadata: suid ascending and sigma maps into the batch
        assert (np.diff(suid[b]) >= 0).all()
        assert sorted(sigma[b].tolist()) == list(range(B))
        assert (ub[sigma[b]] == suid[b]).all()


def test_feistel_batch_assignment_exact_balance():
    """Regression: the Feistel round function must be reduced into its
    radix BEFORE the modular addition.  The unfixed form
    ``(q + hash) % Q`` wraps mod 2^32 when q + hash overflows, breaking
    the bijection — at the production shape (Q=131072, R=39) a bad key
    appears within a few hundred draws and yields batch counts like
    131074/131071, which violates the sorted-update kernel's
    NON-DECREASING precondition downstream.  Exact balance must hold for
    EVERY key at the production shape."""
    n_batches, batch_size = 39, 131072
    n = n_batches * batch_size
    fn = jax.jit(fw._feistel_batch_of, static_argnums=(0, 1))
    # Seeds 410/1554/2204 make the UNFIXED formula wrap (an r-round hash
    # lands within 38 of 2^32), producing counts 131071/131073; the fixed
    # formula must be exactly balanced for them and for arbitrary seeds.
    for seed in (410, 1554, 2204, 0, 1, 2, 3):
        assign = np.asarray(fn(n, n_batches, jax.random.key(seed)))
        counts = np.bincount(assign, minlength=n_batches)
        assert (counts == batch_size).all(), (seed, counts.min(), counts.max())


def test_fast_matches_generic_statistically(planted):
    """Same data, same seeds: fast=True vs fast=False epochs land within a
    small AUC margin (pool negatives + sorted updates are statistically
    equivalent to per-example draws + XLA scatters)."""
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=0)  # initialise state + staging
    data = m._staged_train_data
    hp, bs = m._staged_hp, m._staged_batch_size
    seeds = jnp.arange(5, dtype=jnp.uint32)

    init = m._state
    train_csr = planted.tocsr()

    aucs = {}
    for fast in (False, True):
        m._state = run_epochs(init, data, seeds, hp, bs, fast=fast)
        aucs[fast] = float(auc_score(m, train_csr).mean())
    assert aucs[True] > 0.95, aucs
    assert aucs[True] > aucs[False] - 0.02, aucs


def test_fast_path_deterministic(planted):
    runs = []
    for _ in range(2):
        m = LightFM(loss="warp", no_components=64, random_state=42)
        m.fit(planted, epochs=2)
        assert m._staged_fast
        runs.append(np.asarray(m._state.item_table))
    assert (runs[0] == runs[1]).all()


def test_fast_step_invalid_rows_are_noops(planted):
    """Padding rows (valid=0) and y<=0 rows must leave tables untouched:
    run one epoch on data whose examples are ALL invalid."""
    coo = planted.copy()
    coo.data = -np.ones_like(coo.data)  # y <= 0 -> warp skips (template:831)
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(coo, epochs=0)
    data = m._staged_train_data
    hp, bs = m._staged_hp, m._staged_batch_size
    before = m._state
    after = run_epochs(before, data, jnp.arange(1, dtype=jnp.uint32), hp, bs, fast=True)
    assert (np.asarray(after.item_table) == np.asarray(before.item_table)).all()
    assert (np.asarray(after.user_table) == np.asarray(before.user_table)).all()
    assert (np.asarray(after.item_acc) == np.asarray(before.item_acc)).all()


def test_bpr_fast_matches_generic_statistically(planted):
    m = LightFM(loss="bpr", no_components=64, random_state=10)
    m.fit(planted, epochs=0)
    data = m._staged_train_data
    hp, bs = m._staged_hp, m._staged_batch_size
    # BPR's sigmoid loss needs more epochs than WARP on this data (both
    # paths sit at ~0.5 after 5); at 20 both reach ~0.99.
    seeds = jnp.arange(20, dtype=jnp.uint32)
    init = m._state
    train_csr = planted.tocsr()
    aucs = {}
    for fast in (False, True):
        m._state = run_epochs(init, data, seeds, hp, bs, fast=fast)
        aucs[fast] = float(auc_score(m, train_csr).mean())
    assert aucs[True] > 0.95, aucs
    assert aucs[True] > aucs[False] - 0.02, aucs


def test_logistic_fast_matches_generic_statistically():
    """Logistic fast path (sorted updates, no sampling) lands at the same
    statistical quality as the generic path on signed planted data."""
    rng = np.random.RandomState(3)
    nu, ni, per, d = 1500, 8000, 30, 16
    U, V = rng.randn(nu, d), rng.randn(ni, d)
    top = np.argsort(-(U @ V.T), axis=1)[:, :per]
    rows = np.repeat(np.arange(nu), 2 * per)
    # Half in-preference (+1), half random (-1): logistic needs negatives.
    neg = rng.randint(0, ni, (nu, per))
    cols = np.concatenate([top, neg], axis=1).ravel()
    vals = np.tile(
        np.concatenate([np.ones(per), -np.ones(per)]).astype(np.float32), nu
    )
    coo = sp.coo_matrix((vals, (rows, cols)), shape=(nu, ni))
    coo.sum_duplicates()
    coo.data = np.sign(coo.data).astype(np.float32)
    coo.eliminate_zeros()
    pos = coo.tocsr().copy()
    pos.data = np.where(pos.data > 0, pos.data, 0)
    pos.eliminate_zeros()

    m = LightFM(loss="logistic", no_components=64, random_state=10)
    m.fit(coo, epochs=0)
    data, hp, bs = m._staged_train_data, m._staged_hp, m._staged_batch_size
    seeds = jnp.arange(10, dtype=jnp.uint32)
    init = m._state
    aucs = {}
    for fast in (False, True):
        m._state = run_epochs(init, data, seeds, hp, bs, fast=fast)
        aucs[fast] = float(auc_score(m, pos).mean())
    # 10 sigmoid epochs reach ~0.85 on this data (both paths agree to float
    # noise: they share batch membership, and in-batch updates commute).
    assert aucs[True] > 0.8, aucs
    assert aucs[True] > aucs[False] - 0.02, aucs


def test_fast_path_zero_sample_weights_are_noops(planted):
    """All-zero sample weights make every update an exact no-op on the fast
    path (the reference's zero-weight contract, test_movielens.py:517-533)."""
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=0)
    before = m._state
    zero_w = planted.copy()
    zero_w.data = np.zeros_like(zero_w.data)
    m.fit_partial(planted, sample_weight=zero_w.tocoo(), epochs=2)
    assert m._staged_fast
    assert np.array_equal(np.asarray(m._state.item_table), np.asarray(before.item_table))
    assert np.array_equal(np.asarray(m._state.user_table), np.asarray(before.user_table))


def test_fast_knobs_per_model_in_one_process(planted, monkeypatch):
    """The fast-path knobs are per-model hyperparameters: two models with
    different pool/shuffle modes A/B in ONE process (round-3 verdict #5 —
    previously impossible: the knobs were frozen at import from env)."""
    # "kernels" is a deprecated alias since the round-5 A/B removed the
    # Pallas pool kernels: it must still construct/fit (old checkpoints
    # carry it) but resolves to the einsum mode with a warning.
    import warnings

    mk = LightFM(loss="warp", no_components=64, random_state=10,
                 pool_kernels="kernels")
    me = LightFM(loss="warp", no_components=64, random_state=10,
                 pool_kernels="einsum")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mk.fit(planted, epochs=1)
    assert any("removed" in str(x.message) for x in w)
    me.fit(planted, epochs=1)
    assert mk._staged_fast == "einsum"
    assert me._staged_fast == "einsum"

    ms = LightFM(loss="warp", no_components=64, random_state=10,
                 shuffle_mode="sort", user_pallas=False,
                 fast_precision="highest")
    ms.fit(planted, epochs=1)
    assert ms._staged_fast  # trains fine with every knob flipped
    assert ms._staged_hp.shuffle_mode == "sort"
    assert ms._staged_hp.user_pallas is False
    assert ms._staged_hp.fast_precision == "highest"

    # Env vars override per-model values at FIT time (process-wide A/B);
    # the deprecated kernels alias resolves to einsum here too.
    monkeypatch.setenv("LIGHTFM_TPU_POOL_KERNELS", "1")
    me2 = LightFM(loss="warp", no_components=64, random_state=10,
                  pool_kernels="einsum")
    me2.fit(planted, epochs=1)
    assert me2._staged_fast == "einsum"
    # get_params still reports the constructor value (sklearn semantics).
    assert me2.get_params()["pool_kernels"] == "einsum"


def test_fast_knobs_round_trip_params_pickle_checkpoint(tmp_path):
    """All five knobs appear in get_params, survive pickling, and round-trip
    through checkpoint.save_model/load_model."""
    import pickle

    from lightfm_tpu.checkpoint import load_model, save_model

    kw = dict(fast_path="on", pool_kernels="kernels", user_pallas=False,
              fast_precision="highest", shuffle_mode="sort")
    m = LightFM(loss="warp", random_state=10, **kw)
    for k, v in kw.items():
        assert m.get_params()[k] == v, k

    m2 = pickle.loads(pickle.dumps(m))
    for k, v in kw.items():
        assert getattr(m2, k) == v, k

    path = str(tmp_path / "ckpt.npz")
    save_model(m, path)
    m3 = load_model(path)
    for k, v in kw.items():
        assert getattr(m3, k) == v, k

    # Invalid values are rejected at construction (Hyperparams asserts).
    for bad in (dict(fast_path="yes"), dict(pool_kernels="pallas"),
                dict(fast_precision="bf16"), dict(shuffle_mode="random")):
        with pytest.raises(ValueError):
            LightFM(loss="warp", **bad)


def test_run_epochs_single_executable_across_bindings(planted):
    """Every calling convention of run_epochs must hit ONE jit cache entry.

    jax.jit keys its tracing cache on the argument BINDING, not just the
    values: kwargs-vs-defaults (fit vs the bench/tools call style) used to
    compile two executables of the same program, and dispatching a second
    distinct fast-epoch executable intermittently poisons the v5e TPU
    client (the BENCH_r03 failure class).  The plain-Python wrappers in
    train.py canonicalise the binding; this pins that contract."""
    from lightfm_tpu.train import _run_epochs_jit, run_epochs

    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=2)  # fit's own call style
    data, hp, bs = m._staged_train_data, m._staged_hp, m._staged_batch_size
    fast = m._staged_fast
    # Other tests (and fit above) legitimately populate entries for OTHER
    # configs; the contract is that these call styles add NONE beyond
    # fit's own.  fit used epoch-count 2, so seeds must be length 2 here
    # (a different scan length is a genuinely different program).
    seeds = jnp.arange(2, dtype=jnp.uint32)
    base = _run_epochs_jit._cache_size()  # right after fit's own call
    run_epochs(m._state, data, seeds, hp, bs, fast=fast)  # defaults
    assert _run_epochs_jit._cache_size() == base  # fit vs bare: one entry
    run_epochs(
        m._state, data, seeds, hp, bs, mesh=None, shuffle="global", fast=fast
    )  # explicit kwargs
    # A fresh-but-equal Hyperparams (what a new model / checkpoint reload
    # produces) must also hit the same entry.
    run_epochs(
        m._state, data, seeds, fw.apply_env_overrides(m._hp()), bs, fast=fast
    )
    assert _run_epochs_jit._cache_size() == base


def test_env_override_value_parsing(monkeypatch):
    """Empty env values mean UNSET; bool vars accept the usual synonyms
    and REJECT anything else (a silently-truthy 'false' string would
    invert the request)."""
    for var in ("LIGHTFM_TPU_FAST_WARP", "LIGHTFM_TPU_POOL_KERNELS",
                "LIGHTFM_TPU_FAST_WARP_USER_PALLAS",
                "LIGHTFM_TPU_FAST_WARP_PRECISION",
                "LIGHTFM_TPU_FAST_SHUFFLE"):
        monkeypatch.setenv(var, "")  # blanked vars override nothing
    assert fw.env_override_fields() == {}

    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP_USER_PALLAS", "false")
    assert fw.env_override_fields() == {"user_pallas": False}
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP_USER_PALLAS", "ON")
    assert fw.env_override_fields() == {"user_pallas": True}
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP_USER_PALLAS", "maybe")
    with pytest.raises(ValueError, match="USER_PALLAS"):
        fw.env_override_fields()
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP_USER_PALLAS", "")

    # Enum fields: legacy 1/0 aliases map; junk values surface through
    # Hyperparams validation at fit time rather than silently training.
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "0")
    assert fw.env_override_fields() == {"fast_path": "off"}
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "sometimes")
    with pytest.raises(ValueError, match="fast_path"):
        fw.apply_env_overrides(LightFM(loss="warp", random_state=1)._hp())


def test_bpr_eligibility(planted):
    m = LightFM(loss="bpr", no_components=64, random_state=10)
    m.fit(planted, epochs=1)
    assert m._staged_fast

    # Hybrid BPR is eligible too (same pool machinery).
    m2 = LightFM(loss="bpr", no_components=64, random_state=10)
    m2.fit(planted, epochs=0, item_features=_tag_feats(8000))
    assert m2._staged_fast


def test_hybrid_fast_matches_generic_statistically(planted):
    """WARP with explicit item features: the hybrid fast path (pool
    negatives + feature-expanded scatter updates) must train to the same
    quality as the generic `losses.warp_step` path."""
    feats = _tag_feats(8000)
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=0, item_features=feats)
    assert m._staged_fast
    data = m._staged_train_data
    # the aggregated (scatter-free) update must engage at this size
    assert data.item_feats_T is not None
    assert data.user_feats_T is None  # identity users
    hp, bs = m._staged_hp, m._staged_batch_size
    seeds = jnp.arange(5, dtype=jnp.uint32)
    init = m._state
    train_csr = planted.tocsr()
    aucs = {}
    for fast in (False, True):
        m._state = run_epochs(init, data, seeds, hp, bs, fast=fast)
        aucs[fast] = float(
            auc_score(m, train_csr, item_features=feats).mean()
        )
    assert aucs[True] > 0.9, aucs
    assert aucs[True] > aucs[False] - 0.02, aucs


def test_hybrid_user_features_fast_path(planted):
    """User-side features route through `_feature_update` as well; the
    transposed planted problem checks that side trains too."""
    feats = _tag_feats(1500)
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=0, user_features=feats)
    # user table: 1800 features x 72 < MIN_TABLE_ELEMS is fine — the gate
    # keys on the ITEM table (8000 x 72); user features just must be narrow.
    assert m._staged_fast
    m.fit(planted, epochs=5, user_features=feats)
    auc = float(auc_score(m, planted.tocsr(), user_features=feats).mean())
    assert auc > 0.9, auc


def test_hybrid_fast_invalid_rows_are_noops(planted):
    """All-masked epochs must leave tables untouched through the hybrid
    update path (padding slots and y<=0 examples are exact no-ops)."""
    feats = _tag_feats(8000)
    coo = planted.copy()
    coo.data = -np.ones_like(coo.data)
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(coo, epochs=0, item_features=feats)
    assert m._staged_fast
    data = m._staged_train_data
    hp, bs = m._staged_hp, m._staged_batch_size
    before = m._state
    after = run_epochs(
        before, data, jnp.arange(1, dtype=jnp.uint32), hp, bs, fast=True
    )
    for name in ("item_table", "user_table", "item_acc", "user_acc"):
        assert (
            np.asarray(getattr(after, name))
            == np.asarray(getattr(before, name))
        ).all(), name



def test_transposed_feature_sums_exact():
    """_transposed_feature_sums == the expanded per-touch sums, exactly
    (it replaces `_feature_update`'s scatters on the hybrid fast path)."""
    rng = np.random.RandomState(0)
    n_items, n_feats, W = 50, 37, 8
    feats = sp.random(
        n_items, n_feats, density=0.15, random_state=1, format="csr",
        dtype=np.float32,
    )
    feats.data = rng.rand(feats.nnz).astype(np.float32) + 0.5
    G1 = rng.randn(n_items, W).astype(np.float32)
    G2 = rng.randn(n_items, W).astype(np.float32)

    from lightfm_tpu.model import LightFM as _L
    feats_T = _L._pad_features(feats.T.tocsr())
    S = np.asarray(
        fw._transposed_feature_sums(
            feats_T, jnp.asarray(np.concatenate([G1, G2], axis=1)),
            block=16,
        )
    )
    dense = feats.toarray()  # [n_items, n_feats]
    want1 = dense.T @ G1
    want2 = (dense * dense).T @ G2
    np.testing.assert_allclose(S[:, :W], want1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(S[:, W:], want2, rtol=1e-5, atol=1e-6)


def test_hybrid_aggregated_matches_scatter_update(planted):
    """Training with the aggregated transposed-walk update must land at
    the same quality as the expanded-touch scatter formulation (same
    seeds; the only semantic delta is the pool touches' accumulator
    staleness, which is the batching class already validated)."""
    feats = _tag_feats(8000)
    m = LightFM(loss="warp", no_components=64, random_state=10)
    m.fit(planted, epochs=0, item_features=feats)
    data = m._staged_train_data
    assert data.item_feats_T is not None
    hp, bs = m._staged_hp, m._staged_batch_size
    seeds = jnp.arange(5, dtype=jnp.uint32)
    init = m._state
    train_csr = planted.tocsr()
    aucs = {}
    for label, d in (
        ("aggregated", data),
        ("scatter", data._replace(item_feats_T=None, user_feats_T=None)),
    ):
        m._state = run_epochs(init, d, seeds, hp, bs, fast="einsum")
        aucs[label] = float(auc_score(m, train_csr, item_features=feats).mean())
    assert aucs["aggregated"] > 0.9, aucs
    assert abs(aucs["aggregated"] - aucs["scatter"]) < 0.02, aucs


def test_transposed_feats_tiered_exact():
    """The thin/fat-tiered TransposedFeats walk (dense MXU fat tier) must
    match the dense reference exactly at f32 and engage the fat tier."""
    rng = np.random.RandomState(1)
    n_items, n_feats, W = 60, 30, 8
    dense_f = np.zeros((n_items, n_feats), np.float32)
    # thin columns (1-2 entities) + two fat columns covering most entities
    for f in range(n_feats - 2):
        dense_f[rng.randint(0, n_items, 2), f] = 1.0
    dense_f[: n_items - 5, n_feats - 2] = 1.0
    dense_f[5:, n_feats - 1] = 1.0
    csr = sp.csr_matrix(dense_f)

    m = LightFM(loss="warp", fast_precision="highest")
    fT = m._build_transposed(csr, "highest")
    assert isinstance(fT, fw.TransposedFeats) and fT.fat_rows is not None
    assert fT.fat_w.dtype == jnp.float32

    G1 = rng.randn(n_items, W).astype(np.float32)
    G2 = rng.randn(n_items, W).astype(np.float32)
    S = np.asarray(
        fw._transposed_feature_sums(
            fT, jnp.asarray(np.concatenate([G1, G2], axis=1)), block=16
        )
    )
    np.testing.assert_allclose(S[:, :W], dense_f.T @ G1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        S[:, W:], (dense_f * dense_f).T @ G2, rtol=1e-5, atol=1e-5
    )

    # binary weights + default precision share one bf16 fat matrix
    m2 = LightFM(loss="warp")  # fast_precision="default"
    fT2 = m2._build_transposed(csr, "default")
    assert fT2.fat_w.dtype == jnp.bfloat16
    assert fT2.fat_w2 is fT2.fat_w


def test_transposed_build_nonbinary_weights_within_budget(monkeypatch):
    """Weights of 2.0 (duplicate tag entries) force a separate squared
    matrix; the budget math must count both matrices at the ACTUAL dtype
    and still admit the production-shaped case (regression: a 768MB gate
    silently dropped the bench's 2x409MB bf16 pair back to the 2.6x-slower
    scatter path)."""
    rng = np.random.RandomState(0)
    n_items, n_tags = 400, 16
    rows = np.repeat(np.arange(n_items), 3)
    cols = rng.randint(0, n_tags, rows.size)
    tags = sp.coo_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)), shape=(n_items, n_tags)
    ).tocsr()  # duplicate (row, col) pairs sum to 2.0
    assert tags.data.max() >= 2.0  # duplicate entries summed
    feats = sp.hstack(
        [sp.identity(n_items, dtype=np.float32, format="csr"), tags],
        format="csr",
    )
    m = LightFM(loss="warp")
    t = m._build_transposed(feats, "default")
    assert isinstance(t, fw.TransposedFeats) and t.fat_rows is not None
    assert t.fat_w2 is not t.fat_w  # 2.0 weights: separate squared matrix
    assert t.fat_w.dtype == jnp.bfloat16  # 2.0/4.0 are bf16-exact

    # Over-budget matrices fall back to None (the scatter path), never to
    # the slower chunked gather walk.
    monkeypatch.setenv("LIGHTFM_TPU_FAT_TIER_BYTES", "64")
    assert m._build_transposed(feats, "default") is None
