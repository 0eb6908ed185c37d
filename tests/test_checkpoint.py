"""Checkpoint/resume tests: npz save/load must preserve predictions, RNG
stream, and fit/fit_partial semantics (the reference validates the same
contract over pickle, its test_movielens.py:387-412)."""

import numpy as np
import pytest

from lightfm_tpu import LightFM
from lightfm_tpu.checkpoint import load_model, save_model
from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.evaluation import auc_score

SEED = 10

_data = generate_synthetic(n_users=120, n_items=200, seed=4)
_train = _data["train"]


def test_save_load_roundtrip_predicts_identically(tmp_path):
    model = LightFM(loss="warp", no_components=8, random_state=SEED)
    model.fit(_train, epochs=3)
    path = str(tmp_path / "model.npz")
    save_model(model, path)
    clone = load_model(path)

    uid = np.arange(50, dtype=np.int32)
    iid = np.arange(50, dtype=np.int32)
    assert np.array_equal(model.predict(uid, iid), clone.predict(uid, iid))
    assert np.array_equal(model.item_embeddings, clone.item_embeddings)
    assert np.array_equal(
        model.user_embedding_gradients, clone.user_embedding_gradients
    )


def test_resume_matches_uninterrupted_run(tmp_path):
    # fit 2 epochs, checkpoint, resume 2 more == one 4-epoch run (same seed):
    # the RNG stream must survive serialization bit-exactly.
    full = LightFM(loss="warp", random_state=SEED).fit(_train, epochs=4)

    first = LightFM(loss="warp", random_state=SEED).fit(_train, epochs=2)
    path = str(tmp_path / "ckpt.npz")
    save_model(first, path)
    resumed = load_model(path)
    resumed.fit_partial(_train, epochs=2)

    assert np.array_equal(full.item_embeddings, resumed.item_embeddings)
    assert np.array_equal(full.user_embeddings, resumed.user_embeddings)


def test_loaded_model_fit_resets(tmp_path):
    model = LightFM(loss="warp", random_state=SEED).fit(_train, epochs=2)
    path = str(tmp_path / "m.npz")
    save_model(model, path)
    loaded = load_model(path)
    before = loaded.item_embeddings.copy()
    loaded.fit(_train, epochs=1)  # fit resets state
    assert not np.array_equal(before, loaded.item_embeddings)


def test_unfitted_model_roundtrip(tmp_path):
    model = LightFM(loss="bpr", no_components=7)
    path = str(tmp_path / "unfit.npz")
    save_model(model, path)
    loaded = load_model(path)
    assert loaded._state is None
    assert loaded.loss == "bpr"
    assert loaded.no_components == 7
    loaded.fit(_train, epochs=1)
    assert auc_score(loaded, _train.tocsr(), check_intersections=False).mean() > 0.4


def test_future_format_version_rejected(tmp_path):
    model = LightFM(random_state=SEED)
    path = str(tmp_path / "m.npz")
    save_model(model, path)
    import json

    data = dict(np.load(path))
    header = json.loads(bytes(data["_header"].tobytes()).decode())
    header["format_version"] = 999
    data["_header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **data)
    with pytest.raises(ValueError, match="newer than supported"):
        load_model(path)


def test_legacy_positional_pickle_migrates_scales():
    # Pre-log-space pickles stored six arrays + two LINEAR scales
    # positionally; loading must convert them to log space.
    import pickle

    model = LightFM(loss="warp", random_state=SEED).fit(_train, epochs=1)
    d = model.__getstate__()
    state = d["_state_np"]
    legacy = [state[n] for n in list(state)[:6]] + [
        np.float32(1.0),  # linear scale
        np.float32(1.0),
    ]
    d["_state_np"] = legacy
    clone = LightFM.__new__(LightFM)
    clone.__setstate__(d)
    assert float(clone._state.item_log_scale) == 0.0  # log(1.0)
    uid = np.arange(10, dtype=np.int32)
    assert np.array_equal(model.predict(uid, uid), clone.predict(uid, uid))


def test_v1_npz_checkpoint_migrates_scales(tmp_path):
    import json

    model = LightFM(loss="warp", random_state=SEED).fit(_train, epochs=1)
    path = str(tmp_path / "v1.npz")
    save_model(model, path)
    data = dict(np.load(path))
    # Rewrite as a v1 checkpoint: linear scale fields, version 1.
    header = json.loads(bytes(data["_header"].tobytes()).decode())
    header["format_version"] = 1
    data["_header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    for side in ("item", "user"):
        log = data.pop(f"state_{side}_log_scale")
        data[f"state_{side}_scale"] = np.exp(log)
    with open(path, "wb") as f:
        np.savez(f, **data)

    clone = load_model(path)
    uid = np.arange(10, dtype=np.int32)
    assert np.array_equal(model.predict(uid, uid), clone.predict(uid, uid))


def test_npz_roundtrip_preserves_serving_metadata(tmp_path):
    # A reloaded hybrid model must keep recommend()'s feature guards and
    # catalog size; without the header metadata it would silently build an
    # identity catalog over the feature table (wrong recommendations).
    import scipy.sparse as sp

    n_items = _train.shape[1]
    genre = sp.csr_matrix(
        (np.ones(n_items, np.float32),
         (np.arange(n_items), np.arange(n_items) % 7)), shape=(n_items, 7),
    )
    model = LightFM(loss="warp", no_components=8, random_state=SEED)
    model.fit(_train, item_features=genre, epochs=1)
    path = str(tmp_path / "hybrid.npz")
    save_model(model, path)
    clone = load_model(path)

    assert clone.n_items_ == model.n_items_
    assert clone.n_users_ == model.n_users_
    with pytest.raises(ValueError, match="item_features"):
        clone.recommend(np.arange(4), k=5)
    s, i = clone.recommend(np.arange(4), k=5, item_features=genre)
    assert i.shape == (4, 5)


def test_midfit_checkpoint_kill_and_resume(tmp_path):
    """SURVEY §5 failure recovery: a run checkpointed every N epochs and
    killed mid-fit must resume FROM DISK to the exact trajectory of an
    uninterrupted run (state + optimizer accumulators + RNG stream)."""
    path_full = str(tmp_path / "full.npz")
    full = LightFM(loss="warp", random_state=SEED)
    full.fit(
        _train, epochs=6,
        checkpoint_every_n_epochs=2, checkpoint_path=path_full,
    )

    # "Kill" after 4 of 6 epochs: run only the first two chunks...
    path_part = str(tmp_path / "part.npz")
    part = LightFM(loss="warp", random_state=SEED)
    part.fit(
        _train, epochs=4,
        checkpoint_every_n_epochs=2, checkpoint_path=path_part,
    )
    del part
    # ... then resume purely from the on-disk checkpoint.
    resumed = load_model(path_part)
    resumed.fit_partial(
        _train, epochs=2,
        checkpoint_every_n_epochs=2, checkpoint_path=path_part,
    )

    for name in ("item_table", "item_acc", "user_table", "user_acc"):
        assert np.array_equal(
            np.asarray(getattr(resumed._state, name)),
            np.asarray(getattr(full._state, name)),
        ), name
    # The final checkpoints on disk agree too (fit saves at fit end).
    a, b = load_model(path_part), load_model(path_full)
    assert np.array_equal(
        np.asarray(a._state.item_table), np.asarray(b._state.item_table)
    )
    # And the RNG streams are aligned for any FUTURE training.
    assert np.array_equal(
        a.random_state.randint(0, 1 << 30, 16),
        b.random_state.randint(0, 1 << 30, 16),
    )


def test_midfit_checkpoint_validation():
    m = LightFM(loss="warp", random_state=SEED)
    with pytest.raises(ValueError, match="checkpoint_path"):
        m.fit(_train, epochs=2, checkpoint_every_n_epochs=1)
    with pytest.raises(ValueError, match="must be >= 1"):
        m.fit(
            _train, epochs=2, checkpoint_every_n_epochs=0,
            checkpoint_path="/tmp/x.npz",
        )
