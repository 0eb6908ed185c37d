"""Fast path x mesh composition (round-3 verdict #4).

The specialised pool/sorted-update path must engage under a device mesh
(replicated tables, replicated examples) and train data-parallel via
shard_map: forward/gradient work split over the 'data' axis, update
streams all-gathered, pool folds psum'd.  The applied update is the
single-chip update up to floating-point reduction order, so mesh runs
must match single-chip runs numerically (tight tolerance after one
epoch) and statistically (same AUC bar the fast path itself clears).

Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score
import lightfm_tpu.fast_warp as fw
from lightfm_tpu.parallel import make_mesh


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


@pytest.fixture(autouse=True)
def _force_fast_small_pool(monkeypatch):
    """Force eligibility on the CPU backend and shrink the pool so small
    test batches satisfy the shard-divisibility gate (local_B % P == 0)."""
    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "1")
    monkeypatch.setattr(fw, "POOL_SIZE", 512)


_KW = dict(no_components=64, random_state=10, batch_size=4096)


def test_mesh_fast_path_engages(planted):
    mesh = make_mesh(n_data=4, n_model=2)
    m = LightFM(loss="warp", mesh=mesh, **_KW)
    m.fit(planted, epochs=1)
    assert m._staged_fast == "einsum"

    # Disqualifiers: row-sharded tables, sharded examples, indivisible B.
    m2 = LightFM(loss="warp", mesh=mesh, table_partition="rows", **_KW)
    m2.fit(planted, epochs=0)
    assert not m2._staged_fast
    m3 = LightFM(loss="warp", mesh=mesh, shard_examples=True, **_KW)
    m3.fit(planted, epochs=0)
    assert not m3._staged_fast


@pytest.mark.parametrize("loss", ["warp", "bpr", "logistic"])
def test_mesh_fast_matches_single_chip_one_epoch(planted, loss):
    """Same seed, one epoch: mesh and single-chip runs apply the same
    updates (identical pool draws, identical shuffle; only fp reduction
    order differs in the psum'd pool folds)."""
    mesh = make_mesh(n_data=4, n_model=2)
    single = LightFM(loss=loss, **_KW).fit(planted, epochs=1)
    meshed = LightFM(loss=loss, mesh=mesh, **_KW).fit(planted, epochs=1)
    assert meshed._staged_fast == single._staged_fast == "einsum"
    for attr in ("item_table", "user_table", "item_acc", "user_acc"):
        a = np.asarray(getattr(single._state, attr))
        b = np.asarray(getattr(meshed._state, attr))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6, err_msg=attr)


def test_mesh_fast_statistical_quality(planted):
    """Multi-epoch mesh training clears the same AUC bar as single-chip
    fast training (reduction-order drift must not hurt learning)."""
    mesh = make_mesh(n_data=8, n_model=1)
    m = LightFM(loss="warp", mesh=mesh, **_KW).fit(planted, epochs=5)
    assert m._staged_fast == "einsum"
    auc = float(auc_score(m, planted.tocsr(), check_intersections=False).mean())
    assert auc > 0.95, auc


def test_mesh_fast_deterministic(planted):
    """Same seed, same mesh: bitwise-equal tables across runs."""
    mesh = make_mesh(n_data=4, n_model=2)
    runs = [
        np.asarray(
            LightFM(loss="warp", mesh=mesh, **_KW)
            .fit(planted, epochs=2)
            ._state.item_table
        )
        for _ in range(2)
    ]
    assert (runs[0] == runs[1]).all()
