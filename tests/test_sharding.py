"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed tests (its only parallelism is OpenMP);
these validate the TPU-native replacements: data-parallel batches and
row-/component-sharded embedding tables under GSPMD.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.evaluation import auc_score
from lightfm_tpu.parallel import make_mesh


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _small_data():
    data = generate_synthetic(n_users=300, n_items=256, seed=3)
    train = data["train"].astype(np.float32)
    train.data = np.where(train.data >= 4, 1.0, -1.0).astype(np.float32)
    return train


@requires_8_devices
@pytest.mark.parametrize("partition", ["replicated", "rows", "components"])
def test_sharded_fit_trains(partition):
    mesh = make_mesh(n_data=4, n_model=2)
    train = _small_data()
    # 'components' splits the fused [emb | bias] column axis: width D+1 must
    # divide by the model-axis size (documented constraint).
    no_components = 15 if partition == "components" else 10
    model = LightFM(
        loss="warp",
        no_components=no_components,
        random_state=10,
        mesh=mesh,
        table_partition=partition,
    )
    model.fit(train, epochs=5)

    pos = train.tocsr().copy()
    pos.data[pos.data < 0] = 0.0
    pos.eliminate_zeros()
    auc = auc_score(model, pos).mean()
    assert auc > 0.8


@requires_8_devices
def test_sharded_matches_single_device():
    # Same seed: GSPMD partitioning must not change the math beyond float
    # reduction order.
    train = _small_data()
    ref = LightFM(loss="warp", random_state=10).fit(train, epochs=3)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded = LightFM(loss="warp", random_state=10, mesh=mesh).fit(train, epochs=3)

    assert np.allclose(ref.item_embeddings, sharded.item_embeddings, atol=1e-3)


@requires_8_devices
def test_state_sharding_layouts():
    from lightfm_tpu.parallel import shard_state
    from lightfm_tpu.state import init_state

    mesh = make_mesh(n_data=4, n_model=2)
    state = init_state(8, 256, 128, np.random.RandomState(0), adagrad=True)
    sharded = shard_state(state, mesh, "rows")
    # Row-sharded tables split the feature axis over the model axis.
    shard_shape = sharded.item_table.sharding.shard_shape(sharded.item_table.shape)
    assert shard_shape[0] == 256 // 2


@requires_8_devices
def test_example_sharded_training_matches_replicated():
    # Pod-scale input layout: the packed example block split over the data
    # axis. GSPMD must produce the same math as replicated examples.
    train = _small_data()
    mesh = make_mesh(n_data=8, n_model=1)
    rep = LightFM(loss="warp", random_state=10, mesh=mesh).fit(train, epochs=2)
    shd = LightFM(
        loss="warp", random_state=10, mesh=mesh, shard_examples=True
    ).fit(train, epochs=2)
    assert np.allclose(rep.item_embeddings, shd.item_embeddings, atol=1e-3)


@requires_8_devices
def test_combined_example_and_table_sharding():
    # The pod layout: examples sharded over the data axis AND tables
    # row-sharded over the model axis, in ONE fit (previously only covered
    # separately).
    train = _small_data()
    mesh = make_mesh(n_data=4, n_model=2)
    model = LightFM(
        loss="warp", random_state=10, mesh=mesh,
        table_partition="rows", shard_examples=True,
    )
    model.fit(train, epochs=3)
    pos = train.tocsr().copy()
    pos.data[pos.data < 0] = 0.0
    pos.eliminate_zeros()
    assert auc_score(model, pos).mean() > 0.8


@requires_8_devices
def test_local_shuffle_trains():
    # Host-local per-epoch shuffles (stratified batches, no shuffle
    # exchange) must reach the same quality class as the global
    # permutation; every example is still visited once per epoch.
    train = _small_data()
    mesh = make_mesh(n_data=4, n_model=2)
    model = LightFM(
        loss="warp", random_state=10, mesh=mesh, batch_size=512,
        table_partition="rows", shard_examples=True, example_shuffle="local",
    )
    model.fit(train, epochs=5)
    pos = train.tocsr().copy()
    pos.data[pos.data < 0] = 0.0
    pos.eliminate_zeros()
    assert auc_score(model, pos).mean() > 0.8


@requires_8_devices
def test_local_shuffle_visits_every_example_once():
    # Property check on the shuffle itself: a local shuffle is a
    # permutation of the packed block (per epoch, no example dropped or
    # duplicated).
    import jax.numpy as jnp
    from lightfm_tpu.train import _shuffle_local

    mesh = make_mesh(n_data=8, n_model=1)
    n, B = 4096, 512
    packed = np.zeros((8, n), dtype=np.int32)
    packed[0] = np.arange(n)
    with mesh:
        out = _shuffle_local(
            jnp.asarray(packed), jax.random.key(0), n // B, B, mesh
        )
    ids = np.asarray(out)[:, 0, :].ravel()
    assert sorted(ids.tolist()) == list(range(n))


@requires_8_devices
def test_build_local_train_data_single_process():
    # Single-process exercise of the per-host ingestion path: the packed
    # block must come out sharded over the data axis and train correctly
    # when driven through run_epochs.
    import jax.numpy as jnp

    from lightfm_tpu.config import Hyperparams
    from lightfm_tpu.parallel import build_local_train_data, shard_state
    from lightfm_tpu.sparse import identity_rows
    from lightfm_tpu.state import init_state
    from lightfm_tpu.train import run_epochs

    train = _small_data().tocoo()
    mesh = make_mesh(n_data=8, n_model=1)
    hp = Hyperparams(no_components=10, loss="warp", batch_size=512)
    data = build_local_train_data(
        train, None,
        identity_rows(train.shape[0]), identity_rows(train.shape[1]),
        hp, 512, mesh, n_examples_global=train.nnz,
    )
    spec = data.packed.sharding.spec
    assert spec == (None, "data") or tuple(spec) == (None, "data")

    rng = np.random.RandomState(10)
    state = shard_state(
        init_state(10, train.shape[1], train.shape[0], rng, adagrad=True),
        mesh, "replicated",
    )
    seeds = rng.randint(0, 2**31 - 1, size=3).astype(np.uint32)
    state = run_epochs(
        state, data, jnp.asarray(seeds), hp, 512, mesh=mesh, shuffle="local"
    )
    table = np.asarray(state.item_table)
    assert np.all(np.isfinite(table))
    # training moved the table away from its init
    init = np.asarray(init_state(10, train.shape[1], train.shape[0],
                                 np.random.RandomState(10), adagrad=True).item_table)
    assert np.abs(table - init).max() > 1e-3


@requires_8_devices
def test_row_sharding_with_indivisible_tables():
    # 943 users is not divisible by model=2: the user table must fall back
    # to replication (with a warning) while the divisible item table stays
    # row-sharded, and the fit must still train.
    import warnings

    data = generate_synthetic(n_users=943, n_items=256, seed=6)
    train = data["train"].astype(np.float32)
    train.data = np.where(train.data >= 4, 1.0, -1.0).astype(np.float32)
    mesh = make_mesh(n_data=4, n_model=2)
    model = LightFM(
        loss="warp", no_components=10, random_state=10,
        mesh=mesh, table_partition="rows",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        model.fit(train, epochs=3)
    assert any("not divisible" in str(x.message) for x in w)
    pos = train.tocsr().copy()
    pos.data[pos.data < 0] = 0.0
    pos.eliminate_zeros()
    assert auc_score(model, pos).mean() > 0.75


@requires_8_devices
def test_auto_table_partition_resolution(monkeypatch):
    """table_partition="auto" (design.md "Layout decision"): replicated
    while the state fits the per-device budget, rows beyond it."""
    mesh = make_mesh(n_data=4, n_model=2)
    train = _small_data()

    m = LightFM(loss="warp", random_state=10, mesh=mesh,
                table_partition="auto")
    m.fit(train, epochs=1)
    assert m._resolve_table_partition() == "replicated"

    monkeypatch.setenv("LIGHTFM_TPU_REPLICATED_TABLE_BUDGET", "1024")
    m2 = LightFM(loss="warp", random_state=10, mesh=mesh,
                 table_partition="auto")
    m2.fit(train, epochs=1)
    assert m2._resolve_table_partition() == "rows"
    assert np.all(np.isfinite(np.asarray(m2.item_embeddings)))

    # Without a mesh "auto" is just replicated (single-device semantics).
    m3 = LightFM(loss="warp", random_state=10, table_partition="auto")
    assert m3._resolve_table_partition() == "replicated"
