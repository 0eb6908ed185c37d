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
