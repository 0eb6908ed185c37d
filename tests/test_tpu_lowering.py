"""Cross-platform TPU lowering guards.

`jax.export` with ``platforms=["tpu"]`` runs the Pallas->Mosaic lowering
(where unsupported ops, layout, and block-spec errors surface) without TPU
hardware, so kernel regressions are caught by the CPU suite instead of at
first contact with a device.  The final Mosaic machine-code compile still
happens on-device; these tests guard everything before it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

try:
    from jax import export
except ImportError:  # pragma: no cover - older jax
    export = None

pytestmark = pytest.mark.skipif(export is None, reason="jax.export unavailable")


def _export_tpu(fn, *args):
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


def test_sorted_update_kernel_lowers_for_tpu():
    from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas

    R, W, M = 100_000, 72, 131072
    table = jnp.zeros((R, W), jnp.float32)
    acc = jnp.ones((R, W), jnp.float32)
    sidx = jnp.zeros((M,), jnp.int32)
    swg = jnp.zeros((M, W), jnp.float32)
    _export_tpu(
        lambda t, a, i, g: sorted_adagrad_update_pallas(
            t, a, i, g, learning_rate=0.05
        ),
        table, acc, sidx, swg,
    )


@pytest.mark.parametrize(
    "loss,mode",
    [("warp", "einsum"), ("warp", "kernels"), ("bpr", "kernels"),
     ("logistic", "einsum")],
)
def test_composed_fast_epoch_lowers_for_tpu(loss, mode, monkeypatch):
    """The full scanned epoch (shuffle sorts + steps + Pallas kernels) must
    lower for TPU in every fast mode and eligible loss."""
    import scipy.sparse as sp

    from lightfm_tpu import LightFM
    from lightfm_tpu.train import run_epochs

    monkeypatch.setenv("LIGHTFM_TPU_FAST_WARP", "1")
    rng = np.random.RandomState(0)
    nnz, n_users, n_items = 32768, 4000, 8192
    coo = sp.coo_matrix(
        (
            np.ones(nnz, np.float32),
            (rng.randint(0, n_users, nnz), rng.randint(0, n_items, nnz)),
        ),
        shape=(n_users, n_items),
    )
    m = LightFM(loss=loss, no_components=64, random_state=10, batch_size=16384)
    m.fit(coo, epochs=0)
    assert m._staged_fast  # eligible at this table size
    data, hp, bs = m._staged_train_data, m._staged_hp, m._staged_batch_size
    seeds = jnp.arange(1, dtype=jnp.uint32)
    _export_tpu(
        lambda st, d, s: run_epochs(st, d, s, hp, bs, fast=mode),
        m._state, data, seeds,
    )
