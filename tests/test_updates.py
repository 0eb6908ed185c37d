"""Differential unit tests of the batched sparse optimizer update against a
literal sequential implementation of the reference math
(`_lightfm_fast.pyx.template:337-451`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lightfm_tpu.ops.updates import sparse_update


def _sequential_adagrad(table, acc, idx, w, g, lr, alpha):
    table, acc = table.copy(), acc.copy()
    pre_acc = acc.copy()  # batched semantics: local lr reads pre-batch acc
    for m in range(len(idx)):
        f = idx[m]
        lr_local = lr / np.sqrt(pre_acc[f])
        table[f] -= lr_local * w[m] * g[m]
        acc[f] += (w[m] * g[m]) ** 2
    for m in range(len(idx)):
        f = idx[m]
        lr_local = lr / np.sqrt(pre_acc[f])
        table[f] *= 1.0 + alpha * lr_local
    return table, acc


@pytest.mark.parametrize("alpha", [0.0, 0.1])
def test_adagrad_matches_sequential_no_duplicates(alpha):
    rng = np.random.RandomState(0)
    R, D, M = 20, 4, 8
    table = rng.randn(R, D).astype(np.float32)
    acc = np.ones((R, D), dtype=np.float32)
    mom = np.zeros((R, D), dtype=np.float32)
    idx = rng.permutation(R)[:M].astype(np.int32)
    w = rng.rand(M).astype(np.float32)
    g = rng.randn(M, D).astype(np.float32)
    mask = np.ones(M, dtype=bool)

    new_table, new_acc, _, _, _ = sparse_update(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(mom),
        jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), jnp.asarray(mask),
        adadelta=False, learning_rate=0.05, alpha=alpha, rho=0.95, eps=1e-6,
    )

    exp_table, exp_acc = _sequential_adagrad(
        table, acc, idx, w, g, lr=0.05, alpha=alpha
    )
    assert np.allclose(np.asarray(new_table), exp_table, atol=1e-5)
    assert np.allclose(np.asarray(new_acc), exp_acc, atol=1e-5)


def test_adagrad_duplicates_accumulate():
    # Two touches of the same row must both be applied (scatter-add).
    table = jnp.zeros((3, 2), dtype=jnp.float32)
    acc = jnp.ones((3, 2), dtype=jnp.float32)
    mom = jnp.zeros((3, 2), dtype=jnp.float32)
    idx = jnp.asarray([1, 1], dtype=jnp.int32)
    w = jnp.asarray([1.0, 1.0], dtype=jnp.float32)
    g = jnp.asarray([[1.0, 0.0], [1.0, 0.0]], dtype=jnp.float32)
    mask = jnp.asarray([True, True])

    new_table, new_acc, _, _, _ = sparse_update(
        table, acc, mom, idx, w, g, mask,
        adadelta=False, learning_rate=0.1, alpha=0.0, rho=0.95, eps=1e-6,
    )
    # Both touches use lr/sqrt(1)=0.1 against the pre-batch accumulator.
    assert np.allclose(np.asarray(new_table)[1, 0], -0.2, atol=1e-6)
    assert np.allclose(np.asarray(new_acc)[1, 0], 3.0, atol=1e-6)


def test_masked_touches_are_noops():
    rng = np.random.RandomState(1)
    table = rng.randn(5, 3).astype(np.float32)
    acc = np.ones((5, 3), dtype=np.float32)
    mom = rng.rand(5, 3).astype(np.float32)
    idx = np.array([0, 2, 4], dtype=np.int32)
    w = np.array([1.0, 1.0, 1.0], dtype=np.float32)
    g = rng.randn(3, 3).astype(np.float32)
    mask = np.array([False, False, False])

    for adadelta in (False, True):
        t2, a2, m2, slr, cnt = sparse_update(
            jnp.asarray(table), jnp.asarray(acc), jnp.asarray(mom),
            jnp.asarray(idx), jnp.asarray(w), jnp.asarray(g), jnp.asarray(mask),
            adadelta=adadelta, learning_rate=0.05, alpha=0.1, rho=0.95, eps=1e-6,
        )
        assert np.allclose(np.asarray(t2), table)
        assert np.allclose(np.asarray(a2), acc)
        assert np.allclose(np.asarray(m2), mom)
        assert float(cnt) == 0.0


def test_zero_weight_touches_are_noops():
    # Padding slots carry weight 0 but may be unmasked; they must not move
    # anything either (the padded-CSR contract).
    table = jnp.ones((4, 2), dtype=jnp.float32)
    acc = jnp.ones((4, 2), dtype=jnp.float32)
    mom = jnp.zeros((4, 2), dtype=jnp.float32)
    idx = jnp.asarray([0, 1], dtype=jnp.int32)
    w = jnp.asarray([0.0, 0.0], dtype=jnp.float32)
    g = jnp.ones((2, 2), dtype=jnp.float32)
    # mask False for w == 0 (as _flatten_touches produces)
    mask = jnp.asarray([False, False])

    for adadelta in (False, True):
        t2, a2, m2, _, _ = sparse_update(
            table, acc, mom, idx, w, g, mask,
            adadelta=adadelta, learning_rate=0.05, alpha=0.0, rho=0.95, eps=1e-6,
        )
        assert np.allclose(np.asarray(t2), np.asarray(table))
        assert np.allclose(np.asarray(a2), np.asarray(acc))
        assert np.allclose(np.asarray(m2), np.asarray(mom))


def test_adadelta_single_touch_matches_reference_math():
    # One touch of one row: exact reference recurrence (template:417-434).
    table = np.array([[1.0]], dtype=np.float32)
    acc = np.array([[0.5]], dtype=np.float32)
    mom = np.array([[0.25]], dtype=np.float32)
    w, g, rho, eps = 2.0, 3.0, 0.9, 1e-6

    t2, a2, m2, _, _ = sparse_update(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(mom),
        jnp.asarray([0], dtype=jnp.int32),
        jnp.asarray([w], dtype=jnp.float32),
        jnp.asarray([[g]], dtype=jnp.float32),
        jnp.asarray([True]),
        adadelta=True, learning_rate=0.05, alpha=0.0, rho=rho, eps=eps,
    )
    wg = w * g
    acc_new = rho * 0.5 + (1 - rho) * wg**2
    lr_local = np.sqrt(0.25 + eps) / np.sqrt(acc_new + eps)
    update = lr_local * wg
    mom_new = rho * 0.25 + (1 - rho) * update**2
    assert np.allclose(float(a2[0, 0]), acc_new, rtol=1e-5)
    assert np.allclose(float(m2[0, 0]), mom_new, rtol=1e-5)
    assert np.allclose(float(t2[0, 0]), 1.0 - update, rtol=1e-5)


def test_bias_vector_path():
    # 1-D tables (biases) go through the same code via promotion.
    table = jnp.zeros(4, dtype=jnp.float32)
    acc = jnp.ones(4, dtype=jnp.float32)
    mom = jnp.zeros(4, dtype=jnp.float32)
    idx = jnp.asarray([2], dtype=jnp.int32)
    t2, a2, _, _, _ = sparse_update(
        table, acc, mom, idx,
        jnp.asarray([1.0], dtype=jnp.float32),
        jnp.asarray([1.0], dtype=jnp.float32),
        jnp.asarray([True]),
        adadelta=False, learning_rate=0.1, alpha=0.0, rho=0.95, eps=1e-6,
    )
    assert t2.shape == (4,)
    assert np.allclose(float(t2[2]), -0.1, atol=1e-6)
    assert np.allclose(float(a2[2]), 2.0, atol=1e-6)


def test_small_table_keeps_lr_stats_when_lazy_reg_active():
    # Mixed-alpha configs need sum_lr/n_touches from EVERY table (the
    # lazy-L2 bump averages over the whole step); the zero-stats dense
    # fast path must stand aside when need_stats=True even on tiny tables.
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    R, W, M = 64, 8, 32
    table = jnp.asarray(rng.randn(R, W).astype(np.float32))
    acc = jnp.ones((R, W), jnp.float32)
    mom = jnp.zeros((R, W), jnp.float32)
    idx = jnp.asarray(rng.randint(0, R, M).astype(np.int32))
    w = jnp.ones((M,), jnp.float32)
    g = jnp.asarray(rng.randn(M, W).astype(np.float32))
    mask = jnp.ones((M,), bool)

    kw = dict(adadelta=False, learning_rate=0.05, alpha=0.0, rho=0.95, eps=1e-6)
    _, _, _, lr_stats, cnt_stats = sparse_update(
        table, acc, mom, idx, w, g, mask, need_stats=True, **kw
    )
    assert float(lr_stats) > 0.0 and float(cnt_stats) > 0.0
    # With no lazy reg anywhere the fast path may return zero stats.
    _, _, _, lr_fast, cnt_fast = sparse_update(
        table, acc, mom, idx, w, g, mask, need_stats=False, **kw
    )
    assert float(lr_fast) == 0.0 and float(cnt_fast) == 0.0
