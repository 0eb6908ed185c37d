"""Differential tests: pallas_pool kernels vs the einsum/roll formulation
they replace (fast_warp's scoring and pool-gradient fold)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightfm_tpu.ops import pallas_pool as pp


def _einsum_reference(u1, pool, shifts, j, lossm):
    """The XLA formulation from fast_warp (rolled copies + einsums)."""
    B, W = u1.shape
    P = pool.shape[0]
    K = shifts.shape[0]
    Q = B // P
    rp = jnp.stack([jnp.roll(pool, -int(s), axis=0) for s in shifts])  # [K,P,W]
    u1q = u1.reshape(Q, P, W)
    preds = jnp.einsum(
        "qsd,ksd->kqs", u1q, rp, precision=jax.lax.Precision.HIGHEST
    ).reshape(K, B)
    onehot = (j[None, :] == jnp.arange(K, dtype=j.dtype)[:, None]).astype(
        jnp.float32
    )
    nrep = jnp.einsum(
        "kqs,ksd->qsd", onehot.reshape(K, Q, P), rp,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(B, W)
    sel = onehot * lossm[None, :]
    selq = sel.reshape(K, Q, P)
    g_roll = jnp.einsum(
        "kqs,qsd->ksd", selq, u1q, precision=jax.lax.Precision.HIGHEST
    )
    gp = jnp.zeros((P, W), jnp.float32)
    for k in range(K):
        gp = gp + jnp.roll(g_roll[k], int(shifts[k]), axis=0)
    return preds, nrep, gp


def _case(B, P, K, seed=0):
    rng = np.random.RandomState(seed)
    u1 = jnp.asarray(rng.randn(B, 8).astype(np.float32))
    pool = jnp.asarray(rng.randn(P, 8).astype(np.float32))
    shifts = jnp.asarray(rng.randint(0, P, K).astype(np.int32))
    j = jnp.asarray(rng.randint(0, K, B).astype(np.int32))
    lossm = jnp.asarray(
        np.where(rng.rand(B) < 0.3, 0.0, rng.rand(B)).astype(np.float32)
    )
    return u1, pool, shifts, j, lossm


# Sizes chosen so chunking hits every regime: single chunk, many chunks,
# multi-pool batches (B > P), wraparound-heavy small pools.
CASES = [(256, 256, 4), (1024, 256, 3), (4096, 512, 10), (512, 512, 1)]


@pytest.mark.parametrize("B,P,K", CASES)
def test_pool_scores_matches_einsum(B, P, K):
    u1, pool, shifts, j, lossm = _case(B, P, K)
    want, _, _ = _einsum_reference(u1, pool, shifts, j, lossm)
    got = pp.pool_scores_pallas(u1, pool, shifts, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,P,K", CASES)
def test_pool_fold_with_nrep_matches_einsum(B, P, K):
    u1, pool, shifts, j, lossm = _case(B, P, K)
    _, want_nrep, want_gp = _einsum_reference(u1, pool, shifts, j, lossm)
    gp, nrep = pp.pool_fold_pallas(
        u1, lossm, j, shifts, n_slots=P, pool=pool, interpret=True
    )
    np.testing.assert_allclose(np.asarray(nrep), np.asarray(want_nrep), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(want_gp), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("B,P,K", CASES[:2])
def test_pool_fold_without_pool_matches_einsum(B, P, K):
    u1, pool, shifts, j, lossm = _case(B, P, K, seed=3)
    # gp2 uses payload u1*u1 and weight lossm^2.
    _, _, want_gp2 = _einsum_reference(u1 * u1, pool, shifts, j, lossm * lossm)
    gp2 = pp.pool_fold_pallas(
        u1 * u1, lossm * lossm, j, shifts, n_slots=P, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(gp2), np.asarray(want_gp2), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("B,P,K", CASES[:2])
def test_pool_select_matches_einsum(B, P, K):
    u1, pool, shifts, j, lossm = _case(B, P, K, seed=7)
    _, want_nrep, _ = _einsum_reference(u1, pool, shifts, j, lossm)
    nrep = pp.pool_select_pallas(
        pool, j, shifts, n_examples=B, interpret=True
    )
    np.testing.assert_allclose(np.asarray(nrep), np.asarray(want_nrep), rtol=0)


def test_zero_weights_are_exact_noops():
    u1, pool, shifts, j, _ = _case(512, 256, 4, seed=5)
    gp = pp.pool_fold_pallas(
        u1, jnp.zeros(512, jnp.float32), j, shifts, n_slots=256, interpret=True
    )
    assert (np.asarray(gp) == 0).all()
