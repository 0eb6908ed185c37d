"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightfm_tpu.ops.pallas_rank import rank_counts_fused


def _reference_counts(u_aug, items_aug, ts):
    scores = u_aug @ items_aug.T
    return (scores[:, None, :] >= ts[:, :, None]).sum(-1).astype(np.float32)


def test_rank_counts_fused_matches_dense():
    # The kernel computes f32-exact scores (Precision.HIGHEST); vs a numpy
    # reference only accumulation order differs, so at most measure-zero
    # near-tie flips of +-1 are tolerated.  Exact self-tie handling is
    # pinned by test_ranks_fused_matches_flat_path and the ties test below.
    rng = np.random.RandomState(0)
    U, I, Wa, T = 16, 256, 8, 8
    u = rng.randn(U, Wa).astype(np.float32)
    items = rng.randn(I, Wa).astype(np.float32)
    ts = rng.randn(U, T).astype(np.float32)

    got = np.asarray(
        rank_counts_fused(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(ts),
            user_block=8, item_block=128, interpret=True,
        )
    )
    want = _reference_counts(u, items, ts)
    assert np.abs(got - want).max() <= 1
    assert (got == want).mean() > 0.99


def test_rank_counts_fused_exact_ties():
    # All-zero embeddings: every score is exactly 0.0 -> every comparison is
    # a tie and must count (pessimistic >=), matching the reference's
    # zeroed-embeddings contract (its test_api.py:217-282).
    U, I, Wa, T = 8, 128, 8, 8
    u = np.zeros((U, Wa), np.float32)
    items = np.zeros((I, Wa), np.float32)
    ts = np.zeros((U, T), np.float32)
    got = np.asarray(
        rank_counts_fused(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(ts),
            user_block=8, item_block=128, interpret=True,
        )
    )
    assert np.all(got == I)


def test_rank_counts_fused_inf_ts_pad():
    # +inf test-score padding counts zero items.
    rng = np.random.RandomState(1)
    U, I, Wa, T = 8, 128, 8, 8
    u = rng.randn(U, Wa).astype(np.float32)
    items = rng.randn(I, Wa).astype(np.float32)
    ts = np.full((U, T), np.inf, np.float32)
    got = np.asarray(
        rank_counts_fused(
            jnp.asarray(u), jnp.asarray(items), jnp.asarray(ts),
            user_block=8, item_block=128, interpret=True,
        )
    )
    assert np.all(got == 0)


def test_ranks_fused_matches_flat_path():
    # The full fused ranking pipeline (diag-GEMM ts extraction + kernel +
    # exclusion subtraction) vs the XLA flat path.  On TPU both compute every
    # score with the same single-K-tile MXU GEMM, so ranks are bit-identical
    # (verified exactly on v5e, incl. exclusions and the zero-embedding tie
    # case).  On the CPU backend (this CI), XLA's dot uses N-dependent
    # reduction orders, so the self-match comparison can flip per entry:
    # assert equality up to that +-1 ambiguity here.
    import scipy.sparse as sp
    from lightfm_tpu.ops import ranking
    from lightfm_tpu.sparse import identity_rows
    from lightfm_tpu.state import init_state

    rng = np.random.RandomState(0)
    n_users, n_items, T = 48, 300, 5
    rows = np.repeat(np.arange(n_users), T)
    cols = np.concatenate(
        [rng.choice(n_items, T, replace=False) for _ in range(n_users)]
    )
    test = sp.csr_matrix(
        (np.ones(n_users * T, np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    train = sp.csr_matrix(
        (np.ones(n_users * T, np.float32), (rows, (cols + 11) % n_items)),
        shape=(n_users, n_items),
    )
    train = train - train.multiply(test)
    train.eliminate_zeros()
    train = sp.csr_matrix(train)

    state = init_state(16, n_items, n_users, rng, adagrad=True)
    uf, itf = identity_rows(n_users), identity_rows(n_items)

    # Build padded args exactly as predict_ranks_padded does.
    lengths = np.diff(test.indptr)
    user_block = 16
    u_pad = ranking._round_up(n_users, user_block)
    test_idx = np.zeros((u_pad, T), np.int32)
    test_valid = np.zeros((u_pad, T), bool)
    row_of = np.repeat(np.arange(n_users), lengths)
    pos_in_row = np.arange(test.nnz) - np.repeat(test.indptr[:-1], lengths)
    test_idx[row_of, pos_in_row] = test.indices
    test_valid[row_of, pos_in_row] = True
    tr_lengths = np.diff(train.indptr)
    Ptr = max(1, int(tr_lengths.max()))
    train_idx = np.full((u_pad, Ptr), n_items, np.int32)
    trow = np.repeat(np.arange(n_users), tr_lengths)
    tpos = np.arange(train.nnz) - np.repeat(train.indptr[:-1], tr_lengths)
    train_idx[trow, tpos] = train.indices
    user_ids = np.zeros(u_pad, np.int32)
    user_ids[:n_users] = np.arange(n_users)

    args = (
        state, uf, itf,
        jnp.asarray(user_ids), jnp.asarray(test_idx),
        jnp.asarray(test_valid), jnp.asarray(train_idx),
    )
    fused = np.asarray(
        ranking._ranks_fused(
            *args, n_items=n_items, user_block=user_block, item_block=128,
            interpret=True,
        )
    )
    flat = np.asarray(
        ranking._ranks_flat(*args, n_items=n_items, user_block=user_block)
    )
    assert np.abs(fused - flat).max() <= 1


def test_adagrad_update_pallas_matches_scatter():
    # Differential test of the experimental blocked update kernel
    # (ops/pallas_update.py) against the sequential adagrad reference, in
    # interpret mode: duplicates accumulate, pre-batch accumulator lr.
    from lightfm_tpu.ops.pallas_update import adagrad_update_pallas

    rng = np.random.RandomState(0)
    R, W, M = 1000, 16, 300
    table = rng.randn(R, W).astype(np.float32)
    acc = np.ones((R, W), np.float32) + rng.rand(R, W).astype(np.float32)
    idx = rng.randint(0, R, M).astype(np.int32)
    idx[::7] = idx[0]  # duplicates
    wg = rng.randn(M, W).astype(np.float32)
    wg[::11] = 0.0

    lr = 0.05
    lr_local = lr / np.sqrt(acc[idx])
    t_ref = table.copy()
    a_ref = acc.copy()
    np.add.at(t_ref, idx, -(lr_local * wg))
    np.add.at(a_ref, idx, wg * wg)

    t2, a2 = adagrad_update_pallas(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(idx), jnp.asarray(wg),
        learning_rate=lr, interpret=True,
    )
    assert np.allclose(np.asarray(t2), t_ref, atol=1e-5)
    assert np.allclose(np.asarray(a2), a_ref, atol=1e-5)


def test_warp_fit_fused_learns():
    # Interpret-mode statistical test of the experimental whole-fit
    # megakernel (ops/pallas_train.py): must reach the same AUC
    # neighbourhood as the XLA path on a planted dataset.
    import scipy.sparse as sp
    from lightfm_tpu.ops.pallas_train import warp_fit_fused
    from lightfm_tpu.sparse import pad_csr_sorted
    from lightfm_tpu.state import init_state

    rng = np.random.RandomState(7)
    nu, ni, d = 120, 100, 6
    top = np.argsort(-(rng.randn(nu, d) @ rng.randn(ni, d).T), axis=1)
    rows = np.repeat(np.arange(nu), 10)
    cols = top[:, :10].ravel()
    train = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(nu, ni)
    )

    state = init_state(8, ni, nu, np.random.RandomState(0), adagrad=True)
    coo = train.tocoo()
    B, epochs, K = 128, 8, 10
    n = coo.nnz
    n_pad = ((n + B - 1) // B) * B
    packed = np.zeros((8, n_pad), np.int32)
    packed[0, :n] = coo.row
    packed[1, :n] = coo.col
    packed[2, :n] = np.ones(n, np.float32).view(np.int32)
    packed[3, :n] = np.ones(n, np.float32).view(np.int32)
    packed[4, :n] = 1
    prng = np.random.RandomState(10)
    steps = []
    for _ in range(epochs):
        shuf = packed[:, prng.permutation(n_pad)]
        steps.append(shuf.reshape(8, n_pad // B, B).transpose(1, 0, 2))
    batches = jnp.asarray(np.concatenate(steps, 0))
    n_steps = batches.shape[0]
    negs = jnp.asarray(
        prng.randint(0, ni, size=(n_steps, 1, K * B)).astype(np.int32)
    )
    positives = jnp.asarray(np.asarray(pad_csr_sorted(train, pad_multiple=8).idx))

    u_tab, u_acc, i_tab, i_acc = warp_fit_fused(
        state.user_table, state.user_acc, state.item_table, state.item_acc,
        batches, negs, positives,
        n_items=ni, max_sampled=K, learning_rate=0.05, interpret=True,
    )
    u, it = np.asarray(u_tab), np.asarray(i_tab)
    scores = u[:, :-1] @ it[:, :-1].T + u[:, -1:] + it[None, :, -1]
    aucs = []
    for uu in range(nu):
        pos = train.indices[train.indptr[uu] : train.indptr[uu + 1]]
        mask = np.ones(ni, bool)
        mask[pos] = False
        aucs.append((scores[uu][pos][:, None] > scores[uu][mask][None, :]).mean())
    assert np.mean(aucs) > 0.85
    assert np.isfinite(u).all() and np.isfinite(it).all()
    assert (np.asarray(u_acc) >= 1.0).all()  # adagrad accumulators grew


def test_ranks_fused_exact_multiple_of_item_block():
    # Review regression: when n_items is an exact multiple of item_block the
    # train-exclusion sentinel row must still be -inf padding, not the last
    # real item (which silently corrupted ranks).
    import scipy.sparse as sp
    from lightfm_tpu.ops import ranking
    from lightfm_tpu.sparse import identity_rows
    from lightfm_tpu.state import init_state

    rng = np.random.RandomState(1)
    n_users, n_items, T = 16, 256, 3  # n_items % item_block(128) == 0
    rows = np.repeat(np.arange(n_users), T)
    cols = np.concatenate(
        [rng.choice(n_items, T, replace=False) for _ in range(n_users)]
    )
    test = sp.csr_matrix(
        (np.ones(n_users * T, np.float32), (rows, cols)), shape=(n_users, n_items)
    )
    # Train rows of VARYING lengths so sentinel padding slots exist.
    tr_rows, tr_cols = [], []
    for u in range(n_users):
        for j in range(u % 4):
            c = (cols[u * T] + 13 + j) % n_items
            tr_rows.append(u)
            tr_cols.append(c)
    train = sp.csr_matrix(
        (np.ones(len(tr_rows), np.float32), (tr_rows, tr_cols)),
        shape=(n_users, n_items),
    )
    train = train - train.multiply(test)
    train.eliminate_zeros()
    train = sp.csr_matrix(train)

    state = init_state(8, n_items, n_users, rng, adagrad=True)
    uf, itf = identity_rows(n_users), identity_rows(n_items)

    lengths = np.diff(test.indptr)
    user_block = 16
    test_idx = np.zeros((n_users, T), np.int32)
    test_valid = np.zeros((n_users, T), bool)
    row_of = np.repeat(np.arange(n_users), lengths)
    pos_in_row = np.arange(test.nnz) - np.repeat(test.indptr[:-1], lengths)
    test_idx[row_of, pos_in_row] = test.indices
    test_valid[row_of, pos_in_row] = True
    tr_lengths = np.diff(train.indptr)
    Ptr = max(1, int(tr_lengths.max()))
    train_idx = np.full((n_users, Ptr), n_items, np.int32)
    trow = np.repeat(np.arange(n_users), tr_lengths)
    tpos = np.arange(train.nnz) - np.repeat(train.indptr[:-1], tr_lengths)
    train_idx[trow, tpos] = train.indices
    user_ids = np.arange(n_users, dtype=np.int32)

    args = (
        state, uf, itf,
        jnp.asarray(user_ids), jnp.asarray(test_idx),
        jnp.asarray(test_valid), jnp.asarray(train_idx),
    )
    fused = np.asarray(
        ranking._ranks_fused(
            *args, n_items=n_items, user_block=user_block, item_block=128,
            interpret=True,
        )
    )
    flat = np.asarray(
        ranking._ranks_flat(*args, n_items=n_items, user_block=user_block)
    )
    assert np.abs(fused - flat).max() <= 1


def test_adagrad_update_pallas_multiblock():
    # Worklist path across many chunks and table blocks, with duplicates,
    # skew (hot rows), masked touches, and a non-multiple table height.
    from lightfm_tpu.ops.pallas_update import adagrad_update_pallas

    rng = np.random.RandomState(1)
    R, W, M = 7000, 24, 5000
    table = rng.randn(R, W).astype(np.float32)
    acc = np.ones((R, W), np.float32) + rng.rand(R, W).astype(np.float32)
    idx = rng.randint(0, R, M).astype(np.int32)
    idx[: M // 4] = rng.randint(0, 50, M // 4)  # hot-row skew
    wg = rng.randn(M, W).astype(np.float32)
    wg[::13] = 0.0

    lr = 0.05
    lr_local = lr / np.sqrt(acc[idx])
    t_ref, a_ref = table.copy(), acc.copy()
    np.add.at(t_ref, idx, -(lr_local * wg))
    np.add.at(a_ref, idx, wg * wg)

    t2, a2 = adagrad_update_pallas(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(idx), jnp.asarray(wg),
        learning_rate=lr, interpret=True,
    )
    assert np.allclose(np.asarray(t2), t_ref, atol=1e-4)
    assert np.allclose(np.asarray(a2), a_ref, atol=1e-4)


def test_sorted_grad_sums_pallas_matches_numpy():
    """Differential test of the sums-only worklist kernel (the hybrid fast
    path's per-entity gradient aggregation) against numpy, in interpret
    mode: duplicates accumulate, squared sums exact, untouched rows zero."""
    from lightfm_tpu.ops.pallas_update import sorted_grad_sums_pallas

    rng = np.random.RandomState(0)
    R, W, M = 5000, 16, 700  # multi-block (BLOCK_R=2048), ragged chunk
    sidx = np.sort(rng.randint(0, R, M)).astype(np.int32)
    sidx[:50] = sidx[0]  # hot row
    sidx = np.sort(sidx)
    swg = rng.randn(M, W).astype(np.float32)
    swg[::9] = 0.0  # masked touches are exact no-ops

    S = np.asarray(
        sorted_grad_sums_pallas(
            jnp.asarray(sidx), jnp.asarray(swg), n_rows=R, interpret=True
        )
    )
    want1 = np.zeros((R, W), np.float32)
    want2 = np.zeros((R, W), np.float32)
    np.add.at(want1, sidx, swg)
    np.add.at(want2, sidx, swg * swg)
    np.testing.assert_allclose(S[:, :W], want1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(S[:, W:], want2, rtol=1e-5, atol=1e-5)
    # untouched rows are exactly zero (the zeros alias passes through)
    untouched = np.setdiff1d(np.arange(R), sidx)
    assert (S[untouched] == 0).all()


def test_sorted_grad_sums_pallas_sentinel_and_empty():
    """Sentinel rows (>= n_rows) are excluded; an all-sentinel input yields
    exactly zero sums (the empty-worklist flush path)."""
    from lightfm_tpu.ops.pallas_update import sorted_grad_sums_pallas

    R, W, M = 600, 8, 64
    sidx = np.full(M, 10**6, np.int32)
    swg = np.ones((M, W), np.float32)
    S = np.asarray(
        sorted_grad_sums_pallas(
            jnp.asarray(sidx), jnp.asarray(swg), n_rows=R, interpret=True
        )
    )
    assert (S == 0).all()

    sidx[:3] = [5, 5, 599]
    sidx = np.sort(sidx)  # real rows sort before the sentinel
    S = np.asarray(
        sorted_grad_sums_pallas(
            jnp.asarray(sidx), jnp.asarray(swg), n_rows=R, interpret=True
        )
    )
    assert S[5, 0] == 2.0 and S[599, 0] == 1.0
    assert S[5, W] == 2.0  # squared half
    assert float(np.abs(S).sum()) == 2 * (2.0 + 1.0) * W
