"""Catalog ranking: the TPU-native ``predict_ranks`` kernel.

The reference computes ranks with an O(n_users x n_items x nnz_feat) scalar
scan per user (`_lightfm_fast.pyx.template:1232-1323`): for every test
interaction, count catalog items (excluding train positives) whose score is
``>=`` the test item's score (pessimistic ties, template:1318).

Here the same quantity is computed as blocked dense linear algebra on the
MXU.  Scores use AUGMENTED representations so biases ride the matmul:
``u' = [u_emb, 1, u_bias]``, ``i' = [i_emb, i_bias, 1]`` makes
``u' . i' = dot + u_bias + i_bias`` — one [UB, D+2] x [D+2, I] matmul per
user block.  Ranks are recovered by direct comparison counting when each
user has few test items (``count(s_j >= s_t)`` via a broadcast compare —
measured 5.5x faster than sorting on v5e), falling back to sort + binary
search when T is large (e.g. ranking every item for one user).

Tie semantics are exact: the test item's own score is read out of the very
same score row used for counting, so ties (including the all-zero embedding
edge case) count pessimistically with `>=` and the self-match is removed by
an exact ``- 1``, matching the reference's
``item_id != item_ids[i] and prediction >= predictions[i]``.

For catalogs too large to hold a [user_block, n_items] score row, a blocked
variant scans item blocks; the test scores are then extracted from the same
per-block matmuls in a first pass, keeping both paths bitwise consistent.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from lightfm_tpu.ops.representation import batch_representation, full_representations
from lightfm_tpu.sparse import IdentityRows, trim_rows
from lightfm_tpu.state import ModelState

# Plain numpy scalar: a jnp constant here would initialise the XLA backend
# at import time, breaking jax.distributed.initialize in multi-host workers.
_NEG_INF = np.float32(-np.inf)


def _f32_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-exact MXU matmul for SERVING-path scores.

    TPU jnp.dot defaults round f32 inputs to bf16 (preferred_element_type
    only sets the accumulator); Precision.HIGHEST keeps scoring consistent
    with predict()'s f32 VPU dot and with the reference's f32 numerics.
    Training matmuls keep the bf16 default — SGD noise, validated by the
    accuracy floors.
    """
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

# Above this catalog width the flat [user_block, n_items] score row is
# replaced by the blocked two-pass variant.
FLAT_CATALOG_LIMIT = 131072


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# With at most this many test items per user, ranks are counted with a
# direct broadcast compare (O(T x I), measured 5.5x faster than sort on
# v5e); above it the O(I log I) sort + binary search wins (e.g. the
# rank-every-item-per-user property tests).
#
# The same limit gates the Pallas-fused TPU path (predict_ranks_padded).
# Hardware sweep (tools/rank_t_crossover.py, v5e, 8192 x 100k, D=64,
# production blocks UB=256/IB=2048): the fused kernel beats the blocked
# sort at EVERY T it compiles — T=8: 136k vs 94k users/s, T=16: 101k vs
# 74k, T=32: 58k vs 40k — and Mosaic fails to compile it at T >= 64, so
# 32 is the compile-safety boundary, not a perf crossover; wide-T tiers
# correctly fall back to the sort paths.
COUNT_T_LIMIT = 32


def _count_geq(scores: jax.Array, ts: jax.Array) -> jax.Array:
    """counts[u, t] = #{i : scores[u, i] >= ts[u, t]}, item-blocked so the
    [UB, T, IB] compare stays memory-bounded."""
    UB, I = scores.shape
    block = 8192 if I % 8192 == 0 else 128  # I is always a multiple of 128
    if I <= block:
        return (scores[:, None, :] >= ts[:, :, None]).sum(-1)

    def body(c, b):
        sb = jax.lax.dynamic_slice_in_dim(scores, b * block, block, axis=1)
        return c + (sb[:, None, :] >= ts[:, :, None]).sum(-1), None

    c0 = jnp.zeros(ts.shape, jnp.int32)
    c, _ = jax.lax.scan(body, c0, jnp.arange(I // block))
    return c


def _rank_counts(scores: jax.Array, ts: jax.Array) -> jax.Array:
    """Per test score, how many catalog scores are >= it (pessimistic ties)."""
    if ts.shape[-1] <= COUNT_T_LIMIT:
        return _count_geq(scores, ts).astype(jnp.float32)
    sorted_scores = jnp.sort(scores, axis=-1)
    pos = jax.vmap(lambda srow, trow: jnp.searchsorted(srow, trow, side="left"))(
        sorted_scores, ts
    )
    return (scores.shape[-1] - pos).astype(jnp.float32)


def _augment_users(u_rep: jax.Array) -> jax.Array:
    """[.., D+1] -> [.., D+2]: [emb, 1, bias]."""
    d = u_rep.shape[-1] - 1
    ones = jnp.ones(u_rep.shape[:-1] + (1,), u_rep.dtype)
    return jnp.concatenate([u_rep[..., :d], ones, u_rep[..., d:]], axis=-1)


def _augment_items(i_rep: jax.Array) -> jax.Array:
    """[.., D+1] -> [.., D+2]: [emb, bias, 1]."""
    ones = jnp.ones(i_rep.shape[:-1] + (1,), i_rep.dtype)
    return jnp.concatenate([i_rep, ones], axis=-1)


def pad_catalog_neg_inf(item_aug: jax.Array, n_items: int, multiple: int) -> jax.Array:
    """Pad catalog rows to ``multiple`` with rows that score -inf (bias col)."""
    i_pad = _round_up(n_items, multiple)
    pad_rows = i_pad - item_aug.shape[0]
    if pad_rows > 0:
        pad_block = jnp.zeros((pad_rows, item_aug.shape[1]), item_aug.dtype)
        pad_block = pad_block.at[:, -2].set(-np.inf)
        item_aug = jnp.concatenate([item_aug, pad_block], axis=0)
    return item_aug


def _catalog_representations(state, item_feats, n_items: int):
    """Augmented representations for catalog rows [0, n_items) (the test
    matrix's column count, template:1301)."""
    # Lazy-reg scales are folded into the tables at every epoch end
    # (train._epoch), so post-fit reads skip the scale multiply entirely.
    if isinstance(item_feats, IdentityRows):
        rep = state.item_table[:n_items]
    else:
        rep = full_representations(state.item_table, trim_rows(item_feats, n_items))
    return _augment_items(rep)


@functools.partial(jax.jit, static_argnames=("n_items", "user_block"))
def _ranks_flat(
    state: ModelState,
    user_feats,
    item_feats,
    user_ids: jax.Array,  # int32 [Upad]
    test_idx: jax.Array,  # int32 [Upad, T]
    test_valid: jax.Array,  # bool [Upad, T]
    train_idx: jax.Array,  # int32 [Upad, Ptr] (sentinel >= n_items for padding)
    n_items: int,
    user_block: int,
):
    item_aug = pad_catalog_neg_inf(
        _catalog_representations(state, item_feats, n_items), n_items, 128
    )
    i_pad = item_aug.shape[0]

    u_pad = user_ids.shape[0]
    n_ublocks = u_pad // user_block

    def ublock_body(_, xs):
        u_ids, t_idx, t_valid, tr_idx = xs
        u_rep = batch_representation(state.user_table, user_feats, u_ids)
        u_aug = _augment_users(u_rep)  # [UB, D+2]
        scores = _f32_dot(u_aug, item_aug.T)
        rows = jnp.broadcast_to(
            jnp.arange(user_block, dtype=jnp.int32)[:, None], tr_idx.shape
        )
        # Exclude train positives (template:1303); sentinel indices land on
        # padding columns (already -inf) or are dropped.
        scores = scores.at[rows, jnp.minimum(tr_idx, i_pad)].set(
            _NEG_INF, mode="drop"
        )
        rows_t = jnp.broadcast_to(
            jnp.arange(user_block, dtype=jnp.int32)[:, None], t_idx.shape
        )
        # Test scores come from the SAME score row -> exact tie handling.
        ts = scores[rows_t, t_idx]
        counts = _rank_counts(scores, ts)
        # The self-match always counts exactly once; remove it (template:1318).
        ranks = jnp.where(t_valid, counts - 1.0, 0.0)
        return None, ranks

    _, ranks = jax.lax.scan(
        ublock_body,
        None,
        (
            user_ids.reshape(n_ublocks, user_block),
            test_idx.reshape(n_ublocks, user_block, -1),
            test_valid.reshape(n_ublocks, user_block, -1),
            train_idx.reshape(n_ublocks, user_block, -1),
        ),
    )
    return ranks.reshape(u_pad, -1)


@functools.partial(jax.jit, static_argnames=("n_items", "user_block", "item_block"))
def _ranks_blocked(
    state: ModelState,
    user_feats,
    item_feats,
    user_ids: jax.Array,
    test_idx: jax.Array,
    test_valid: jax.Array,
    train_idx: jax.Array,
    n_items: int,
    user_block: int,
    item_block: int,
):
    """Two-pass blocked variant for very large catalogs.

    Pass 1 extracts each test item's score from the block matmul containing
    it; pass 2 re-runs the same (deterministic) block matmuls to count.  XLA
    executes identical ops identically, so both passes see the same floats
    and tie handling stays exact.
    """
    item_aug = pad_catalog_neg_inf(
        _catalog_representations(state, item_feats, n_items), n_items, item_block
    )
    i_pad = item_aug.shape[0]
    n_iblocks = i_pad // item_block
    blk_reps = item_aug.reshape(n_iblocks, item_block, -1)
    blk_start = jnp.arange(n_iblocks, dtype=jnp.int32) * item_block

    u_pad = user_ids.shape[0]
    n_ublocks = u_pad // user_block

    def ublock_body(_, xs):
        u_ids, t_idx, t_valid, tr_idx = xs
        u_rep = batch_representation(state.user_table, user_feats, u_ids)
        u_aug = _augment_users(u_rep)
        rows = jnp.broadcast_to(
            jnp.arange(user_block, dtype=jnp.int32)[:, None], tr_idx.shape
        )
        rows_t = jnp.broadcast_to(
            jnp.arange(user_block, dtype=jnp.int32)[:, None], t_idx.shape
        )

        def block_scores(rep, start):
            scores = _f32_dot(u_aug, rep.T)
            local = jnp.where(
                (tr_idx >= start) & (tr_idx < start + item_block),
                tr_idx - start,
                item_block,
            )
            return scores.at[rows, local].set(_NEG_INF, mode="drop")

        # Pass 1: extract test scores from their containing blocks.
        def ts_body(ts, blk):
            rep, start = blk
            scores = block_scores(rep, start)
            in_blk = (t_idx >= start) & (t_idx < start + item_block)
            local_t = jnp.where(in_blk, t_idx - start, 0)
            ts = jnp.where(in_blk, scores[rows_t, local_t], ts)
            return ts, None

        ts0 = jnp.full(t_idx.shape, jnp.inf, dtype=jnp.float32)
        ts, _ = jax.lax.scan(ts_body, ts0, (blk_reps, blk_start))
        ts = jnp.where(t_valid, ts, jnp.inf)

        # Pass 2: count catalog scores >= test scores.
        def count_body(counts, blk):
            rep, start = blk
            scores = block_scores(rep, start)
            return counts + _rank_counts(scores, ts), None

        counts0 = jnp.zeros(ts.shape, dtype=jnp.float32)
        counts, _ = jax.lax.scan(count_body, counts0, (blk_reps, blk_start))
        ranks = jnp.where(t_valid, counts - 1.0, 0.0)
        return None, ranks

    _, ranks = jax.lax.scan(
        ublock_body,
        None,
        (
            user_ids.reshape(n_ublocks, user_block),
            test_idx.reshape(n_ublocks, user_block, -1),
            test_valid.reshape(n_ublocks, user_block, -1),
            train_idx.reshape(n_ublocks, user_block, -1),
        ),
    )
    return ranks.reshape(u_pad, -1)


def _diag_scores(u_aug: jax.Array, reps: jax.Array, user_block: int) -> jax.Array:
    """scores[u, c] = u_aug[u] . reps[u, c] via block-diagonal MXU GEMMs.

    A batched einsum would run the MXU in bf16 (measured |diff| up to 0.07 vs
    the f32 GEMM), breaking exact ``>=`` tie semantics against catalog scores
    computed by :mod:`pallas_rank`'s f32 dot.  Instead each user block does a
    real f32 GEMM against its own [UB*C, Wa] candidate block and extracts the
    diagonal — the same single-K-tile MXU reduction as the fused kernel, so
    the self-item's score is bitwise identical.
    """
    U, C, Wa = reps.shape
    n_blocks = U // user_block

    def body(_, xs):
        u_blk, r_blk = xs  # [UB, Wa], [UB, C, Wa]
        s = _f32_dot(u_blk, r_blk.reshape(user_block * C, Wa).T)  # [UB, UB*C]
        rows = jnp.arange(user_block, dtype=jnp.int32)[:, None]
        cols = rows * C + jnp.arange(C, dtype=jnp.int32)[None, :]
        return None, s[rows, cols]  # [UB, C]

    _, out = jax.lax.scan(
        body, None,
        (u_aug.reshape(n_blocks, user_block, Wa),
         reps.reshape(n_blocks, user_block, C, Wa)),
    )
    return out.reshape(U, C)


@functools.partial(
    jax.jit, static_argnames=("n_items", "user_block", "item_block", "interpret")
)
def _ranks_fused(
    state: ModelState,
    user_feats,
    item_feats,
    user_ids: jax.Array,  # int32 [Upad]
    test_idx: jax.Array,  # int32 [Upad, T]
    test_valid: jax.Array,  # bool [Upad, T]
    train_idx: jax.Array,  # int32 [Upad, Ptr] (sentinel >= n_items)
    n_items: int,
    user_block: int,
    item_block: int,
    interpret: bool = False,
):
    """Pallas-fused ranking: catalog scores never leave VMEM.

    rank[u, t] = #{catalog i: s_i >= ts_t} − #{train-excluded j: s_j >= ts_t}
    − 1 (the self match).  Test and excluded-item scores are extracted with
    :func:`_diag_scores` so every comparison is between bitwise-identical
    GEMM outputs (pessimistic ``>=`` ties stay exact, template:1318).
    """
    from lightfm_tpu.ops.pallas_rank import rank_counts_fused

    # ALWAYS pad at least one row: the exclusion sentinel below points at
    # i_pad - 1, which must be a -inf pad row, not a real item (it would be
    # whenever n_items is an exact multiple of item_block).
    item_aug = pad_catalog_neg_inf(
        _catalog_representations(state, item_feats, n_items), n_items + 1,
        item_block,
    )
    i_pad = item_aug.shape[0]

    u_rep = batch_representation(state.user_table, user_feats, user_ids)
    u_aug = _augment_users(u_rep)  # [Upad, Wa]

    # Test scores: -inf-padded catalog rows never outrank; invalid test
    # slots get ts=+inf so they count 0.
    safe_t = jnp.minimum(test_idx, i_pad - 1)
    ts = _diag_scores(u_aug, item_aug[safe_t], user_block)
    ts = jnp.where(test_valid, ts, jnp.inf)

    counts = rank_counts_fused(
        u_aug, item_aug, ts,
        user_block=user_block, item_block=item_block, interpret=interpret,
    )

    # Train-positive exclusion: subtract excluded items scoring >= ts.
    # Sentinel indices hit -inf pad rows and never count.  The chunk width
    # scales with Ptr so a wide (heavy-user) tier runs few sequential scan
    # steps instead of Ptr/32 of them — but each scan step materializes the
    # [U, chunk, Wa] gather in HBM, so the width is also budgeted against
    # the tier's user count (a small heavy tier gets wide chunks; an
    # ML-25M-scale light tier with ~all test users degrades gracefully to
    # narrow ones instead of OOMing).
    Ptr = train_idx.shape[1]
    row_bytes = u_aug.shape[0] * item_aug.shape[1] * 4
    budget_cols = max(32, ((512 << 20) // max(1, row_bytes)) // 32 * 32)
    excl_chunk = min(512, budget_cols, _round_up(Ptr, 32))
    p_pad = _round_up(Ptr, excl_chunk)
    tr = jnp.full((train_idx.shape[0], p_pad), i_pad - 1, train_idx.dtype)
    tr = tr.at[:, :Ptr].set(jnp.minimum(train_idx, i_pad - 1))
    n_chunks = p_pad // excl_chunk

    def chunk_body(carry, c):
        excl_counts = carry
        idx_c = jax.lax.dynamic_slice_in_dim(tr, c * excl_chunk, excl_chunk, 1)
        s_c = _diag_scores(u_aug, item_aug[idx_c], user_block)  # [U, chunk]
        excl_counts += (s_c[:, None, :] >= ts[:, :, None]).sum(-1)
        return excl_counts, None

    excl0 = jnp.zeros(ts.shape, jnp.int32)
    excl_counts, _ = jax.lax.scan(chunk_body, excl0, jnp.arange(n_chunks))

    # On TPU the self match counts exactly once (bitwise-equal GEMMs); the
    # clamp only guards non-TPU/interpret backends with differing dot
    # reduction orders.
    ranks = jnp.maximum(counts - excl_counts.astype(jnp.float32) - 1.0, 0.0)
    return jnp.where(test_valid, ranks, 0.0)


class _RankTier:
    """Host-prepared inputs for one degree tier of test users.

    ``users`` are the ORIGINAL user ids ranked in this tier; ``nnz_pos``
    maps the tier's (local row, slot) extraction back into the test CSR's
    data order.
    """

    __slots__ = (
        "user_ids", "test_idx", "test_valid", "train_idx",
        "row_of", "pos_in_row", "nnz_pos",
    )

    def __init__(self, user_ids, test_idx, test_valid, train_idx,
                 row_of, pos_in_row, nnz_pos):
        self.user_ids = user_ids
        self.test_idx = test_idx
        self.test_valid = test_valid
        self.train_idx = train_idx
        self.row_of = row_of
        self.pos_in_row = pos_in_row
        self.nnz_pos = nnz_pos


def _split_degree_tiers(tr_lengths: np.ndarray, users: np.ndarray):
    """Partition ``users`` into train-degree tiers.

    Padding every user's exclusion list to the GLOBAL max degree makes one
    ML-25M-style heavy user (10-100x the p99 degree) inflate the padded
    width — and the exclusion wall time — for everyone (round-2 verdict).
    Users above ~4x the rounded p99 go to a separate narrow tier that pays
    the wide padding only for itself.
    """
    if len(users) == 0:
        return [users]
    deg = tr_lengths[users]
    # method="lower" keeps a lone outlier's own degree out of the p99 at
    # small n (linear interpolation would drag the cap toward it).
    p99 = int(np.percentile(deg, 99, method="lower")) if len(deg) else 0
    cap = max(8 * ((p99 + 7) // 8), 64)
    if int(deg.max()) <= 4 * cap:
        return [users]
    heavy = deg > cap
    return [users[~heavy], users[heavy]]


def _build_tier(test_csr, train_csr, users: np.ndarray, user_block: int):
    """Padded blocks for one tier (device arrays built once, cacheable)."""
    n_items = test_csr.shape[1]
    lengths = np.diff(test_csr.indptr)[users]
    T = max(1, int(lengths.max()))
    u_pad = _round_up(len(users), min(user_block, max(8, _round_up(len(users), 8))))

    # nnz positions of this tier's users, in CSR data order.
    starts = test_csr.indptr[users]
    nnz_pos = (
        np.repeat(starts, lengths)
        + np.arange(int(lengths.sum()))
        - np.repeat(np.cumsum(lengths) - lengths, lengths)
    )
    row_of = np.repeat(np.arange(len(users)), lengths)
    pos_in_row = np.arange(len(nnz_pos)) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )

    test_idx = np.zeros((u_pad, T), dtype=np.int32)
    test_valid = np.zeros((u_pad, T), dtype=bool)
    test_idx[row_of, pos_in_row] = test_csr.indices[nnz_pos].astype(np.int32)
    test_valid[row_of, pos_in_row] = True

    tr_lengths = np.diff(train_csr.indptr)[users]
    Ptr = max(1, int(tr_lengths.max()) if len(tr_lengths) else 1)
    train_idx = np.full((u_pad, Ptr), n_items, dtype=np.int32)
    if tr_lengths.sum():
        tstarts = train_csr.indptr[users]
        tnnz = (
            np.repeat(tstarts, tr_lengths)
            + np.arange(int(tr_lengths.sum()))
            - np.repeat(np.cumsum(tr_lengths) - tr_lengths, tr_lengths)
        )
        trow_of = np.repeat(np.arange(len(users)), tr_lengths)
        tpos = np.arange(len(tnnz)) - np.repeat(
            np.cumsum(tr_lengths) - tr_lengths, tr_lengths
        )
        train_idx[trow_of, tpos] = train_csr.indices[tnnz].astype(np.int32)

    user_ids = np.zeros(u_pad, dtype=np.int32)
    user_ids[: len(users)] = users

    return _RankTier(
        jnp.asarray(user_ids),
        jnp.asarray(test_idx),
        jnp.asarray(test_valid),
        jnp.asarray(train_idx),
        row_of,
        pos_in_row,
        nnz_pos,
    )


def _csr_fingerprint(m) -> tuple:
    """Content checksum guarding identity-keyed caches against in-place
    mutation of a caller's matrix (shared CRC32 scheme — catches
    sum-preserving edits like swapping entries between rows)."""
    from lightfm_tpu.sparse import content_fingerprint

    return content_fingerprint(m)


def _prepare_rank_tiers(test_csr, train_csr, user_block: int, cache=None):
    """Tiered, device-staged rank inputs; memoized across metric calls.

    The cache key is the IDENTITY of the test/train matrices (weakref-
    guarded against id reuse) plus shape/nnz and a content checksum (so
    in-place mutation between calls misses rather than returning stale
    ranks) — the standard per-epoch evaluation loop passes the same
    matrices every call, so precision@k, recall@k, auc and reciprocal_rank
    after the first call skip all host padding and host->device transfer.
    The prep depends only on the matrices, never on model state.
    """
    import weakref

    key = None
    if cache is not None:
        key = (
            "rank_prep", id(test_csr), id(train_csr),
            test_csr.shape, test_csr.nnz, train_csr.nnz, user_block,
            _csr_fingerprint(test_csr), _csr_fingerprint(train_csr),
        )
        hit = cache.get(key)
        if hit is not None:
            ref_t, ref_tr, tiers = hit
            if ref_t() is test_csr and ref_tr() is train_csr:
                return tiers
    # Only users WITH test interactions are ranked (the reference's kernel
    # does per-test-row work only, template:1232-1323; scoring the rest of
    # the catalog for test-empty users would be pure waste).
    users = np.flatnonzero(np.diff(test_csr.indptr) > 0)
    tr_lengths = np.diff(train_csr.indptr)
    tiers = [
        _build_tier(test_csr, train_csr, tier_users, user_block)
        for tier_users in _split_degree_tiers(tr_lengths, users)
        if len(tier_users)
    ]
    if cache is not None:
        # Evict entries for the same matrices with a stale checksum (the
        # caller mutated them in place), and any rank_prep entries whose
        # matrices are gone — dead entries would otherwise pin their
        # device-resident tier arrays until an unrelated cache miss.
        for k in [
            k for k, v in cache.items()
            if (isinstance(k, tuple) and k[:3] == key[:3] and k != key)
            or (
                isinstance(k, tuple) and k and k[0] == "rank_prep"
                and isinstance(v, tuple) and len(v) == 3
                and isinstance(v[0], weakref.ref)
                and (v[0]() is None or v[1]() is None)
            )
        ]:
            del cache[k]
        cache[key] = (weakref.ref(test_csr), weakref.ref(train_csr), tiers)
        # Cap LIVE entries too: a caller streaming fresh (still-referenced)
        # matrices through every metric call would otherwise accumulate
        # device-resident tiers without bound.  Insertion order = age.
        prep_keys = [
            k for k in cache if isinstance(k, tuple) and k and k[0] == "rank_prep"
        ]
        for k in prep_keys[: max(0, len(prep_keys) - 16)]:
            del cache[k]
    return tiers


def predict_ranks_padded(
    state: ModelState,
    user_feats,
    item_feats,
    test_csr,
    train_csr,
    user_block: int = 256,
    item_block: int = 8192,
    cache=None,
) -> np.ndarray:
    """Compute ranks for every nnz of ``test_csr``; returns data aligned with
    the CSR's data array (the layout the reference writes into,
    `lightfm/lightfm.py:968-985`).

    Users are processed in train-degree tiers (so one very heavy user does
    not widen everyone's exclusion padding) and the host prep is memoized in
    ``cache`` when given (keyed by matrix identity; see
    :func:`_prepare_rank_tiers`).
    """
    n_users, n_items = test_csr.shape
    if test_csr.nnz == 0:
        return np.zeros(0, dtype=np.float32)

    out = np.empty(test_csr.nnz, dtype=np.float32)
    for tier in _prepare_rank_tiers(test_csr, train_csr, user_block, cache):
        T = tier.test_idx.shape[1]
        ub = int(min(user_block, tier.user_ids.shape[0]))
        args = (
            state, user_feats, item_feats,
            tier.user_ids, tier.test_idx, tier.test_valid, tier.train_idx,
        )
        if T <= COUNT_T_LIMIT and jax.default_backend() == "tpu":
            # Pallas-fused path: score tiles never leave VMEM; any catalog
            # size.
            ranks = _ranks_fused(
                *args, n_items=int(n_items), user_block=ub, item_block=2048
            )
        elif n_items <= FLAT_CATALOG_LIMIT:
            ranks = _ranks_flat(*args, n_items=int(n_items), user_block=ub)
        else:
            ranks = _ranks_blocked(
                *args,
                n_items=int(n_items),
                user_block=ub,
                item_block=int(item_block),
            )
        ranks = np.asarray(ranks)
        out[tier.nnz_pos] = ranks[tier.row_of, tier.pos_in_row]
    return out
