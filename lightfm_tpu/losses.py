"""Batched training steps for the four losses: logistic, BPR, WARP, WARP-kOS.

TPU-native reformulation of the reference's per-sample Hogwild fit loops
(``fit_logistic`` template:694-781, ``fit_warp`` :784-912, ``fit_warp_kos``
:915-1071, ``fit_bpr`` :1074-1182).  Instead of sequential sample-at-a-time
SGD with racy shared-memory writes, each step processes a whole minibatch:

- WARP's "sample negatives until a margin violator is found" loop becomes a
  single slot-major [max_sampled, B] negative draw; the first violating
  non-positive per row is selected and the loss re-weighted by
  ``log(floor((n_items-1)/(draws used)))``, exactly the reference's rank
  estimator (template:855-885);
- BPR's rejection sampling from the empirical positive item distribution
  (template:1123-1127) becomes a [B, tries] draw with first-accept selection;
- k-OS's "sample n positives, qsort, take the k-th best" (template:969-1003)
  becomes a masked batched sort.

Gradients match ``update`` (template:454-534) and ``warp_update``
(template:537-649).  Representations and tables carry the bias as the LAST
column of the width-padded layout (state.table_width), so one fused [B, W]
gradient per table covers what the reference splits into ``update_biases``
+ per-component ``update_features`` calls.
Equivalence to the reference is statistical, not bitwise — the same bar the
reference applies to its own Hogwild parallelism (its test_movielens.py:536).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightfm_tpu.config import MAX_LOSS, Hyperparams
from lightfm_tpu.ops.representation import (
    batch_representation,
    score_pairs,
    with_unit_bias,
)
from lightfm_tpu.ops.updates import sparse_update
from lightfm_tpu.sparse import (
    ChunkedRows,
    IdentityRows,
    PaddedSortedRows,
    in_positives,
    in_positives_slots,
)
from lightfm_tpu.state import ModelState


class Batch(NamedTuple):
    user_ids: jax.Array  # int32 [B]
    item_ids: jax.Array  # int32 [B]
    y: jax.Array  # f32 [B]
    weight: jax.Array  # f32 [B]
    valid: jax.Array  # bool [B]


def _scales(state: ModelState, hp: Hyperparams):
    """Lazy-reg scale accumulators, or (None, None) when alpha == 0.

    Static fast path: with no regularisation the scales are exactly 1
    forever, and skipping the multiply avoids a full copy of every gathered
    representation (~15% of a WARP epoch on v5e).
    """
    if hp.item_alpha == 0.0 and hp.user_alpha == 0.0:
        return None, None
    # Reads happen before the step's scale bump, and maybe_fold_scales runs
    # every step, so log scales stay <= LOG_MAX_REG_SCALE here: exp is finite.
    return jnp.exp(state.user_log_scale), jnp.exp(state.item_log_scale)




def _flatten_touches(features, rows: jax.Array, g: jax.Array, mask: jax.Array):
    """Expand per-sample [B, D+1] gradients to per-(sample, feature) touches.

    Identity features touch exactly their own row: no expansion needed.
    General features expand to [B*P] touches with the RAW feature weights
    (the reference multiplies by scale only on the read path, template:311
    vs :366).

    Returns ``(touches, overflow)`` where ``touches`` is the flat
    (idx, w, g, mask) tuple for the dense tier and ``overflow`` is None
    except for :class:`ChunkedRows`, whose over-width feature tail is
    applied chunk-by-chunk in :func:`_run_updates` (memory stays bounded).
    """
    if isinstance(features, IdentityRows):
        return (rows, jnp.ones_like(rows, dtype=g.dtype), g, mask), None
    if isinstance(features, ChunkedRows):
        base, _ = _flatten_touches(features.base, rows, g, mask)
        return base, (features.over_slot[rows], g, mask)
    idx = features.idx[rows]  # [B, P]
    w = features.wts[rows]
    B, P = idx.shape
    tmask = mask[:, None] & (w != 0)
    g_flat = jnp.broadcast_to(g[:, None, :], (B, P, g.shape[1])).reshape(B * P, -1)
    return (idx.reshape(-1), w.reshape(-1), g_flat, tmask.reshape(-1)), None


def _update_scales(state: ModelState, hp: Hyperparams, sum_lr, n_touch, n_updates):
    """Batched analogue of the per-example scale bump (template:528-534)."""
    if hp.item_alpha == 0.0 and hp.user_alpha == 0.0:
        return state
    avg_lr = sum_lr / jnp.maximum(n_touch, 1.0)
    # Log-space accumulation: (1 + alpha*avg_lr)^n_updates per batch
    # overflows f32 at extreme alpha; log1p keeps it exact.
    return state._replace(
        item_log_scale=state.item_log_scale
        + n_updates * jnp.log1p(hp.item_alpha * avg_lr),
        user_log_scale=state.user_log_scale
        + n_updates * jnp.log1p(hp.user_alpha * avg_lr),
    )


def _overflow_chunks(table, acc, mom, feats: ChunkedRows, specs, alpha, kw):
    """Apply the over-width feature tail of :class:`ChunkedRows` touches.

    ``specs`` is a list of (slots [B], g [B, W], mask [B]) touch sources
    sharing ``feats``.  Chunks are scanned so the working set stays
    [touches, chunk_width] regardless of how wide the heaviest row is.
    """
    slots = jnp.concatenate([s[0] for s in specs])
    g = jnp.concatenate([s[1] for s in specs])
    mask = jnp.concatenate([s[2] for s in specs])
    T = slots.shape[0]

    def body(carry, xs):
        table, acc, mom, sum_lr, cnt = carry
        idx_c, wts_c = xs  # [M+1, C]
        idx = idx_c[slots]  # [T, C]
        w = wts_c[slots]
        tmask = mask[:, None] & (w != 0)
        C = idx.shape[1]
        g_flat = jnp.broadcast_to(g[:, None, :], (T, C, g.shape[1])).reshape(T * C, -1)
        table, acc, mom, lr, n = sparse_update(
            table, acc, mom, idx.reshape(-1), w.reshape(-1), g_flat,
            tmask.reshape(-1), alpha=alpha, **kw,
        )
        return (table, acc, mom, sum_lr + lr, cnt + n), None

    init = (table, acc, mom, jnp.float32(0.0), jnp.float32(0.0))
    (table, acc, mom, sum_lr, cnt), _ = jax.lax.scan(
        body, init, (feats.over_idx, feats.over_wts)
    )
    return table, acc, mom, sum_lr, cnt


def _run_updates(state, hp, item_feats, item_touches, user_feats, user_touches, upd_mask):
    """One fused sparse optimizer pass per table (+ chunked overflow tails)."""
    kw = dict(
        adadelta=hp.adadelta,
        learning_rate=hp.learning_rate,
        rho=hp.rho,
        eps=hp.epsilon,
        emb_dim=hp.no_components,
        # Scale bookkeeping averages lr over BOTH tables' touches, so the
        # zero-stats fast path is only allowed when neither alpha is set.
        need_stats=hp.item_alpha != 0.0 or hp.user_alpha != 0.0,
    )
    flat = [t[0] for t in item_touches]
    if len(flat) == 1:
        i_idx, i_w, i_g, i_m = flat[0]
    else:
        i_idx = jnp.concatenate([t[0] for t in flat])
        i_w = jnp.concatenate([t[1] for t in flat])
        i_g = jnp.concatenate([t[2] for t in flat])
        i_m = jnp.concatenate([t[3] for t in flat])

    table, acc, mom, lr_i, cnt_i = sparse_update(
        state.item_table, state.item_acc, state.item_mom,
        i_idx, i_w, i_g, i_m, alpha=hp.item_alpha, **kw,
    )
    item_over = [t[1] for t in item_touches if t[1] is not None]
    if item_over:
        table, acc, mom, lr_o, cnt_o = _overflow_chunks(
            table, acc, mom, item_feats, item_over, hp.item_alpha, kw
        )
        lr_i, cnt_i = lr_i + lr_o, cnt_i + cnt_o
    state = state._replace(item_table=table, item_acc=acc, item_mom=mom)

    (u_idx, u_w, u_g, u_m), user_over = user_touches
    table, acc, mom, lr_u, cnt_u = sparse_update(
        state.user_table, state.user_acc, state.user_mom,
        u_idx, u_w, u_g, u_m, alpha=hp.user_alpha, **kw,
    )
    if user_over is not None:
        table, acc, mom, lr_o, cnt_o = _overflow_chunks(
            table, acc, mom, user_feats, [user_over], hp.user_alpha, kw
        )
        lr_u, cnt_u = lr_u + lr_o, cnt_u + cnt_o
    state = state._replace(user_table=table, user_acc=acc, user_mom=mom)

    if hp.item_alpha == 0.0 and hp.user_alpha == 0.0:
        return state
    n_updates = jnp.sum(upd_mask.astype(jnp.float32))
    return _update_scales(state, hp, lr_i + lr_u, cnt_i + cnt_u, n_updates)


def _apply_pointwise(state, hp, user_feats, item_feats, uid, iid, u_rep, i_rep, loss, upd):
    """Gradient step of the logistic loss (``update``, template:454-534).

    item: grad = loss * user_component per embedding column, loss for bias.
    user: symmetric with item components.
    """
    # with_unit_bias puts 1 in the bias slot, so loss * row IS the fused
    # [emb grads | bias grad] layout (zero-pad cols get zero gradients).
    g_item = loss[:, None] * with_unit_bias(u_rep)
    g_user = loss[:, None] * with_unit_bias(i_rep)
    item_t = _flatten_touches(item_feats, iid, g_item, upd)
    user_t = _flatten_touches(user_feats, uid, g_user, upd)
    return _run_updates(state, hp, item_feats, [item_t], user_feats, user_t, upd)


def _apply_pairwise(
    state, hp, user_feats, item_feats, uid, pos_iid, neg_iid,
    u_rep, p_rep, n_rep, loss, upd,
):
    """Gradient step of the ranking losses (``warp_update``, template:537-649).

    positive item: -loss * user;  negative item: +loss * user;
    user: loss * (neg - pos);  bias column analogous with component = 1.
    """
    lu = loss[:, None] * with_unit_bias(u_rep)  # [B, W]
    pos_t = _flatten_touches(item_feats, pos_iid, -lu, upd)
    neg_t = _flatten_touches(item_feats, neg_iid, lu, upd)
    g_user = loss[:, None] * with_unit_bias(n_rep - p_rep)
    user_t = _flatten_touches(user_feats, uid, g_user, upd)
    return _run_updates(state, hp, item_feats, [pos_t, neg_t], user_feats, user_t, upd)


# ---------------------------------------------------------------------------
# Loss steps
# ---------------------------------------------------------------------------


def logistic_step(
    state: ModelState,
    batch: Batch,
    user_feats,
    item_feats,
    positives: Optional[PaddedSortedRows],
    train_items: Optional[jax.Array],
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched sigmoid regression step (``fit_logistic``, template:694-781)."""
    del positives, train_items, key
    u_scale, i_scale = _scales(state, hp)
    u_rep = batch_representation(state.user_table, user_feats, batch.user_ids, u_scale)
    i_rep = batch_representation(state.item_table, item_feats, batch.item_ids, i_scale)
    pred = jax.nn.sigmoid(score_pairs(u_rep, i_rep))
    # Any value <= 0 is a negative interaction (template:751-758).
    y01 = (batch.y > 0).astype(jnp.float32)
    loss = batch.weight * (pred - y01)
    return _apply_pointwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids,
        u_rep, i_rep, loss, batch.valid,
    )


def _score_candidates(u_rep: jax.Array, reps_flat: jax.Array, K: int) -> jax.Array:
    """[K, B] scores of FLAT candidate reps ([K*B, W], SLOT-major: candidate
    k of user b at row k*B + b).

    Slot-major layout is the whole trick: the user block broadcasts over the
    LEADING dim (free — no materialisation, unlike a middle-dim broadcast
    which XLA materialises twice, ~5ms/step measured on v5e), every
    per-slot slice is contiguous, and the dot stays a fused multiply +
    minor-dim reduce in the gather's native [*, W] layout.  The user's bias
    slot is set to 1 so the full-width dot folds the item bias in.
    """
    B, W = u_rep.shape
    u1 = with_unit_bias(u_rep)
    reps3 = reps_flat.reshape(K, B, W)  # free: splits the major dim
    s = jnp.sum(reps3 * u1[None, :, :], axis=-1)  # [K, B]
    return s + u_rep[None, :, -1]


def _pick_flat(reps_flat: jax.Array, j: jax.Array, B: int) -> jax.Array:
    """Row of user b's j[b]-th slot-major candidate: reps_flat[j[b]*B + b].

    Computed as a one-hot masked sum over the (few, static) K slots rather
    than a row gather — a streaming VPU pass over data already in cache beats
    the per-row gather fixed cost (measured ~30ms/epoch on v5e).
    """
    K = reps_flat.shape[0] // B
    reps3 = reps_flat.reshape(K, B, -1)
    onehot = (j[None, :] == jnp.arange(K, dtype=j.dtype)[:, None]).astype(
        reps_flat.dtype
    )  # [K, B]
    return jnp.einsum("kb,kbd->bd", onehot, reps3)


def _select_slot(arr_kb: jax.Array, j: jax.Array) -> jax.Array:
    """arr_kb[j[b], b] for int arrays via one-hot sum (beats a cross-lane
    take_along_axis gather, ~50ms/epoch on v5e)."""
    K = arr_kb.shape[0]
    onehot = j[None, :] == jnp.arange(K, dtype=j.dtype)[:, None]
    return jnp.sum(jnp.where(onehot, arr_kb, 0), axis=0)


def _warp_negative_search(state, item_feats, positives, uid, u_rep, pos_pred, key, hp):
    """Draw max_sampled negatives at once; select the first margin violator.

    Vectorises the reference's sequential sampling loop (template:855-899):
    a draw that violates the margin but is a true positive consumes a trial
    without triggering an update (the `continue` at template:878-879), which
    maps to masking it out of the candidate set while keeping its slot in the
    draw count used by the rank estimator.
    """
    B = uid.shape[0]
    K = hp.max_sampled
    n_items = item_feats.n_rows
    neg_ids = jax.random.randint(key, (K, B), 0, n_items, dtype=jnp.int32)
    nf_flat = batch_representation(
        state.item_table, item_feats, neg_ids.reshape(-1), _scales(state, hp)[1]
    )  # [K*B, W] slot-major
    neg_pred = _score_candidates(u_rep, nf_flat, K)  # [K, B]
    violates = neg_pred > pos_pred[None, :] - 1.0
    is_pos = in_positives_slots(positives, uid, neg_ids)  # [K, B]
    cand = violates & (~is_pos)
    found = cand.any(axis=0)
    j = jnp.argmax(cand, axis=0)  # first violating draw, per user
    sampled = (j + 1).astype(jnp.float32)
    rank_weight = jnp.log(jnp.maximum(1.0, jnp.floor((n_items - 1) / sampled)))
    neg_id = _select_slot(neg_ids, j)
    n_rep = _pick_flat(nf_flat, j, B)
    return neg_id, n_rep, found, rank_weight


def warp_step(
    state: ModelState,
    batch: Batch,
    user_feats,
    item_feats,
    positives: PaddedSortedRows,
    train_items: Optional[jax.Array],
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched WARP step (``fit_warp``, template:784-912).

    The positive item rides the negative-candidates gather ([B, K+1] in one
    pass) so the step pays a single item-table gather and a single scoring
    einsum for all K+1 candidates.
    """
    del train_items
    upd_base = batch.valid & (batch.y > 0)  # template:831
    u_scale, i_scale = _scales(state, hp)
    u_rep = batch_representation(state.user_table, user_feats, batch.user_ids, u_scale)

    B = batch.user_ids.shape[0]
    K = hp.max_sampled
    n_items = item_feats.n_rows
    neg_ids = jax.random.randint(key, (K, B), 0, n_items, dtype=jnp.int32)
    # Slot 0 = the positive; slots 1..K = negatives ([K+1, B] slot-major).
    all_ids = jnp.concatenate([batch.item_ids[None, :], neg_ids], axis=0)
    reps_flat = batch_representation(
        state.item_table, item_feats, all_ids.reshape(-1), i_scale
    )  # [(K+1)*B, W] slot-major
    preds = _score_candidates(u_rep, reps_flat, K + 1)  # [K+1, B]
    pos_pred, neg_pred = preds[0], preds[1:]
    p_rep = reps_flat[:B]  # slot 0: contiguous slice, no gather

    violates = neg_pred > pos_pred[None, :] - 1.0  # template:875
    is_pos = in_positives_slots(positives, batch.user_ids, neg_ids)  # template:878
    cand = violates & (~is_pos)
    found = cand.any(axis=0)
    j = jnp.argmax(cand, axis=0)  # first violating draw, per user
    sampled = (j + 1).astype(jnp.float32)
    rank_weight = jnp.log(jnp.maximum(1.0, jnp.floor((n_items - 1) / sampled)))
    neg_id = _select_slot(neg_ids, j)
    n_rep = _pick_flat(reps_flat, j + 1, B)

    loss = jnp.minimum(batch.weight * rank_weight, MAX_LOSS)  # template:881-885
    return _apply_pairwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids, neg_id,
        u_rep, p_rep, n_rep, loss, upd_base & found,
    )


def bpr_step(
    state: ModelState,
    batch: Batch,
    user_feats,
    item_feats,
    positives: PaddedSortedRows,
    train_items: jax.Array,
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched BPR step (``fit_bpr``, template:1074-1182).

    Negatives are drawn from the EMPIRICAL positive item distribution — a
    random training interaction's item id (template:1123-1127) — with
    rejection of the user's true positives; if every try lands on a positive,
    the last draw is used, matching the reference loop's fall-through.
    """
    upd = batch.valid & (batch.y > 0)  # template:1116
    B = batch.user_ids.shape[0]
    n_examples = train_items.shape[0]
    T = hp.bpr_tries
    r = jax.random.randint(key, (B, T), 0, n_examples, dtype=jnp.int32)
    cand = train_items[r]  # [B, T]
    ok = ~in_positives(positives, batch.user_ids, cand)
    j = jnp.where(ok.any(-1), jnp.argmax(ok, axis=-1), T - 1)
    neg_id = jnp.take_along_axis(cand, j[:, None], axis=-1)[:, 0]

    u_scale, i_scale = _scales(state, hp)
    u_rep = batch_representation(state.user_table, user_feats, batch.user_ids, u_scale)
    # Positive and negative ride ONE slot-major gather + one scoring einsum
    # (the warp_step trick): two separate B-row gathers + two score_pairs
    # measured ~30% slower per epoch on v5e (round-2 verdict #5).
    all_ids = jnp.concatenate([batch.item_ids[None, :], neg_id[None, :]], axis=0)
    reps_flat = batch_representation(
        state.item_table, item_feats, all_ids.reshape(-1), i_scale
    )  # [2B, W] slot-major
    preds = _score_candidates(u_rep, reps_flat, 2)  # [2, B]
    p_rep, n_rep = reps_flat[:B], reps_flat[B:]
    loss = batch.weight * (
        1.0 - jax.nn.sigmoid(preds[0] - preds[1])
    )  # template:1158
    return _apply_pairwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids, neg_id,
        u_rep, p_rep, n_rep, loss, upd,
    )


def warp_kos_step(
    state: ModelState,
    batch: Batch,
    user_feats,
    item_feats,
    positives: PaddedSortedRows,
    train_items: Optional[jax.Array],
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched k-OS WARP step (``fit_warp_kos``, template:915-1071).

    Samples min(n, #positives) of the user's positives with replacement,
    ranks them by score, takes the min(k, #sampled)-th best as the positive,
    then runs the standard WARP negative search.  No sample-weight support
    (`lightfm/lightfm.py:385-388`).
    """
    del train_items
    uid = batch.user_ids
    B = uid.shape[0]
    kpos, kneg = jax.random.split(key)

    lens = positives.lengths[uid]  # [B]
    upd_base = batch.valid & (lens > 0)  # template:972-973

    u_scale, i_scale = _scales(state, hp)
    u_rep = batch_representation(state.user_table, user_feats, uid, u_scale)

    # Sample n positive candidates with replacement (template:977-995),
    # slot-major [n, B] (see _score_candidates).
    r = jax.random.randint(
        kpos, (hp.n, B), 0, jnp.maximum(lens, 1)[None, :], dtype=jnp.int32
    )
    user_rows = positives.idx[uid]  # [B, P] sorted positives
    cand = user_rows[jnp.arange(B, dtype=jnp.int32)[None, :], r]  # [n, B]
    cand = jnp.minimum(cand, item_feats.n_rows - 1)  # clamp sentinel for empty rows
    pc_flat = batch_representation(
        state.item_table, item_feats, cand.reshape(-1), i_scale
    )  # [n*B, W] slot-major
    scores = _score_candidates(u_rep, pc_flat, hp.n)  # [n, B]

    no_pos = jnp.minimum(hp.n, lens)  # template:976
    draw_valid = jnp.arange(hp.n)[:, None] < no_pos[None, :]
    order = jnp.argsort(jnp.where(draw_valid, -scores, jnp.inf), axis=0)
    pick = jnp.maximum(jnp.minimum(hp.k, no_pos) - 1, 0)  # template:1002
    sel = jnp.take_along_axis(order, pick[None, :], axis=0)[0]

    pos_id = jnp.take_along_axis(cand, sel[None, :], axis=0)[0]
    pos_pred = jnp.take_along_axis(scores, sel[None, :], axis=0)[0]
    p_rep = _pick_flat(pc_flat, sel, B)

    neg_id, n_rep, found, rank_weight = _warp_negative_search(
        state, item_feats, positives, uid, u_rep, pos_pred, kneg, hp
    )
    loss = jnp.minimum(rank_weight, MAX_LOSS)  # template:1039-1043 (no weight)
    return _apply_pairwise(
        state, hp, user_feats, item_feats, uid, pos_id, neg_id,
        u_rep, p_rep, n_rep, loss, upd_base & found,
    )


LOSS_STEPS = {
    "logistic": logistic_step,
    "warp": warp_step,
    "bpr": bpr_step,
    "warp-kos": warp_kos_step,
}
