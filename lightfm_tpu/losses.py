"""Batched training steps for the four losses: logistic, BPR, WARP, WARP-kOS.

TPU-native reformulation of the reference's per-sample Hogwild fit loops
(``fit_logistic`` template:694-781, ``fit_warp`` :784-912, ``fit_warp_kos``
:915-1071, ``fit_bpr`` :1074-1182).  Instead of sequential sample-at-a-time
SGD with racy shared-memory writes, each step processes a whole minibatch:

- WARP's "sample negatives until a margin violator is found" loop becomes a
  single [B, max_sampled] negative draw; the first violating non-positive per
  row is selected and the loss re-weighted by ``log(floor((n_items-1)/
  (draws used)))``, exactly the reference's rank estimator (template:855-885);
- BPR's rejection sampling from the empirical positive item distribution
  (template:1123-1127) becomes a [B, tries] draw with first-accept selection;
- k-OS's "sample n positives, qsort, take the k-th best" (template:969-1003)
  becomes a masked batched sort.

The gradient structure matches ``update`` (template:454-534) and
``warp_update`` (template:537-649): per-touch gradients are (feature weight x
loss x counterpart representation component), applied through
:func:`lightfm_tpu.ops.updates.sparse_update`.  Equivalence to the reference
is statistical, not bitwise — the same bar the reference applies to its own
Hogwild parallelism (tests/test_movielens.py:536 in the reference).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightfm_tpu.config import MAX_LOSS, Hyperparams
from lightfm_tpu.ops.representation import batch_representation, score_pairs
from lightfm_tpu.ops.updates import sparse_update
from lightfm_tpu.sparse import PaddedRows, PaddedSortedRows, in_positives
from lightfm_tpu.state import ModelState


class Batch(NamedTuple):
    user_ids: jax.Array  # int32 [B]
    item_ids: jax.Array  # int32 [B]
    y: jax.Array  # f32 [B]
    weight: jax.Array  # f32 [B]
    valid: jax.Array  # bool [B]


# ---------------------------------------------------------------------------
# Update application helpers
# ---------------------------------------------------------------------------


def _flatten_touches(feats: PaddedRows, rows: jax.Array, g: jax.Array, mask: jax.Array):
    """Expand per-sample gradients to per-(sample, feature-slot) touches.

    rows [B], g [B, D] or [B], mask [B] -> idx [B*P], w [B*P], g [B*P, D?],
    touch_mask [B*P].  Touch weights are the RAW feature weights (the
    reference multiplies by scale only on the read path, not in updates;
    template:311 vs :366).
    """
    idx = feats.idx[rows]  # [B, P]
    w = feats.wts[rows]
    P = idx.shape[1]
    tmask = mask[:, None] & (w != 0)
    if g.ndim == 2:
        g_exp = jnp.broadcast_to(g[:, None, :], (g.shape[0], P, g.shape[1]))
        g_flat = g_exp.reshape(-1, g.shape[1])
    else:
        g_flat = jnp.broadcast_to(g[:, None], (g.shape[0], P)).reshape(-1)
    return idx.reshape(-1), w.reshape(-1), g_flat, tmask.reshape(-1)


def _update_scales(state: ModelState, hp: Hyperparams, sum_lr, n_touch, n_updates):
    """Batched analogue of the per-example scale bump (template:528-534).

    The reference multiplies each scale by ``(1 + alpha * avg_lr)`` once per
    example; we apply the batch-average learning rate raised to the number of
    examples actually updated.
    """
    if hp.item_alpha == 0.0 and hp.user_alpha == 0.0:
        return state
    avg_lr = sum_lr / jnp.maximum(n_touch, 1.0)
    item_scale = state.item_scale * jnp.power(1.0 + hp.item_alpha * avg_lr, n_updates)
    user_scale = state.user_scale * jnp.power(1.0 + hp.user_alpha * avg_lr, n_updates)
    return state._replace(item_scale=item_scale, user_scale=user_scale)


def _run_updates(state: ModelState, hp: Hyperparams, item_touches, user_touches, upd_mask):
    """Apply a list of (idx, w, g_emb, g_bias, mask) touch groups per table."""
    kw = dict(
        adadelta=hp.adadelta,
        learning_rate=hp.learning_rate,
        rho=hp.rho,
        eps=hp.epsilon,
    )
    sum_lr = 0.0
    n_touch = 0.0

    # Item table: concatenate all touch groups into one scatter pass.
    i_idx = jnp.concatenate([t[0] for t in item_touches])
    i_w = jnp.concatenate([t[1] for t in item_touches])
    i_ge = jnp.concatenate([t[2] for t in item_touches])
    i_gb = jnp.concatenate([t[3] for t in item_touches])
    i_m = jnp.concatenate([t[4] for t in item_touches])

    emb, eg, em, lr1, c1 = sparse_update(
        state.item_embeddings,
        state.item_embedding_gradients,
        state.item_embedding_momentum,
        i_idx, i_w, i_ge, i_m, alpha=hp.item_alpha, **kw,
    )
    bias, bg, bm, lr2, c2 = sparse_update(
        state.item_biases,
        state.item_bias_gradients,
        state.item_bias_momentum,
        i_idx, i_w, i_gb, i_m, alpha=hp.item_alpha, **kw,
    )
    state = state._replace(
        item_embeddings=emb, item_embedding_gradients=eg, item_embedding_momentum=em,
        item_biases=bias, item_bias_gradients=bg, item_bias_momentum=bm,
    )
    sum_lr += lr1 + lr2
    n_touch += c1 + c2

    u_idx, u_w, u_ge, u_gb, u_m = user_touches
    emb, eg, em, lr1, c1 = sparse_update(
        state.user_embeddings,
        state.user_embedding_gradients,
        state.user_embedding_momentum,
        u_idx, u_w, u_ge, u_m, alpha=hp.user_alpha, **kw,
    )
    bias, bg, bm, lr2, c2 = sparse_update(
        state.user_biases,
        state.user_bias_gradients,
        state.user_bias_momentum,
        u_idx, u_w, u_gb, u_m, alpha=hp.user_alpha, **kw,
    )
    state = state._replace(
        user_embeddings=emb, user_embedding_gradients=eg, user_embedding_momentum=em,
        user_biases=bias, user_bias_gradients=bg, user_bias_momentum=bm,
    )
    sum_lr += lr1 + lr2
    n_touch += c1 + c2

    n_updates = jnp.sum(upd_mask.astype(jnp.float32))
    return _update_scales(state, hp, sum_lr, n_touch, n_updates)


def _apply_pointwise(
    state, hp, user_feats, item_feats, uid, iid, u_rep, i_rep, loss, upd_mask
):
    """Gradient step of the logistic loss (``update``, template:454-534).

    item features: grad = loss * user_component; bias grad = loss.
    user features: grad = loss * item_component; bias grad = loss.
    """
    ii, iw, ige, imask = _flatten_touches(item_feats, iid, loss[:, None] * u_rep, upd_mask)
    _, _, igb, _ = _flatten_touches(item_feats, iid, loss, upd_mask)

    ui, uw, uge, umask = _flatten_touches(user_feats, uid, loss[:, None] * i_rep, upd_mask)
    _, _, ugb, _ = _flatten_touches(user_feats, uid, loss, upd_mask)

    return _run_updates(
        state, hp,
        item_touches=[(ii, iw, ige, igb, imask)],
        user_touches=(ui, uw, uge, ugb, umask),
        upd_mask=upd_mask,
    )


def _apply_pairwise(
    state, hp, user_feats, item_feats, uid, pos_iid, neg_iid,
    u_rep, p_rep, n_rep, loss, upd_mask,
):
    """Gradient step of the ranking losses (``warp_update``, template:537-649).

    positive item: grad = -loss * user;  negative item: grad = +loss * user;
    user: grad = loss * (neg - pos);  biases analogous with component = 1.
    """
    pi, pw, pge, pmask = _flatten_touches(item_feats, pos_iid, -loss[:, None] * u_rep, upd_mask)
    _, _, pgb, _ = _flatten_touches(item_feats, pos_iid, -loss, upd_mask)
    ni, nw, nge, nmask = _flatten_touches(item_feats, neg_iid, loss[:, None] * u_rep, upd_mask)
    _, _, ngb, _ = _flatten_touches(item_feats, neg_iid, loss, upd_mask)

    ug = loss[:, None] * (n_rep - p_rep)
    ui, uw, uge, umask = _flatten_touches(user_feats, uid, ug, upd_mask)
    _, _, ugb, _ = _flatten_touches(user_feats, uid, loss, upd_mask)

    return _run_updates(
        state, hp,
        item_touches=[(pi, pw, pge, pgb, pmask), (ni, nw, nge, ngb, nmask)],
        user_touches=(ui, uw, uge, ugb, umask),
        upd_mask=upd_mask,
    )


# ---------------------------------------------------------------------------
# Loss steps
# ---------------------------------------------------------------------------


def logistic_step(
    state: ModelState,
    batch: Batch,
    user_feats: PaddedRows,
    item_feats: PaddedRows,
    positives: Optional[PaddedSortedRows],
    train_items: Optional[jax.Array],
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched sigmoid regression step (``fit_logistic``, template:694-781)."""
    del positives, train_items, key
    u_rep, u_b = batch_representation(
        state.user_embeddings, state.user_biases, user_feats, batch.user_ids, state.user_scale
    )
    i_rep, i_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, batch.item_ids, state.item_scale
    )
    pred = jax.nn.sigmoid(score_pairs(u_rep, u_b, i_rep, i_b))
    # Any value <= 0 is a negative interaction (template:751-758).
    y01 = (batch.y > 0).astype(jnp.float32)
    loss = batch.weight * (pred - y01)
    return _apply_pointwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids,
        u_rep, i_rep, loss, batch.valid,
    )


def _warp_negative_search(
    state, item_feats, positives, uid, u_rep, u_b, pos_pred, key, hp
):
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
    neg_ids = jax.random.randint(key, (B, K), 0, n_items, dtype=jnp.int32)
    nf_rep, nf_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, neg_ids, state.item_scale
    )  # [B, K, D], [B, K]
    neg_pred = jnp.einsum("bd,bkd->bk", u_rep, nf_rep) + u_b[:, None] + nf_b
    violates = neg_pred > pos_pred[:, None] - 1.0
    is_pos = in_positives(positives, uid[:, None], neg_ids)
    cand = violates & (~is_pos)
    found = cand.any(axis=-1)
    j = jnp.argmax(cand, axis=-1)  # first violating draw
    sampled = (j + 1).astype(jnp.float32)
    rank_weight = jnp.log(jnp.maximum(1.0, jnp.floor((n_items - 1) / sampled)))
    neg_id = jnp.take_along_axis(neg_ids, j[:, None], axis=-1)[:, 0]
    n_rep = jnp.take_along_axis(nf_rep, j[:, None, None], axis=1)[:, 0]
    return neg_id, n_rep, found, rank_weight


def warp_step(
    state: ModelState,
    batch: Batch,
    user_feats: PaddedRows,
    item_feats: PaddedRows,
    positives: PaddedSortedRows,
    train_items: Optional[jax.Array],
    hp: Hyperparams,
    key: jax.Array,
) -> ModelState:
    """Batched WARP step (``fit_warp``, template:784-912)."""
    del train_items
    upd_base = batch.valid & (batch.y > 0)  # template:831
    u_rep, u_b = batch_representation(
        state.user_embeddings, state.user_biases, user_feats, batch.user_ids, state.user_scale
    )
    p_rep, p_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, batch.item_ids, state.item_scale
    )
    pos_pred = score_pairs(u_rep, u_b, p_rep, p_b)

    neg_id, n_rep, found, rank_weight = _warp_negative_search(
        state, item_feats, positives, batch.user_ids, u_rep, u_b, pos_pred, key, hp
    )
    loss = jnp.minimum(batch.weight * rank_weight, MAX_LOSS)  # template:881-885
    return _apply_pairwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids, neg_id,
        u_rep, p_rep, n_rep, loss, upd_base & found,
    )


def bpr_step(
    state: ModelState,
    batch: Batch,
    user_feats: PaddedRows,
    item_feats: PaddedRows,
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
    n_examples = train_items.shape[0]
    T = hp.bpr_tries
    r = jax.random.randint(key, (batch.user_ids.shape[0], T), 0, n_examples, dtype=jnp.int32)
    cand = train_items[r]  # [B, T]
    ok = ~in_positives(positives, batch.user_ids[:, None], cand)
    j = jnp.where(ok.any(-1), jnp.argmax(ok, axis=-1), T - 1)
    neg_id = jnp.take_along_axis(cand, j[:, None], axis=-1)[:, 0]

    u_rep, u_b = batch_representation(
        state.user_embeddings, state.user_biases, user_feats, batch.user_ids, state.user_scale
    )
    p_rep, p_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, batch.item_ids, state.item_scale
    )
    n_rep, n_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, neg_id, state.item_scale
    )
    pos_pred = score_pairs(u_rep, u_b, p_rep, p_b)
    neg_pred = score_pairs(u_rep, u_b, n_rep, n_b)
    loss = batch.weight * (1.0 - jax.nn.sigmoid(pos_pred - neg_pred))  # template:1158
    return _apply_pairwise(
        state, hp, user_feats, item_feats, batch.user_ids, batch.item_ids, neg_id,
        u_rep, p_rep, n_rep, loss, upd,
    )


def warp_kos_step(
    state: ModelState,
    batch: Batch,
    user_feats: PaddedRows,
    item_feats: PaddedRows,
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

    u_rep, u_b = batch_representation(
        state.user_embeddings, state.user_biases, user_feats, uid, state.user_scale
    )

    # Sample n positive candidates with replacement (template:977-995).
    r = jax.random.randint(
        kpos, (B, hp.n), 0, jnp.maximum(lens, 1)[:, None], dtype=jnp.int32
    )
    user_rows = positives.idx[uid]  # [B, P] sorted positives
    cand = jnp.take_along_axis(user_rows, r, axis=-1)  # [B, n]
    cand = jnp.minimum(cand, item_feats.n_rows - 1)  # clamp sentinel for empty rows
    pc_rep, pc_b = batch_representation(
        state.item_embeddings, state.item_biases, item_feats, cand, state.item_scale
    )
    scores = jnp.einsum("bd,bnd->bn", u_rep, pc_rep) + u_b[:, None] + pc_b

    no_pos = jnp.minimum(hp.n, lens)  # template:976
    draw_valid = jnp.arange(hp.n)[None, :] < no_pos[:, None]
    order = jnp.argsort(jnp.where(draw_valid, -scores, jnp.inf), axis=-1)
    pick = jnp.maximum(jnp.minimum(hp.k, no_pos) - 1, 0)  # template:1002
    sel = jnp.take_along_axis(order, pick[:, None], axis=-1)[:, 0]

    pos_id = jnp.take_along_axis(cand, sel[:, None], axis=-1)[:, 0]
    pos_pred = jnp.take_along_axis(scores, sel[:, None], axis=-1)[:, 0]
    p_rep = jnp.take_along_axis(pc_rep, sel[:, None, None], axis=1)[:, 0]

    neg_id, n_rep, found, rank_weight = _warp_negative_search(
        state, item_feats, positives, uid, u_rep, u_b, pos_pred, kneg, hp
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
