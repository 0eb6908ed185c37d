"""Sparse batched optimizer updates (adagrad / adadelta) with lazy L2.

TPU-native reformulation of ``update_biases`` / ``update_features``
(`_lightfm_fast.pyx.template:337-451`).  The reference applies per-feature
sequential SGD steps inside a Hogwild loop; here a whole minibatch of touches
is applied functionally.

Design note (measured on v5e): inside the training scan XLA lowers the
duplicate-index scatter-adds efficiently (donated loop carries).  THREE
rewrites that win big in isolated scatter microbenchmarks all LOSE measured
end-to-end: sort+segment-sum+unique-scatter (2.7x slower epoch),
sort+indices_are_sorted=True (1.5x slower), and a Pallas one-hot-matmul
block update (1.7x slower, ops/pallas_update.py) — in-scan, XLA overlaps
the unsorted scatters with neighbouring ops, and any per-step sort/reorder
sits on the critical path.  So updates scatter WITH duplicates and let XLA
combine.  The semantics:

- every "touch" is a tuple (table row ``idx``, feature weight ``w``, gradient
  ``g``); duplicates within a batch accumulate via scatter-add;
- masked touches (padding slots, skipped samples) are exact no-ops: their
  scatter-add contribution is 0 and their scatter-mul factor is 1;
- adagrad: ``lr_local = lr/sqrt(acc)`` uses the PRE-batch accumulator for all
  touches (the batched analogue of the reference's sequential read), then
  ``acc += (w*g)^2`` summed over duplicate touches;
- adadelta: ``acc = rho*acc + (1-rho)*sum((w*g)^2)`` treating the batch as one
  step per touched row, ``lr_local`` reads the post-update accumulator exactly
  as the reference does (template:416-434);
- lazy L2 regularisation multiplies touched params by ``(1 + alpha*lr_local)``
  (template:372,387,432,447) via scatter-mul; the global scale bookkeeping
  lives in :mod:`lightfm_tpu.state`.

Returns the summed local learning rate and touch count so callers can update
the lazy-regularisation scale accumulators with the batch-average learning
rate (the batched analogue of template:528-534).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sparse_update(
    table: jax.Array,  # [R, W] or [R]
    acc: jax.Array,
    mom: jax.Array,
    idx: jax.Array,  # int32 [M]
    w: jax.Array,  # f32 [M] feature weights
    g: jax.Array,  # f32 [M, W] or [M] per-touch gradients
    mask: jax.Array,  # bool [M]; False touches are no-ops
    *,
    adadelta: bool,
    learning_rate: float,
    alpha: float,
    rho: float,
    eps: float,
    emb_dim: int | None = None,
    need_stats: bool = True,
):
    """Apply one batched sparse optimizer step to ``table``.

    Returns ``(table, acc, mom, sum_local_lr, n_touches)`` where the last two
    aggregate over unmasked (touch, component) pairs for scale bookkeeping.
    ``emb_dim`` marks the active columns of a width-padded table (embedding
    cols [0, emb_dim) + bias col -1; see lightfm_tpu.state.table_width) so the
    bookkeeping excludes the zero-padding columns; None means all columns.
    """
    squeeze = table.ndim == 1
    if squeeze:
        table, acc, mom, g = table[:, None], acc[:, None], mom[:, None], g[:, None]

    W = table.shape[1]

    mask_f = mask.astype(table.dtype)[:, None]  # [M, 1]
    wg = (w * mask)[:, None] * g  # [M, W]; masked touches contribute 0

    # Small-table fast path: replace the scatter pair with one-hot MXU
    # matmuls.  TPU scatters serialize per updated row (~25ns each), so a
    # quickstart-sized step burns ~half its ~128us wall in scatters; dense
    # [M, R] one-hot contractions are a few microseconds.  Mathematically
    # identical to the scatter formulation (adagrad's lr reads the
    # pre-batch accumulator, which is row-constant, so per-row sums
    # commute); f32 summation order differs only.
    # The fast path returns zero sum_lr/n_touches, which is only sound when
    # NO table in the step needs the lazy-L2 scale bookkeeping (the bump
    # averages local lr over ALL of the step's touches, both tables) —
    # callers signal that via need_stats.
    R = table.shape[0]
    if (
        not adadelta
        and alpha == 0.0
        and not need_stats
        and R * W <= (1 << 19)
        and idx.shape[0] * R <= (32 << 20)
    ):
        onehot = (
            idx[:, None] == jnp.arange(R, dtype=idx.dtype)[None, :]
        ).astype(table.dtype)  # [M, R]
        s1 = jnp.matmul(onehot.T, wg, preferred_element_type=jnp.float32)
        s2 = jnp.matmul(onehot.T, wg * wg, preferred_element_type=jnp.float32)
        table = table - learning_rate * jax.lax.rsqrt(acc) * s1
        acc = acc + s2
        if squeeze:
            table, acc, mom = table[:, 0], acc[:, 0], mom[:, 0]
        # alpha == 0: callers skip the scale bookkeeping entirely.
        zero = jnp.float32(0.0)
        return table, acc, mom, zero, zero

    # (The LIGHTFM_TPU_PALLAS_UPDATE opt-in that routed this scatter through
    # the UNSORTED Pallas wrapper was removed in round 5: composed epochs
    # measured 1.3x slower and the composition crashed with a runtime
    # INVALID_ARGUMENT at B=131072 — the sorted kernel on the fast path is
    # the one that earns its keep.  See doc/roadmap.md.)
    if not adadelta:
        # adagrad (template:376-389, 436-449); accumulators initialised to 1
        # at model init (`lightfm/lightfm.py:308-312`).
        lr_local = learning_rate * jax.lax.rsqrt(acc[idx])  # [M, W]
        table = table.at[idx].add(-(lr_local * wg))
        acc = acc.at[idx].add(wg * wg)
    else:
        # adadelta (template:359-374, 417-434).
        rho_f = jnp.where(mask, rho, 1.0)[:, None]
        decay = jnp.broadcast_to(rho_f, wg.shape)
        acc = acc.at[idx].mul(decay)
        acc = acc.at[idx].add((1.0 - rho) * wg * wg)
        lr_local = jnp.sqrt(mom[idx] + eps) * jax.lax.rsqrt(acc[idx] + eps)
        update = lr_local * wg
        mom = mom.at[idx].mul(decay)
        mom = mom.at[idx].add((1.0 - rho) * update * update)
        table = table.at[idx].add(-update)

    if alpha != 0.0:
        # Lazy regularisation boost; masked touches get factor exactly 1.
        table = table.at[idx].mul(1.0 + alpha * lr_local * mask_f)

    if emb_dim is not None and emb_dim + 1 < W:
        col_active = ((jnp.arange(W) < emb_dim) | (jnp.arange(W) == W - 1)).astype(
            jnp.float32
        )
        sum_lr = jnp.sum(lr_local * mask_f * col_active[None, :])
        n_touches = jnp.sum(mask_f) * (emb_dim + 1)
    else:
        sum_lr = jnp.sum(lr_local * mask_f)
        n_touches = jnp.sum(mask_f) * W

    if squeeze:
        table, acc, mom = table[:, 0], acc[:, 0], mom[:, 0]
    return table, acc, mom, sum_lr, n_touches
