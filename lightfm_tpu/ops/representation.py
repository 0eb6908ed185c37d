"""Latent representation and scoring ops.

TPU-native replacement for the reference's scalar loops
``compute_representation`` (`_lightfm_fast.pyx.template:287-317`) and
``compute_prediction_from_repr`` (`template:320-334`): batched gathers plus
einsums that XLA fuses and tiles onto the VPU/MXU.

Representations are ``[..., D+1]`` vectors whose last element is the summed
bias — exactly the reference's layout (template:305, "the last element of the
representation is the bias").  Tables store that layout directly (bias fused
as column D), so the identity-features case is a single row gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightfm_tpu.sparse import ChunkedRows, IdentityRows


def batch_representation(
    table: jax.Array,  # [n_features, W]
    features,
    row_ids: jax.Array,  # int32 [...]
    scale: jax.Array | None = None,
) -> jax.Array:
    """Representations for a batch of rows: ``[..., W]`` incl. bias slot.

    Identity features (the default / pure-MF case, `lightfm/lightfm.py:318-326`)
    skip the feature walk entirely: the representation IS the table row.
    Padding slots of general features have weight 0 and contribute nothing.

    ``scale`` is the lazy-regularisation accumulator; pass ``None`` (the
    static fast path) whenever it is known to be exactly 1 — i.e. alpha == 0,
    or outside training where scales are folded at every epoch end.  A traced
    scale of 1.0 is NOT free: the multiply forces a full copy of the gathered
    rows (~15% of a WARP epoch, measured on v5e).
    """
    if features is None or isinstance(features, IdentityRows):
        # Direct multi-dim gather: with the table width a multiple of 8
        # (state.table_width) this is XLA:TPU's fast path; flattening to 1-D
        # and reshaping back forces a layout copy of the whole result (the
        # (…, K, W) minor-dims retile), measured ~600x slower standalone.
        # ``None`` means identity-by-construction (fast-path callers).
        rows = table[row_ids]
        if scale is not None:
            rows = rows * scale
        return rows
    if isinstance(features, ChunkedRows):
        rep = batch_representation(table, features.base, row_ids, scale)
        slots = features.over_slot[row_ids]  # [...]

        def fold_chunk(acc, xs):
            idx_c, wts_c = xs  # [M+1, C]
            w = wts_c[slots]  # [..., C]; slot M rows are all-zero (no-op)
            if scale is not None:
                w = w * scale
            emb_c = table[idx_c[slots]]  # [..., C, W]
            return acc + jnp.einsum("...p,...pd->...d", w, emb_c), None

        rep, _ = jax.lax.scan(fold_chunk, rep, (features.over_idx, features.over_wts))
        return rep

    idx = features.idx[row_ids]  # [..., P]
    wts = features.wts[row_ids]  # [..., P]
    if scale is not None:
        wts = wts * scale
    emb = table[idx]  # [..., P, W]
    return jnp.einsum("...p,...pd->...d", wts, emb)


def with_unit_bias(user_rep: jax.Array) -> jax.Array:
    """Replace the bias slot with 1 so a FULL-width dot against an item
    representation yields ``dot(emb, emb) + item_bias`` directly.

    Avoids slicing the (large) item side's minor dimension — a strided
    lane-slice on TPU materialises a copy of the whole operand.
    """
    return jnp.concatenate(
        [user_rep[..., :-1], jnp.ones_like(user_rep[..., -1:])], axis=-1
    )


def score_pairs(user_rep: jax.Array, item_rep: jax.Array) -> jax.Array:
    """dot(user_emb, item_emb) + user_bias + item_bias (template:320-334).

    Inputs are [..., W] representations with the bias in the last slot
    (zero-padding columns contribute nothing).
    """
    return (
        jnp.einsum("...d,...d->...", with_unit_bias(user_rep), item_rep)
        + user_rep[..., -1]
    )


def full_representations(
    table: jax.Array,
    features,
    scale: jax.Array | float = 1.0,
    block: int = 8192,
):
    """Representations for ALL rows of a feature matrix, computed in blocks.

    The sparse-dense matmul ``features @ table`` realised as blocked padded
    gathers so memory stays bounded for large catalogs.  Used by the
    ranking/serving path (the equivalent of looping ``compute_representation``
    over the catalog in ``predict_ranks``, template:1300-1315).
    """
    if isinstance(features, IdentityRows):
        return table[: features.n_rows] * scale

    n = features.n_rows
    if n <= block:
        return batch_representation(
            table, features, jnp.arange(n, dtype=jnp.int32), scale
        )

    n_blocks = -(-n // block)
    pad_n = n_blocks * block
    ids = jnp.arange(pad_n, dtype=jnp.int32) % n  # wrap padding rows (discarded)

    def body(_, blk_ids):
        return None, batch_representation(table, features, blk_ids, scale)

    _, reps = jax.lax.scan(body, None, ids.reshape(n_blocks, block))
    return reps.reshape(pad_n, -1)[:n]
