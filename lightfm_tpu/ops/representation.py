"""Latent representation and scoring ops.

TPU-native replacement for the reference's scalar loops
``compute_representation`` (`_lightfm_fast.pyx.template:287-317`) and
``compute_prediction_from_repr`` (`template:320-334`): batched gathers plus
einsums that XLA fuses and tiles onto the VPU/MXU.  A user/item
representation is the weighted sum of its feature embeddings; its bias the
weighted sum of feature biases.  The lazy-regularisation ``scale`` multiplies
feature weights exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightfm_tpu.sparse import PaddedRows


def batch_representation(
    embeddings: jax.Array,  # [n_features, D]
    biases: jax.Array,  # [n_features]
    features: PaddedRows,
    row_ids: jax.Array,  # int32 [...]
    scale: jax.Array | float = 1.0,
):
    """Representations for a batch of rows.

    Returns ``(repr [..., D], bias [...])``.  Padding slots have weight 0 and
    therefore contribute nothing; no masking needed.
    """
    idx = features.idx[row_ids]  # [..., P]
    wts = features.wts[row_ids] * scale  # [..., P]
    emb = embeddings[idx]  # [..., P, D]
    rep = jnp.einsum("...p,...pd->...d", wts, emb)
    bias = jnp.einsum("...p,...p->...", wts, biases[idx])
    return rep, bias


def score_pairs(user_rep, user_bias, item_rep, item_bias):
    """dot(user, item) + user_bias + item_bias (template:320-334)."""
    return jnp.einsum("...d,...d->...", user_rep, item_rep) + user_bias + item_bias


def full_representations(
    embeddings: jax.Array,
    biases: jax.Array,
    features: PaddedRows,
    scale: jax.Array | float = 1.0,
    block: int = 8192,
):
    """Representations for ALL rows of a feature matrix, computed in blocks.

    This is the sparse-dense matmul ``features @ embeddings`` realised as
    blocked padded gathers so memory stays bounded for large catalogs.  Used
    by the ranking/serving path (the equivalent of looping
    ``compute_representation`` over the catalog in ``predict_ranks``,
    template:1300-1315).
    """
    n = features.n_rows
    if n <= block:
        return batch_representation(
            embeddings, biases, features, jnp.arange(n, dtype=jnp.int32), scale
        )

    n_blocks = -(-n // block)
    pad_n = n_blocks * block
    ids = jnp.arange(pad_n, dtype=jnp.int32) % n  # wrap padding rows (discarded)

    def body(_, blk_ids):
        return None, batch_representation(embeddings, biases, features, blk_ids, scale)

    _, (reps, bs) = jax.lax.scan(body, None, ids.reshape(n_blocks, block))
    return reps.reshape(pad_n, -1)[:n], bs.reshape(pad_n)[:n]
