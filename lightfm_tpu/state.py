"""Model state: a functional pytree replacing the reference's ``FastLightFM`` struct.

The reference packs 12 mutable numpy arrays plus two lazy-regularisation scale
accumulators into a Cython extension class that OpenMP threads race on
(`lightfm/_lightfm_fast.pyx.template:185-259`).  Here the same state is an
immutable JAX pytree threaded through jitted update steps.

TPU layout note: biases are FUSED into the embedding tables as the LAST
column (mirroring the reference's own representation layout, where the bias
is the last slot of every latent representation, template:287-317), and the
table width is padded to a multiple of 8 with zero columns between the
embedding block and the bias.  Fusing halves the gather/scatter count on the
training hot path; the width padding keeps row gathers on the TPU's fast
lowering path (odd widths like 11 or 65 fall off a ~100x cliff — measured on
v5e).  Zero columns are exact no-ops everywhere: representations carry zeros,
gradients to them are zero, and ``[..., :-1]`` dot products ignore them.
The public API still exposes the reference's 12 separate arrays as views
(see ``LightFM`` properties).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

# Rescale threshold for the lazy-regularisation accumulators, mirroring
# MAX_REG_SCALE in the reference (`_lightfm_fast.pyx.template:19`).
MAX_REG_SCALE = 1e6


class ModelState(NamedTuple):
    """All trainable state.

    ``*_table``: [n_features, W] with W = table_width(D) — embedding columns
    0..D-1, zero-padding columns D..W-2, bias column W-1.
    ``*_acc``: adagrad/adadelta squared-gradient accumulators (same shape).
    ``*_mom``: adadelta squared-update moving averages.
    Together these mirror `FastLightFM`'s 12 arrays (template:185-259); the
    scale scalars are the lazy-L2 accumulators (template:213-214).
    """

    item_table: jax.Array
    item_acc: jax.Array
    item_mom: jax.Array
    user_table: jax.Array
    user_acc: jax.Array
    user_mom: jax.Array
    item_scale: jax.Array  # f32 scalar
    user_scale: jax.Array  # f32 scalar


def table_width(no_components: int) -> int:
    """Fused-table width: D embedding cols + bias col, rounded up to 8.

    Multiples of 8 (f32 sublane) keep random row gathers on XLA:TPU's fast
    path; widths like 11 (D=10) or 65 (D=64) measured up to ~100x slower.
    XLA pads the minor dimension to the 128-lane tile internally anyway, so
    the explicit zero columns cost no extra HBM.
    """
    return ((no_components + 1 + 7) // 8) * 8


def init_state(
    no_components: int,
    no_item_features: int,
    no_user_features: int,
    random_state: np.random.RandomState,
    adagrad: bool,
) -> ModelState:
    """Initialise latent state.

    Matches the reference init exactly (`lightfm/lightfm.py:281-312`):
    embeddings ~ (U[0,1) - 0.5)/no_components in float32, biases zero,
    adagrad accumulators start at 1 (for biases too).  Uses the numpy
    RandomState so that seeded runs are bit-identical across processes.
    """
    D = no_components
    W = table_width(D)

    def make_table(n):
        emb = ((random_state.rand(n, D) - 0.5) / D).astype(np.float32)
        # Zero pad columns D..W-2, bias column W-1 (zero-initialised).
        return np.concatenate([emb, np.zeros((n, W - D), np.float32)], axis=1)

    # Reference init order: item embeddings first, then user (lightfm.py:287-306).
    item = make_table(no_item_features)
    user = make_table(no_user_features)
    grad_init = 1.0 if adagrad else 0.0

    return ModelState(
        item_table=jnp.asarray(item),
        item_acc=jnp.full(item.shape, grad_init, dtype=jnp.float32),
        item_mom=jnp.zeros(item.shape, dtype=jnp.float32),
        user_table=jnp.asarray(user),
        user_acc=jnp.full(user.shape, grad_init, dtype=jnp.float32),
        user_mom=jnp.zeros(user.shape, dtype=jnp.float32),
        item_scale=jnp.float32(1.0),
        user_scale=jnp.float32(1.0),
    )


def fold_scales(state: ModelState) -> ModelState:
    """Fold the lazy-regularisation scales into the tables and reset to 1.

    Equivalent to ``regularize`` in the reference
    (`_lightfm_fast.pyx.template:652-675`), run at the end of every epoch and
    whenever a scale exceeds MAX_REG_SCALE.  Functional: returns new state.
    """
    return state._replace(
        item_table=state.item_table * (1.0 / state.item_scale),
        user_table=state.user_table * (1.0 / state.user_scale),
        item_scale=jnp.float32(1.0),
        user_scale=jnp.float32(1.0),
    )


def maybe_fold_scales(state: ModelState) -> ModelState:
    """Conditionally rescale when a scale accumulator grows past MAX_REG_SCALE.

    Mirrors ``locked_regularize`` (template:678-691) minus the lock: updates
    are batched and functional, so no thread synchronisation exists to need.
    """
    needs = jnp.logical_or(
        state.item_scale > MAX_REG_SCALE, state.user_scale > MAX_REG_SCALE
    )
    return jax.lax.cond(needs, fold_scales, lambda s: s, state)
