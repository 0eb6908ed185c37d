"""Model state: a functional pytree replacing the reference's ``FastLightFM`` struct.

The reference packs 12 mutable numpy arrays plus two lazy-regularisation scale
accumulators into a Cython extension class that OpenMP threads race on
(``lightfm/_lightfm_fast.pyx.template:185-259``).  Here the same state is an
immutable JAX pytree threaded through jitted update steps; the scale
accumulators become explicit float32 scalars in the pytree.
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
    """All trainable state.  Mirrors `FastLightFM` (template:185-259) 1:1.

    ``*_gradients`` are the adagrad/adadelta squared-gradient accumulators and
    ``*_momentum`` the adadelta squared-update moving averages, kept for both
    schedules so checkpoints are schedule-agnostic (as in the reference, where
    all 12 arrays always exist; `lightfm/lightfm.py:281-312`).
    """

    item_embeddings: jax.Array  # [n_item_features, D]
    item_embedding_gradients: jax.Array
    item_embedding_momentum: jax.Array
    item_biases: jax.Array  # [n_item_features]
    item_bias_gradients: jax.Array
    item_bias_momentum: jax.Array

    user_embeddings: jax.Array  # [n_user_features, D]
    user_embedding_gradients: jax.Array
    user_embedding_momentum: jax.Array
    user_biases: jax.Array  # [n_user_features]
    user_bias_gradients: jax.Array
    user_bias_momentum: jax.Array

    # Lazy L2 scale accumulators (template:213-214, 253-255).
    item_scale: jax.Array  # f32 scalar
    user_scale: jax.Array  # f32 scalar


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
    adagrad accumulators start at 1.  Uses the numpy RandomState so that
    seeded runs are bit-identical across processes.
    """
    item_emb = (
        (random_state.rand(no_item_features, no_components) - 0.5) / no_components
    ).astype(np.float32)
    user_emb = (
        (random_state.rand(no_user_features, no_components) - 0.5) / no_components
    ).astype(np.float32)

    grad_init = 1.0 if adagrad else 0.0

    return ModelState(
        item_embeddings=jnp.asarray(item_emb),
        item_embedding_gradients=jnp.full_like(item_emb, grad_init),
        item_embedding_momentum=jnp.zeros_like(item_emb),
        item_biases=jnp.zeros(no_item_features, dtype=jnp.float32),
        item_bias_gradients=jnp.full((no_item_features,), grad_init, dtype=jnp.float32),
        item_bias_momentum=jnp.zeros(no_item_features, dtype=jnp.float32),
        user_embeddings=jnp.asarray(user_emb),
        user_embedding_gradients=jnp.full_like(user_emb, grad_init),
        user_embedding_momentum=jnp.zeros_like(user_emb),
        user_biases=jnp.zeros(no_user_features, dtype=jnp.float32),
        user_bias_gradients=jnp.full((no_user_features,), grad_init, dtype=jnp.float32),
        user_bias_momentum=jnp.zeros(no_user_features, dtype=jnp.float32),
        item_scale=jnp.float32(1.0),
        user_scale=jnp.float32(1.0),
    )


def fold_scales(state: ModelState) -> ModelState:
    """Fold the lazy-regularisation scales into the tables and reset to 1.

    Equivalent to ``regularize`` in the reference
    (`_lightfm_fast.pyx.template:652-675`), run at the end of every epoch and
    whenever a scale exceeds MAX_REG_SCALE.  Functional: returns new state.
    """
    inv_item = 1.0 / state.item_scale
    inv_user = 1.0 / state.user_scale
    return state._replace(
        item_embeddings=state.item_embeddings * inv_item,
        item_biases=state.item_biases * inv_item,
        user_embeddings=state.user_embeddings * inv_user,
        user_biases=state.user_biases * inv_user,
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
