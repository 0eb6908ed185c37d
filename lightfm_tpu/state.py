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
# MAX_REG_SCALE in the reference (`_lightfm_fast.pyx.template:19`).  Scales
# are tracked in LOG space: a batched step multiplies the scale by
# (1 + alpha*avg_lr)^n_updates, which overflows f32 within ONE step at
# extreme alpha; in log space the fold's exp(-log_scale) underflows to an
# exact 0 instead — the same limit the reference reaches after its many
# sequential per-example rescales (params collapse to ~0 but stay finite,
# its test_movielens.py:549-569 contract).
MAX_REG_SCALE = 1e6
LOG_MAX_REG_SCALE = float(np.log(MAX_REG_SCALE))


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
    item_log_scale: jax.Array  # f32 scalar, log of the lazy-reg scale
    user_log_scale: jax.Array  # f32 scalar


def table_width(no_components: int) -> int:
    """Fused-table width: D embedding cols + bias col, rounded up to 8.

    Multiples of 8 (f32 sublane) keep random row gathers on XLA:TPU's fast
    path; widths like 11 (D=10) or 65 (D=64) measured up to ~100x slower.
    XLA pads the minor dimension to the 128-lane tile internally anyway, so
    the explicit zero columns cost no extra HBM.
    """
    return ((no_components + 1 + 7) // 8) * 8


def _make_table(key, n: int, D: int, W: int) -> jax.Array:
    """[n, W] table: U[0,1)-based embeddings in cols 0..D-1, zeros after
    (pad cols D..W-2, bias col W-1)."""
    emb = (jax.random.uniform(key, (n, D), jnp.float32) - 0.5) / D
    return jnp.concatenate([emb, jnp.zeros((n, W - D), jnp.float32)], axis=1)


def init_state(
    no_components: int,
    no_item_features: int,
    no_user_features: int,
    random_state: np.random.RandomState,
    adagrad: bool,
) -> ModelState:
    """Initialise latent state.

    Matches the reference init distribution (`lightfm/lightfm.py:281-312`):
    embeddings ~ (U[0,1) - 0.5)/no_components in float32, biases zero,
    adagrad accumulators start at 1 (for biases too).  Tables are generated
    ON DEVICE from a key drawn off the numpy RandomState — seeded runs stay
    deterministic, and large tables never cross the host→device link
    (~86MB / >2s per 300k x 72 init on remote-device setups).
    """
    D = no_components
    W = table_width(D)

    seed = int(random_state.randint(0, np.iinfo(np.int32).max))
    k_item, k_user = jax.random.split(jax.random.key(seed))

    # Reference init order: item embeddings first, then user (lightfm.py:287-306).
    item = _make_table(k_item, no_item_features, D, W)
    user = _make_table(k_user, no_user_features, D, W)
    grad_init = 1.0 if adagrad else 0.0

    return ModelState(
        item_table=item,
        item_acc=jnp.full(item.shape, grad_init, dtype=jnp.float32),
        item_mom=jnp.zeros(item.shape, dtype=jnp.float32),
        user_table=user,
        user_acc=jnp.full(user.shape, grad_init, dtype=jnp.float32),
        user_mom=jnp.zeros(user.shape, dtype=jnp.float32),
        item_log_scale=jnp.float32(0.0),
        user_log_scale=jnp.float32(0.0),
    )


def fold_scales(state: ModelState) -> ModelState:
    """Fold the lazy-regularisation scales into the tables and reset to 1.

    Equivalent to ``regularize`` in the reference
    (`_lightfm_fast.pyx.template:652-675`), run at the end of every epoch and
    whenever a scale exceeds MAX_REG_SCALE.  ``exp(-log_scale)`` underflows
    to an exact 0 for extreme accumulations (see LOG_MAX_REG_SCALE note).
    Functional: returns new state.
    """
    def fold(table, log_scale):
        inv = jnp.exp(-log_scale)
        out = table * inv
        # At extreme alpha a hot row's per-touch (1+alpha*lr)^t boost can
        # saturate to inf within ONE batch while inv underflows to 0;
        # inf * 0 = NaN.  The sequential reference rescales per example so
        # neither factor saturates — its limit is exactly 0.  Patch ONLY
        # that pair (inf in the table AND a saturated scale): a genuine NaN
        # in the table stays NaN so _check_finite still raises.
        return jnp.where(jnp.isinf(table) & (inv == 0.0), 0.0, out)

    return state._replace(
        item_table=fold(state.item_table, state.item_log_scale),
        user_table=fold(state.user_table, state.user_log_scale),
        item_log_scale=jnp.float32(0.0),
        user_log_scale=jnp.float32(0.0),
    )


def maybe_fold_scales(state: ModelState) -> ModelState:
    """Conditionally rescale when a scale accumulator grows past MAX_REG_SCALE.

    Mirrors ``locked_regularize`` (template:678-691) minus the lock: updates
    are batched and functional, so no thread synchronisation exists to need.
    """
    needs = jnp.logical_or(
        state.item_log_scale > LOG_MAX_REG_SCALE,
        state.user_log_scale > LOG_MAX_REG_SCALE,
    )
    return jax.lax.cond(needs, fold_scales, lambda s: s, state)
