"""Jitted epoch runner: synchronous batched SGD over shuffled interactions.

Replaces the reference's ``_run_epoch`` → Python→C boundary → OpenMP fan-out
(`lightfm/lightfm.py:668-759`) with a single compiled program: a device-side
shuffle followed by ``lax.scan`` over minibatches.  Whole multi-epoch fits
compile to ONE dispatch (``run_epochs`` scans over per-epoch PRNG seeds), so
host-device round-trips don't gate throughput.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from lightfm_tpu.config import Hyperparams
from lightfm_tpu.losses import LOSS_STEPS, Batch
from lightfm_tpu.sparse import PaddedSortedRows
from lightfm_tpu.state import ModelState, fold_scales, maybe_fold_scales


class TrainData(NamedTuple):
    """Device-resident training set (padded to a whole number of batches)."""

    user_ids: jax.Array  # int32 [n_pad]
    item_ids: jax.Array  # int32 [n_pad]
    y: jax.Array  # f32 [n_pad]
    weight: jax.Array  # f32 [n_pad]
    valid: jax.Array  # bool [n_pad]
    user_feats: object  # IdentityRows | PaddedRows
    item_feats: object
    # Sorted per-user positives for negative-sample rejection (ranking losses).
    positives: Optional[PaddedSortedRows]
    # Item column of every training interaction: BPR's empirical negative
    # distribution (template:1123-1127).  None for other losses.
    train_items: Optional[jax.Array]


def choose_batch_size(n_examples: int, requested: Optional[int]) -> int:
    """Heuristic batch size: large enough to feed the TPU, small enough to
    keep the number of optimizer steps per epoch meaningful on small data."""
    if requested is not None:
        return int(requested)
    # Calibrated against the sequential oracle (tests/_reference_oracle.py):
    # ~n/128 keeps enough optimizer steps per epoch to match the reference's
    # accuracy floors while feeding the TPU large batches on big datasets.
    target = max(256, min(8192, n_examples // 128))
    # Round to a power of two for stable jit cache keys.
    return 1 << (int(target) - 1).bit_length()


def build_train_data(
    interactions_coo,
    sample_weight_data: np.ndarray,
    user_feats,
    item_feats,
    hp: Hyperparams,
    batch_size: int,
) -> TrainData:
    """Pad the COO training set to a whole number of batches and upload."""
    import scipy.sparse as sp

    n = len(interactions_coo.data)
    n_pad = max(1, -(-n // batch_size)) * batch_size

    def pad(a, dtype):
        out = np.zeros(n_pad, dtype=dtype)
        out[:n] = a
        return jnp.asarray(out)

    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True

    positives = None
    train_items = None
    if hp.loss in ("warp", "bpr", "warp-kos"):
        from lightfm_tpu.sparse import pad_csr_sorted

        csr = sp.csr_matrix(interactions_coo)
        if not csr.has_sorted_indices:
            csr = csr.sorted_indices()
        positives = pad_csr_sorted(csr)
    if hp.loss == "bpr":
        train_items = jnp.asarray(interactions_coo.col.astype(np.int32))

    return TrainData(
        user_ids=pad(interactions_coo.row.astype(np.int32), np.int32),
        item_ids=pad(interactions_coo.col.astype(np.int32), np.int32),
        y=pad(interactions_coo.data.astype(np.float32), np.float32),
        weight=pad(sample_weight_data.astype(np.float32), np.float32),
        valid=jnp.asarray(valid),
        user_feats=user_feats,
        item_feats=item_feats,
        positives=positives,
        train_items=train_items,
    )


def _epoch(state, data, key, hp, batch_size, mesh):
    """One epoch: device-side shuffle + scan over minibatches.

    The global per-epoch permutation mirrors `lightfm/lightfm.py:689-690`.
    With a mesh, each minibatch is sharded over the 'data' axis so the
    representation/score/update math is data-parallel; gradient scatters into
    replicated or row-sharded tables become XLA collectives under GSPMD.
    """
    n_pad = data.user_ids.shape[0]
    n_batches = n_pad // batch_size
    kperm, kbatch = jax.random.split(key)
    perm = jax.random.permutation(kperm, n_pad)
    keys = jax.random.split(kbatch, n_batches)

    # Shuffle-gather ONCE per epoch; the batch scan then slices contiguous
    # memory for free instead of paying five random gathers per step.
    def shuffle(a):
        return a[perm].reshape(n_batches, batch_size)

    shuffled = Batch(
        user_ids=shuffle(data.user_ids),
        item_ids=shuffle(data.item_ids),
        y=shuffle(data.y),
        weight=shuffle(data.weight),
        valid=shuffle(data.valid),
    )

    step = LOSS_STEPS[hp.loss]
    lazy_reg = hp.item_alpha != 0.0 or hp.user_alpha != 0.0

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P(None, "data"))
        shuffled = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), shuffled
        )

    def body(state, xs):
        batch, bkey = xs
        state = step(
            state, batch, data.user_feats, data.item_feats,
            data.positives, data.train_items, hp, bkey,
        )
        if lazy_reg:
            # Mid-epoch rescale guard (``locked_regularize``, template:678-691).
            state = maybe_fold_scales(state)
        return state, None

    state, _ = jax.lax.scan(body, state, (shuffled, keys))
    if lazy_reg:
        # Always fold at epoch end (template:779-781, 910-912).
        state = fold_scales(state)
    return state


@functools.partial(jax.jit, static_argnames=("hp", "batch_size", "mesh"))
def run_epoch(
    state: ModelState,
    data: TrainData,
    key: jax.Array,
    hp: Hyperparams,
    batch_size: int,
    mesh=None,
) -> ModelState:
    return _epoch(state, data, key, hp, batch_size, mesh)


@functools.partial(jax.jit, static_argnames=("hp", "batch_size", "mesh"))
def run_epochs(
    state: ModelState,
    data: TrainData,
    seeds: jax.Array,  # uint32 [n_epochs], one per epoch from the model RNG
    hp: Hyperparams,
    batch_size: int,
    mesh=None,
) -> ModelState:
    """Multi-epoch fit in ONE dispatch: scan over per-epoch seeds."""

    def body(state, seed):
        return _epoch(state, data, jax.random.key(seed), hp, batch_size, mesh), None

    state, _ = jax.lax.scan(body, state, seeds)
    return state
