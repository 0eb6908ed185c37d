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
    """Device-resident training set (padded to a whole number of batches).

    The five per-example columns (user id, item id, value, weight, valid)
    are PACKED into one ``[n_pad, 8]`` f32 block — ids bitcast to f32 — so
    the per-epoch shuffle is ONE row gather instead of five 1-D gathers
    (measured 4.4x faster on v5e; 1-D gathers pay the same per-element fixed
    cost as a whole row).  Columns: 0=user id bits, 1=item id bits, 2=value,
    3=weight, 4=valid flag, 5-7 zero pad (multiple-of-8 width).
    """

    packed: jax.Array  # f32 [n_pad, 8]
    user_feats: object  # IdentityRows | PaddedRows
    item_feats: object
    # Sorted per-user positives for negative-sample rejection (ranking losses).
    positives: Optional[PaddedSortedRows]
    # Item column of every training interaction: BPR's empirical negative
    # distribution (template:1123-1127).  None for other losses.
    train_items: Optional[jax.Array]


def _unpack_batch(packed: jax.Array) -> Batch:
    """[B, 8] packed block -> Batch (bitcast id columns back to int32)."""
    return Batch(
        user_ids=jax.lax.bitcast_convert_type(packed[:, 0], jnp.int32),
        item_ids=jax.lax.bitcast_convert_type(packed[:, 1], jnp.int32),
        y=packed[:, 2],
        weight=packed[:, 3],
        valid=packed[:, 4] > 0.5,
    )


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

    packed = np.zeros((n_pad, 8), dtype=np.float32)
    packed[:n, 0] = interactions_coo.row.astype(np.int32).view(np.float32)
    packed[:n, 1] = interactions_coo.col.astype(np.int32).view(np.float32)
    packed[:n, 2] = interactions_coo.data.astype(np.float32)
    packed[:n, 3] = sample_weight_data.astype(np.float32)
    packed[:n, 4] = 1.0  # valid flag

    positives = None
    train_items = None
    if hp.loss in ("warp", "bpr", "warp-kos"):
        from lightfm_tpu.sparse import pad_csr_sorted

        csr = sp.csr_matrix(interactions_coo)
        if not csr.has_sorted_indices:
            csr = csr.sorted_indices()
        positives = pad_csr_sorted(csr, pad_multiple=8)
    if hp.loss == "bpr":
        train_items = jnp.asarray(interactions_coo.col.astype(np.int32))

    return TrainData(
        packed=jnp.asarray(packed),
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
    n_pad = data.packed.shape[0]
    n_batches = n_pad // batch_size
    kperm, kbatch = jax.random.split(key)
    perm = jax.random.permutation(kperm, n_pad)
    keys = jax.random.split(kbatch, n_batches)

    # Shuffle-gather ONCE per epoch — a single row gather over the packed
    # [n_pad, 8] example block; the batch scan then slices contiguous memory.
    shuffled = data.packed[perm].reshape(n_batches, batch_size, 8)

    step = LOSS_STEPS[hp.loss]
    lazy_reg = hp.item_alpha != 0.0 or hp.user_alpha != 0.0

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P(None, "data", None))
        shuffled = jax.lax.with_sharding_constraint(shuffled, batch_sharding)

    def body(state, xs):
        packed, bkey = xs
        state = step(
            state, _unpack_batch(packed), data.user_feats, data.item_feats,
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
