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
    are PACKED into one ``[8, n_pad]`` INT32 block — float columns bitcast
    to int32 — so the per-epoch shuffle is ONE multi-operand key sort
    carrying all columns as payload (measured ~10x cheaper than
    jax.random.permutation + five 1-D gathers on v5e).  The block is integer
    because f32 payloads whose bit patterns are denormal (every id < 2^23!)
    get flushed to zero somewhere in the TPU sort data path — ids came back
    0 and the model silently stopped learning; int32 payloads are exact.
    Rows: 0=user id, 1=item id, 2=value bits, 3=weight bits, 4=valid flag,
    5-7 zero pad (multiple-of-8 height).
    """

    packed: jax.Array  # int32 [8, n_pad]
    user_feats: object  # IdentityRows | PaddedRows
    item_feats: object
    # Sorted per-user positives for negative-sample rejection (ranking losses).
    positives: Optional[PaddedSortedRows]
    # Item column of every training interaction: BPR's empirical negative
    # distribution (template:1123-1127).  None for other losses.
    train_items: Optional[jax.Array]
    # TRANSPOSED feature structures (feature id -> (entity, weight) rows),
    # staged only when the hybrid fast path's aggregated update engages
    # (fast_warp._apply_aggregated_feature_update); None otherwise.
    user_feats_T: object = None
    item_feats_T: object = None


def _unpack_batch(packed: jax.Array) -> Batch:
    """[8, B] int32 packed block -> Batch (bitcast float rows back)."""
    return Batch(
        user_ids=packed[0],
        item_ids=packed[1],
        y=jax.lax.bitcast_convert_type(packed[2], jnp.float32),
        weight=jax.lax.bitcast_convert_type(packed[3], jnp.float32),
        valid=packed[4] > 0,
    )


def choose_batch_size(n_examples: int, requested: Optional[int]) -> int:
    """Heuristic batch size: large enough to feed the TPU, small enough to
    keep the number of optimizer steps per epoch meaningful on small data."""
    if requested is not None:
        return int(requested)
    # Calibrated against the sequential oracle (tests/_reference_oracle.py)
    # and the accuracy-floor suite: ~n/64 (min 1024) keeps enough optimizer
    # steps per epoch to match the reference's accuracy floors while cutting
    # the dispatch-bound step count on small datasets (the ML-100k
    # quickstart measures both faster AND more accurate at 1024 than 512).
    # Beyond ~0.5M examples the TPU is scatter/step-bound, not accuracy
    # bound: the cap grows as ~n/40 (>= 40 optimizer steps/epoch, the
    # regime where the 5M-scale bench holds its train-AUC guard) up to
    # 131072 — so a default-config production fit runs the same batch
    # shape the published large-scale numbers use (round-2 verdict #3).
    cap = 8192 if n_examples <= (1 << 19) else min(131072, n_examples // 40)
    target = max(1024, min(cap, n_examples // 64))
    # Round to a power of two for stable jit cache keys.
    b = 1 << (int(target) - 1).bit_length()
    # The round-up must not break the >= 40 optimizer-steps/epoch regime
    # the large-batch accuracy floors were calibrated in.
    if n_examples > (1 << 19) and n_examples // b < 40:
        b >>= 1
    return b


@functools.partial(jax.jit, static_argnames=("n_pad", "vconst", "wconst"))
def _pack_on_device(row, col, vals, wts, *, n_pad, vconst, wconst):
    """Assemble the [8, n_pad] packed block on device from raw COO columns.

    Constant value/weight columns (the common implicit-feedback case) are
    synthesized on device instead of crossing the host→device link.
    """
    n = row.shape[0]

    def bits(x, const):
        src = jnp.full((n,), const, jnp.float32) if x is None else x
        return jax.lax.bitcast_convert_type(src, jnp.int32)

    out = jnp.zeros((8, n_pad), dtype=jnp.int32)
    out = out.at[0, :n].set(row)
    out = out.at[1, :n].set(col)
    out = out.at[2, :n].set(bits(vals, vconst))
    out = out.at[3, :n].set(bits(wts, wconst))
    out = out.at[4, :n].set(1)  # valid flag
    return out


@functools.partial(jax.jit, static_argnames=("n_users", "n_items", "width"))
def _positives_on_device(row, col, n_users: int, n_items: int, width: int):
    """Device-built :class:`PaddedSortedRows` from raw COO columns.

    Equivalent to ``pad_csr_sorted(csr_matrix(coo))`` (per-row sorted unique
    columns, sentinel padding, lengths clipped to ``width``) without the
    host-side CSR conversion or a second host→device upload: one two-key
    device sort + segment/scatter passes over data already uploaded for the
    packed block.
    """
    srow, scol = jax.lax.sort([row, col], num_keys=2)
    keep = jnp.concatenate(
        [
            jnp.ones((1,), bool) if row.shape[0] else jnp.zeros((0,), bool),
            (srow[1:] != srow[:-1]) | (scol[1:] != scol[:-1]),
        ]
    )
    ones = keep.astype(jnp.int32)
    kept_rank = jnp.cumsum(ones) - ones  # rank among kept entries
    lengths = jax.ops.segment_sum(ones, srow, num_segments=n_users)
    row_start = jnp.cumsum(lengths) - lengths
    pos = kept_rank - row_start[srow]
    # Invalid writes (duplicates, over-width tails) aim out of range -> drop.
    pos = jnp.where(keep & (pos < width), pos, width)
    idx = jnp.full((n_users, width), n_items, dtype=jnp.int32)
    idx = idx.at[srow, pos].set(scol, mode="drop")
    return PaddedSortedRows(idx, jnp.minimum(lengths, width), n_items)


def build_train_data(
    interactions_coo,
    sample_weight_data: np.ndarray,
    user_feats,
    item_feats,
    hp: Hyperparams,
    batch_size: int,
) -> TrainData:
    """Stage the COO training set on device, padded to whole batches.

    Only the raw COO columns cross the host→device link (row, col, and —
    when not constant — values and weights); the packed block and the
    negative-rejection structure are built ON DEVICE.  On remote-device
    setups this is the difference between shipping ~40MB and ~220MB per
    5M-example fit; on co-located hosts it still skips the host-side CSR
    sort and the [8, n_pad] materialisation.
    """
    n = len(interactions_coo.data)
    n_pad = max(1, -(-n // batch_size)) * batch_size
    n_users, n_items = interactions_coo.shape

    row = np.ascontiguousarray(interactions_coo.row, dtype=np.int32)
    col = np.ascontiguousarray(interactions_coo.col, dtype=np.int32)
    vals = np.asarray(interactions_coo.data, dtype=np.float32)
    wts = np.asarray(sample_weight_data, dtype=np.float32)
    vconst = float(vals[0]) if n and (vals == vals[0]).all() else None
    wconst = float(wts[0]) if n and (wts == wts[0]).all() else None

    drow, dcol = jnp.asarray(row), jnp.asarray(col)
    packed = _pack_on_device(
        drow,
        dcol,
        None if vconst is not None else jnp.asarray(vals),
        None if wconst is not None else jnp.asarray(wts),
        n_pad=n_pad,
        vconst=vconst,
        wconst=wconst,
    )

    positives = None
    train_items = None
    if hp.loss in ("warp", "bpr", "warp-kos"):
        # k-OS SAMPLES positives from this structure, so it needs the full
        # rows; warp/bpr only REJECT against it, where a width cap is
        # statistically safe and keeps the compare cost bounded on
        # heavy-user datasets (see sparse.pad_csr_sorted).
        lengths = np.bincount(row, minlength=n_users) if n else np.zeros(n_users, np.int64)
        width = int(lengths.max()) if n else 1  # dup-inclusive upper bound
        if hp.loss != "warp-kos":
            width = min(width, 512)
        width = max(8 * -(-width // 8), 8)
        positives = _positives_on_device(drow, dcol, n_users, n_items, width)
    if hp.loss == "bpr":
        train_items = dcol  # already on device

    return TrainData(
        packed=packed,
        user_feats=user_feats,
        item_feats=item_feats,
        positives=positives,
        train_items=train_items,
    )


def _shuffle_global(packed, kperm, n_batches, batch_size):
    """Global per-epoch permutation (mirrors `lightfm/lightfm.py:689-690`)
    as a single multi-operand sort: random u32 keys carry all 8 packed
    columns as payload (u32 key collisions are resolved stably — a
    negligible shuffle bias at ~n^2/2^33 tied pairs)."""
    sort_keys = jax.random.bits(kperm, (packed.shape[1],), jnp.uint32)
    sorted_ops = jax.lax.sort(
        [sort_keys] + [packed[i] for i in range(8)], num_keys=1
    )
    shuffled = jnp.stack(sorted_ops[1:]).reshape(8, n_batches, batch_size)
    return jnp.swapaxes(shuffled, 0, 1)  # [n_batches, 8, B] for the scan


def _shuffle_local(packed, kperm, n_batches, batch_size, mesh):
    """Host-local per-epoch shuffle for example-sharded input (pod scale).

    Each data-axis shard key-sorts only its own slice of the packed block
    and contributes a contiguous ``batch_size / n_data`` sub-batch to every
    global batch — a stratified permutation: every example still appears
    exactly once per epoch, every batch mixes all shards, and (unlike the
    global sort) no cross-device exchange is needed for the shuffle itself.
    Statistically equivalent to the reference's global permutation at pod
    scale (doc/roadmap.md); collectives then ride only the update psums.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_data = mesh.shape["data"]
    if batch_size % n_data or packed.shape[1] % n_data:
        raise ValueError(
            "example_shuffle='local' needs batch_size and the padded example "
            f"count to divide the data axis ({n_data}); got batch_size="
            f"{batch_size}, n_pad={packed.shape[1]}"
        )

    def local_sort(pk, keys):
        # pk: [8, n_pad / n_data] local slice; keys: local random u32s.
        ops = jax.lax.sort([keys[0]] + [pk[i] for i in range(8)], num_keys=1)
        out = jnp.stack(ops[1:]).reshape(8, n_batches, batch_size // n_data)
        return jnp.swapaxes(out, 0, 1)  # [n_batches, 8, B/n_data]

    keys = jax.random.bits(kperm, (n_data, packed.shape[1] // n_data), jnp.uint32)
    return shard_map(
        local_sort,
        mesh=mesh,
        in_specs=(P(None, "data"), P("data")),
        out_specs=P(None, None, "data"),
    )(packed, keys)


def _epoch(state, data, key, hp, batch_size, mesh, shuffle="global", fast=False):
    """One epoch: device-side shuffle + scan over minibatches.

    With a mesh, each minibatch is sharded over the 'data' axis so the
    representation/score/update math is data-parallel; gradient scatters into
    replicated or row-sharded tables become XLA collectives under GSPMD.
    ``shuffle="local"`` keeps the permutation within each data-axis shard
    (see :func:`_shuffle_local`) for host-sharded example blocks.
    A truthy ``fast`` (callers decide via `fast_warp.fast_warp_eligible`;
    it is part of the jit cache key) takes the specialised WARP path —
    pool negatives + item-sorted batches + sorted Pallas updates.  Its
    value is the MODE: ``"kernels"`` additionally swaps the pool einsums
    for the Pallas pool kernels; ``"einsum"``/``True`` keep the rolled
    XLA formulation.
    """
    if hp.max_sampled == 0 and hp.loss in ("warp", "warp-kos"):
        # Post-construction `model.max_sampled = 0`: the reference's
        # sampling loop body never executes, so every epoch is an exact
        # no-op (`tests/test_movielens.py:247-263`).  Guarded HERE so the
        # verbose per-epoch path and the fast path (whose K=0 shapes would
        # not even trace) behave identically to run_epochs' early return.
        return state
    if fast:
        from lightfm_tpu.fast_warp import fast_epoch

        return fast_epoch(state, data, key, hp, batch_size, mode=fast,
                          mesh=mesh)

    n_pad = data.packed.shape[1]
    n_batches = n_pad // batch_size
    kperm, kbatch = jax.random.split(key)
    keys = jax.random.split(kbatch, n_batches)

    if shuffle == "local" and mesh is not None:
        shuffled = _shuffle_local(data.packed, kperm, n_batches, batch_size, mesh)
    else:
        shuffled = _shuffle_global(data.packed, kperm, n_batches, batch_size)

    step = LOSS_STEPS[hp.loss]
    lazy_reg = hp.item_alpha != 0.0 or hp.user_alpha != 0.0

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P(None, None, "data"))
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


# The jitted cores are wrapped in plain-Python entry points that
# CANONICALISE THE ARGUMENT BINDING (everything positional).  jax.jit's
# tracing cache keys on how arguments were bound, not just their values:
# `run_epochs(..., fast=f)` relying on mesh/shuffle defaults and
# `run_epochs(..., mesh=None, shuffle="global", fast=f)` compile TWO
# executables of the same program.  On the v5e runtime, dispatching a
# second distinct fast-epoch executable in one process intermittently
# poisons the TPU client (runtime INVALID_ARGUMENT on every later op) —
# it took down 12/12 default-config bench children before this wrapper
# collapsed fit's call and the benchmark tools' calls into one entry.


@functools.partial(
    jax.jit, static_argnames=("hp", "batch_size", "mesh", "shuffle", "fast")
)
def _run_epoch_jit(
    state: ModelState,
    data: TrainData,
    key: jax.Array,
    hp: Hyperparams,
    batch_size: int,
    mesh,
    shuffle: str,
    fast,
) -> ModelState:
    return _epoch(state, data, key, hp, batch_size, mesh, shuffle, fast)


def run_epoch(
    state: ModelState,
    data: TrainData,
    key: jax.Array,
    hp: Hyperparams,
    batch_size: int,
    mesh=None,
    shuffle: str = "global",
    fast=False,  # False | True/"einsum" | "kernels" (static; see _epoch)
) -> ModelState:
    """Single-epoch dispatch (the verbose per-epoch fit loop)."""
    return _run_epoch_jit(
        state, data, key, hp, batch_size, mesh, shuffle, fast
    )


@functools.partial(
    jax.jit, static_argnames=("hp", "batch_size", "mesh", "shuffle", "fast")
)
def _run_epochs_jit(
    state: ModelState,
    data: TrainData,
    seeds: jax.Array,  # uint32 [n_epochs], one per epoch from the model RNG
    hp: Hyperparams,
    batch_size: int,
    mesh,
    shuffle: str,
    fast,
) -> ModelState:
    """Multi-epoch fit in ONE dispatch: scan over per-epoch seeds."""
    if hp.max_sampled == 0 and hp.loss in ("warp", "warp-kos"):
        # Post-construction `model.max_sampled = 0`: the reference's
        # sampling loop body never executes, so every epoch is an exact
        # no-op (`tests/test_movielens.py:247-263`).
        return state

    def body(state, seed):
        return (
            _epoch(
                state, data, jax.random.key(seed), hp, batch_size, mesh,
                shuffle, fast,
            ),
            None,
        )

    state, _ = jax.lax.scan(body, state, seeds)
    return state


def run_epochs(
    state: ModelState,
    data: TrainData,
    seeds: jax.Array,  # uint32 [n_epochs], one per epoch from the model RNG
    hp: Hyperparams,
    batch_size: int,
    mesh=None,
    shuffle: str = "global",
    fast=False,  # False | True/"einsum" | "kernels" (static; see _epoch)
) -> ModelState:
    """Multi-epoch fit in ONE dispatch (canonical-binding wrapper; see the
    comment above `_run_epoch_jit`)."""
    return _run_epochs_jit(
        state, data, seeds, hp, batch_size, mesh, shuffle, fast
    )
