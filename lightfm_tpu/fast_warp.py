"""Specialised training path (WARP, BPR, and logistic): pool negatives
+ item-sorted batches + sorted Pallas table updates.

The generic batched WARP step (`losses.warp_step`) is bound by two
fine-grained random-HBM-access patterns on TPU (measured on v5e,
doc/roadmap.md):

1. the ``(K+1) * B`` per-example candidate row gather in the forward pass
   (~100M random rows/s), and
2. the duplicate-index scatter-adds of the table updates, which XLA:TPU
   lowers to serialized row writes (~half of a large epoch).

This module removes both for the common production configuration
(identity features, adagrad, no L2) while keeping the reference WARP
semantics (`_lightfm_fast.pyx.template:784-912`) statistically intact:

- **Pool negatives**: each step draws ONE pool of ``P`` i.i.d. uniform
  item ids (one P-row gather) plus ``K`` random rotations; candidate ``k``
  of example ``b`` is pool slot ``(b + shift_k) mod P``.  Marginally every
  example still scans K i.i.d. uniform candidates in draw order, so the
  first-violator selection and the rank estimator
  ``log(floor((n_items-1)/draws))`` (template:855-885) are unchanged; the
  only delta is that a pool item serves several examples within one step —
  a far weaker coupling than the reference's Hogwild racing on shared
  tables, and validated by the same statistical bar
  (tests/test_fast_warp.py, tests/test_oracle_parity.py).
- **Item-sorted batches**: updates within a synchronous batch commute, so
  each batch's examples are pre-sorted by positive item id during the
  epoch shuffle (one extra multi-payload device sort per epoch).  The
  positive-pair updates then feed the sorted Pallas one-hot-matmul kernel
  (`ops.pallas_update.sorted_adagrad_update_pallas`) with NO per-step
  reorder: scatter serialization is replaced by MXU block contractions.
- **Pool-space negative updates**: violator gradients accumulate into the
  ``[P, W]`` pool block (K rotations fold them back to pool slots), so the
  negative-side scatter touches P rows instead of B.
- **User updates**: the epoch shuffle also emits each batch's user-sorted
  id list and the permutation into it, so the user table can take the same
  sorted-kernel path (gradients permuted once, then block-dense update).

BPR shares the whole structure (`bpr_pool_step`): its pool is drawn from
the EMPIRICAL positive-item distribution (template:1123-1127), selection
is "first non-positive of bpr_tries rolled draws" (no scoring needed until
the chosen candidate), and the update pass is identical.

Logistic has no negative sampling, so it takes only the sorted-update
half of the machinery (`logistic_sorted_step`).  Explicit feature
matrices up to MAX_FAST_FEAT_NNZ padded nnz/row join the pairwise path
(hybrid mode): representations become weighted feature sums and
feature-table updates run scatter-free (`_aggregated_feature_update`).
Eligibility is static (hyperparameters + pytree types + backend);
anything else — adadelta, lazy L2, wide/chunked feature matrices,
meshes with row-sharded tables, k-OS — stays on the generic `losses`
path, which remains the reference implementation of record for loss
semantics.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lightfm_tpu.config import MAX_LOSS, Hyperparams
from lightfm_tpu.losses import Batch
from lightfm_tpu.ops.representation import (
    batch_representation,
    score_pairs,
    with_unit_bias,
)
from lightfm_tpu.sparse import IdentityRows, PaddedRows, in_positives_slots
from lightfm_tpu.state import ModelState

# Negative-pool size per step.  16384 rows x W floats stays VMEM-friendly
# while giving each example K fresh candidates; at B <= POOL_SIZE the pool
# degenerates to per-example candidate sets (no sharing at all).
POOL_SIZE = 16384

# Below this table footprint (rows * padded width) the dense one-hot MXU
# update in ops.updates already beats everything and the generic path's
# small-model dispatch floor dominates; the pool/sort machinery only pays
# off beyond it.  Also the threshold that keeps the (statistically
# validated) generic path on small CPU test datasets.
MIN_TABLE_ELEMS = 1 << 19

# Hybrid (feature-matrix) fast path: PaddedRows up to this padded width are
# eligible for the pairwise pool path (the genre/tag case — ML-100k item
# features carry <= ~6 nnz/row, StackExchange tags similar).  The pool
# reformulation removes the generic path's dominant hybrid cost (the
# K*B*nnz candidate-representation gathers of `losses._warp_negative_search`
# become one P*nnz pool gather + rotations); feature-table updates run
# scatter-free via `_aggregated_feature_update` when the transposed
# structures are staged, else as expanded-touch scatters
# (`_feature_update`).  Wider feature rows multiply the forward gather
# traffic linearly and belong on the generic/chunked path.
MAX_FAST_FEAT_NNZ = 16


def _feats_eligible(feats) -> bool:
    """Feature types the pairwise fast path handles natively."""
    if isinstance(feats, IdentityRows):
        return True
    return isinstance(feats, PaddedRows) and feats.max_nnz <= MAX_FAST_FEAT_NNZ

# Fast-path configuration lives in Hyperparams (config.py: fast_path,
# pool_kernels, user_pallas, fast_precision, shuffle_mode) so it is
# per-model, checkpointable, and part of the jit cache key.  The env vars
# below OVERRIDE the per-model values at FIT time (process-wide A/B without
# touching code) — nothing is frozen at import any more.
_TRUTHY = {"1", "true", "yes", "on"}
_FALSY = {"0", "false", "no", "off"}
_ENV_OVERRIDES = (
    # (env var, Hyperparams field, value aliases)
    ("LIGHTFM_TPU_FAST_WARP", "fast_path", {"1": "on", "0": "off"}),
    ("LIGHTFM_TPU_POOL_KERNELS", "pool_kernels",
     {"1": "kernels", "0": "einsum"}),
    ("LIGHTFM_TPU_FAST_WARP_USER_PALLAS", "user_pallas", None),  # bool
    ("LIGHTFM_TPU_FAST_WARP_PRECISION", "fast_precision", {}),
    ("LIGHTFM_TPU_FAST_SHUFFLE", "shuffle_mode", {}),
)


def env_override_fields() -> dict:
    """Parse the set LIGHTFM_TPU_* env vars into a Hyperparams-field dict.

    Empty values mean UNSET (``LIGHTFM_TPU_X= cmd`` blanks a var without
    overriding anything).  Boolean fields accept 1/true/yes/on and
    0/false/no/off (anything else raises — a silently-truthy string like
    "false" would invert the request); enum fields pass unrecognised
    values through to Hyperparams' own validation.
    """
    updates = {}
    for env, field, aliases in _ENV_OVERRIDES:
        raw = os.environ.get(env)
        if raw is None or raw == "":
            continue
        if aliases is None:  # strict bool field
            low = raw.strip().lower()
            if low in _TRUTHY:
                updates[field] = True
            elif low in _FALSY:
                updates[field] = False
            else:
                raise ValueError(
                    f"{env}={raw!r}: expected one of "
                    f"{sorted(_TRUTHY | _FALSY)}"
                )
        else:
            updates[field] = aliases.get(raw, raw)
    return updates


def apply_env_overrides(hp: Hyperparams) -> Hyperparams:
    """Fold any set LIGHTFM_TPU_* env vars over the model's fast-path knobs.

    Read at fit time (NOT import time) so one process can A/B by flipping
    the environment between fits; unset vars leave the per-model values
    untouched.  `LightFM.get_params` keeps reporting the constructor
    values — env overrides affect execution, not the sklearn param state.
    """
    import dataclasses

    updates = env_override_fields()
    return dataclasses.replace(hp, **updates) if updates else hp


def _enabled(hp: Hyperparams) -> bool:
    # "auto": TPU backends only — the pool/sort machinery is a win against
    # TPU HBM gather/scatter costs but measured ~2x SLOWER than the generic
    # path on CPU.
    if hp.fast_path == "off":
        return False
    if hp.fast_path == "on":
        return True
    return jax.default_backend() == "tpu"


def _pool_mode(hp: Hyperparams) -> str:
    """Pool scoring/fold implementation for the pairwise fast path.

    Always the rolled-einsum formulation.  The Pallas pool-kernel mode
    was REMOVED in round 5 after losing the composed hardware A/B it had
    been waiting on since round 3 (v5e, 5M x D=64 production shape,
    tools/pool_kernels_ab.py: einsum 11.89M ex/s / 64s compile vs kernels
    10.61M ex/s / 500s compile — the bf16 MXU einsum passes beat the f32
    VPU kernels).  ``pool_kernels="kernels"`` is accepted as a deprecated
    alias so old checkpoints/params still load, with a warning.
    """
    if hp.pool_kernels == "kernels":
        import warnings

        warnings.warn(
            "pool_kernels='kernels' was removed after losing the composed "
            "hardware A/B (doc/roadmap.md); running the einsum mode.",
            stacklevel=3,
        )
    return "einsum"


def _precision(hp: Hyperparams):
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[hp.fast_precision]


def fast_warp_eligible(
    hp: Hyperparams, data, mesh, shuffle: str, batch_size: int,
    table_partition: str = "replicated", shard_examples: bool = False,
):
    """Static gate for the specialised path (trace-time decision).

    Covers WARP and BPR (both pairwise losses share the pool/sort
    machinery; BPR's pool is drawn from the empirical item distribution)
    and logistic (sorted updates only — no sampling).

    Returns the MODE the epoch should run in — ``False`` (generic path) or
    ``"einsum"`` (the rolled-copy XLA pool formulation) — which flows into
    the jitted epoch as part of the static ``fast`` argument.

    With a mesh the path runs DATA-PARALLEL under shard_map (replicated
    tables, batch split over the ``data`` axis; see `fast_epoch`), gated
    on the layouts that keep it exact: replicated tables, replicated
    examples, a global shuffle, and shard-divisible batches (for pairwise
    losses each shard must cover whole pool cycles so the slot math is
    offset-free).
    """
    if not _enabled(hp):
        return False
    if hp.loss not in ("warp", "bpr", "logistic") or hp.adadelta:
        return False
    if hp.loss == "bpr" and data.train_items is None:
        return False
    if hp.item_alpha != 0.0 or hp.user_alpha != 0.0:
        return False
    if shuffle != "global":
        return False
    if mesh is not None:
        if table_partition != "replicated" or shard_examples:
            return False
        if "data" not in mesh.axis_names:
            return False
        n_data = mesh.shape["data"]
        if batch_size % n_data != 0:
            return False
        local_b = batch_size // n_data
        # Pairwise losses: every shard must hold a whole number of pool
        # cycles (slot = global_pos % P stays offset-free per shard).
        if hp.loss != "logistic" and local_b % min(POOL_SIZE, batch_size):
            return False
    identity_only = hp.loss == "logistic" or mesh is not None
    if identity_only:
        # Logistic's fast path is ONLY the sorted-update kernel, which
        # needs identity touches; the shard_map layout passes feature
        # pytrees as replicated operands only for the identity marker.
        if not isinstance(data.user_feats, IdentityRows):
            return False
        if not isinstance(data.item_feats, IdentityRows):
            return False
    else:
        if not _feats_eligible(data.user_feats):
            return False
        if not _feats_eligible(data.item_feats):
            return False
    if hp.loss != "logistic" and data.positives is None:
        return False
    # Pool-fold needs B to be a whole number of pools.
    if batch_size > POOL_SIZE and batch_size % POOL_SIZE != 0:
        return False
    try:
        # Item-table rows: the identity's row count, or the feature count
        # of an explicit feature matrix.
        n_table_rows = data.item_feats.n_cols
    except Exception:
        return False
    from lightfm_tpu.state import table_width

    if n_table_rows * table_width(hp.no_components) < MIN_TABLE_ELEMS:
        return False
    return _pool_mode(hp)


def _hash_u32(x: jax.Array, k: jax.Array) -> jax.Array:
    """Keyed murmur3-style integer finalizer (u32 lattice math, pure VPU)."""
    x = (x ^ k) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _feistel_batch_of(n: int, n_batches: int, kperm) -> jax.Array:
    """Random balanced example->batch assignment as a pointwise bijection.

    Views index ``i`` on the mixed-radix grid ``(q, r) = (i // R, i % R)``
    with ``R = n_batches`` and runs four Feistel rounds whose round
    function is a keyed integer hash, using modular addition as the group
    op (Luby-Rackoff needs only a group law, so non-power-of-two radices
    are fine).  The composed map is a bijection on ``[0, n)``, so every
    batch id gets EXACTLY ``batch_size`` members — the same balance
    guarantee the sort-based permutation gives — at ~25 VPU ops per
    element instead of a full 6-column device sort.

    Batch MEMBERSHIP is what this decides; within-batch order is then
    fixed by the item sort (batched updates commute, and each example's
    pool-candidate slots are i.i.d. uniform regardless of its position),
    so replacing the uniform permutation with a 4-round keyed PRP keeps
    the training statistics — validated by the same oracle-parity and
    accuracy-floor batteries that validate pool sampling itself.
    """
    R = jnp.uint32(n_batches)
    Q = jnp.uint32(n // n_batches)
    ks = jax.random.bits(kperm, (4,), jnp.uint32)
    i = jax.lax.iota(jnp.uint32, n)
    q, r = i // R, i % R
    # Consecutive indices share q and walk r, so mix q from r first.
    # Each round function is reduced into its radix BEFORE the modular
    # addition: q < Q and (hash % Q) < Q, so the u32 sum cannot wrap and
    # every round is an exact add-mod-radix bijection.  (Adding the raw
    # u32 hash first would overflow mod 2^32 before the mod-Q reduction,
    # breaking the bijection and hence the exact batch balance.)
    q = (q + _hash_u32(r, ks[0]) % Q) % Q
    r = (r + _hash_u32(q, ks[1]) % R) % R
    q = (q + _hash_u32(r, ks[2]) % Q) % Q
    r = (r + _hash_u32(q, ks[3]) % R) % R
    return r.astype(jnp.int32)


def _ceil_bits(n: int) -> int:
    """Bits needed to hold ids in [0, n)."""
    return max(1, (int(n) - 1).bit_length())


def shuffle_item_sorted(
    packed, kperm, n_batches: int, batch_size: int, mode: str = "feistel",
    n_users: int | None = None, n_items: int | None = None,
):
    """Per-epoch shuffle emitting item-sorted batches + user-sort metadata.

    Two device sorts over the packed example block (payload = the 5
    meaningful columns), after a pointwise random batch assignment:

    1. ``_feistel_batch_of`` -> each example's batch id (keyed bijection;
       exact ``batch_size`` balance, no sort). ``mode="sort"`` instead
       draws random u32 keys and sorts, i.e. a uniform permutation — the
       round-2 formulation, kept for A/B (``hp.shuffle_mode``);
    2. (batch, item id) -> each batch's slice sorted by positive item
       (batch membership fixed by step 1; within-batch order is free since
       batched updates commute);
    3. (batch, user id) carrying the within-batch position -> the batch's
       user ids in sorted order plus the permutation ``sigma`` mapping
       user-sorted slots back into item-sorted slots.

    Returns ``(shuffled [n_batches, 5, B], suid [n_batches, B],
    sigma [n_batches, B])``.
    """
    n = packed.shape[1]
    batch_of = (jnp.arange(n, dtype=jnp.int32) // batch_size).astype(jnp.int32)

    # Key packing: when (batch bits + id bits) fit u32, the two-key sorts
    # become single-PACKED-key sorts with one less operand each — measured
    # ~25% off the shuffle on v5e (sort cost scales with operand count and
    # key passes).  lax.sort is stable, and equal packed keys are exactly
    # equal (batch, id) pairs, so the output is BITWISE identical to the
    # two-key form; ids out of declared range (never produced by staging)
    # would corrupt the pack, hence the fit checks.
    nb_bits = _ceil_bits(n_batches)
    ib = _ceil_bits(n_items) if n_items else 33
    ub = _ceil_bits(n_users) if n_users else 33

    if mode == "sort":
        r = jax.random.bits(kperm, (n,), jnp.uint32)
        cols = jax.lax.sort([r] + [packed[i] for i in range(5)], num_keys=1)[1:]
        skeys = [batch_of, cols[1], cols[0], cols[2], cols[3], cols[4]]
        s = jax.lax.sort(skeys, num_keys=2)
        item_s, user_s, v_s, w_s, valid_s = s[1], s[2], s[3], s[4], s[5]
    elif nb_bits + ib <= 32:
        assign = _feistel_batch_of(n, n_batches, kperm)
        key1 = (assign.astype(jnp.uint32) << ib) | packed[1].astype(jnp.uint32)
        s = jax.lax.sort(
            [key1, packed[0], packed[2], packed[3], packed[4]], num_keys=1
        )
        item_s = (s[0] & jnp.uint32((1 << ib) - 1)).astype(jnp.int32)
        user_s, v_s, w_s, valid_s = s[1], s[2], s[3], s[4]
    else:
        assign = _feistel_batch_of(n, n_batches, kperm)
        skeys = [assign] + [packed[i] for i in (1, 0, 2, 3, 4)]
        s = jax.lax.sort(skeys, num_keys=2)
        item_s, user_s, v_s, w_s, valid_s = s[1], s[2], s[3], s[4], s[5]
    shuffled = jnp.stack([user_s, item_s, v_s, w_s, valid_s]).reshape(
        5, n_batches, batch_size
    )
    shuffled = jnp.swapaxes(shuffled, 0, 1)  # [n_batches, 5, B]

    pos_in_batch = (jnp.arange(n, dtype=jnp.int32) % batch_size).astype(jnp.int32)
    if nb_bits + ub <= 32:
        key2 = (batch_of.astype(jnp.uint32) << ub) | user_s.astype(jnp.uint32)
        su = jax.lax.sort([key2, pos_in_batch], num_keys=1)
        suid = (su[0] & jnp.uint32((1 << ub) - 1)).astype(jnp.int32)
        sigma = su[1]
    else:
        su = jax.lax.sort([batch_of, user_s, pos_in_batch], num_keys=2)
        suid, sigma = su[1], su[2]
    return shuffled, suid.reshape(n_batches, batch_size), sigma.reshape(
        n_batches, batch_size
    )


def _unpack_batch5(packed: jax.Array) -> Batch:
    """[5, B] int32 packed rows -> Batch (float rows bitcast back)."""
    return Batch(
        user_ids=packed[0],
        item_ids=packed[1],
        y=jax.lax.bitcast_convert_type(packed[2], jnp.float32),
        weight=jax.lax.bitcast_convert_type(packed[3], jnp.float32),
        valid=packed[4] > 0,
    )


def _sorted_update(table, acc, sidx, wg, lr: float, use_pallas: bool,
                   precision=jax.lax.Precision.HIGHEST):
    """Adagrad update over SORTED touches: Pallas kernel on TPU, the
    semantically-identical XLA scatter elsewhere (pre-batch accumulator
    rule either way; zero-gradient touches are exact no-ops)."""
    if use_pallas:
        from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas

        return sorted_adagrad_update_pallas(
            table, acc, sidx, wg, learning_rate=lr, precision=precision
        )
    lrl = lr * jax.lax.rsqrt(acc[sidx])
    table = table.at[sidx].add(-(lrl * wg))
    acc = acc.at[sidx].add(wg * wg)
    return table, acc


def _feature_update(table, acc, feats: PaddedRows, rows, g, lr: float,
                    g2=None):
    """Adagrad update through an explicit feature matrix: per-row gradients
    ``g`` expand to per-(row, feature) touches ``w_f * g`` and scatter-add
    (`update_features`, template:392-451, batched).

    Same conventions as `_sorted_update`: the table moves by ``-lr_local *
    touch_grad`` with the PRE-call accumulator, and zero-weight padding
    slots are exact no-ops.  ``g2`` overrides the squared-gradient stream
    for callers whose ``g`` is already a fold of per-example terms (the
    pool negatives, where sum-of-squares != square-of-sum).
    """
    idx = feats.idx[rows]  # [B, P]
    w = feats.wts[rows]  # [B, P]
    W = g.shape[-1]
    fidx = idx.reshape(-1)
    fwg = (w[..., None] * g[:, None, :]).reshape(-1, W)
    if g2 is None:
        fwg2 = fwg * fwg
    else:
        fwg2 = ((w * w)[..., None] * g2[:, None, :]).reshape(-1, W)
    lrl = lr * jax.lax.rsqrt(acc[fidx])
    table = table.at[fidx].add(-(lrl * fwg))
    acc = acc.at[fidx].add(fwg2)
    return table, acc


class TransposedFeats(NamedTuple):
    """Transposed feature lists split by row width for the aggregated
    hybrid update (`model._transposed_features` builds it at staging).

    ``thin``: PaddedRows over the narrow rows (identity columns transpose
    to width-1 rows) — walked with cheap [block, C] gathers.
    ``fat_rows``/``fat_w``/``fat_w2``: the wide rows (tag/genre columns
    list hundreds of entities) as DENSE ``[M, n_entities]`` weight
    matrices — their walk is an MXU matmul against ``G`` instead of a
    padding-inflated gather.  ``fat_w2`` holds the SQUARED weights for
    the squared-gradient half; when every weight is exactly representable
    squared (the ubiquitous binary-weight case) it is the SAME array as
    ``fat_w``.  Stored bf16 under ``fast_precision="default"`` (the MXU
    pass truncates the operand to bf16 anyway, so pre-truncating is
    bit-identical and halves the HBM stream).
    """

    thin: PaddedRows
    fat_rows: jax.Array | None  # int32 [M] feature ids of the fat rows
    fat_w: jax.Array | None  # [M, n_entities] weights (f32 or bf16)
    fat_w2: jax.Array | None  # [M, n_entities] squared weights


def _transposed_feature_sums(feats_T, G: jax.Array, block: int = 8192,
                             precision=jax.lax.Precision.HIGHEST):
    """Per-feature weighted sums of per-entity gradient rows.

    ``G`` is the ``[n_entities, 2W]`` stacked ``[G1 | G2]`` block of
    per-entity gradient sums; ``feats_T`` is the TRANSPOSED feature
    structure (row f lists the entities carrying feature f with weights
    ``w``).  Returns ``[n_features, 2W]`` with
    ``S1[f] = sum_e w * G1[e]`` and ``S2[f] = sum_e w^2 * G2[e]`` — the
    exact per-feature gradient / squared-gradient sums of the expanded
    per-(entity, feature) touch set (`_feature_update`), computed with
    ZERO scatters: gathers over the transposed lists plus einsums.
    Blocked over features so the [block, P, 2W] gather stays bounded.
    """
    W2 = G.shape[1]
    W = W2 // 2

    def fold(idx, w):
        # ``precision`` comes from hp.fast_precision: HIGHEST keeps the
        # hybrid update bit-comparable to the scatter formulation /
        # generic path; DEFAULT takes the bf16 MXU passes like the rest
        # of the fast path.
        emb = G[idx]  # [..., P, 2W]
        s1 = jnp.einsum("...p,...pd->...d", w, emb[..., :W],
                        precision=precision)
        s2 = jnp.einsum("...p,...pd->...d", w * w, emb[..., W:],
                        precision=precision)
        return jnp.concatenate([s1, s2], axis=-1)

    fat = None
    if isinstance(feats_T, TransposedFeats):
        fat = feats_T
        feats_T = feats_T.thin
    if isinstance(feats_T, PaddedRows):
        base_idx, base_wts = feats_T.idx, feats_T.wts
        over = None
    else:  # ChunkedRows
        base_idx, base_wts = feats_T.base.idx, feats_T.base.wts
        over = feats_T

    # Every fold materialises a [rows, width, 2W] gather; bound it to
    # ~128MB f32 regardless of the structure's padded width.
    budget_elems = 1 << 25
    F = base_idx.shape[0]
    per_row = max(1, base_idx.shape[1] * W2)
    block = max(8, min(block, budget_elems // per_row))
    n_blocks = -(-F // block)
    f_pad = n_blocks * block
    rows = jnp.arange(f_pad, dtype=jnp.int32) % F  # wrapped pad (discarded)

    def body(_, blk_rows):
        return None, fold(base_idx[blk_rows], base_wts[blk_rows])

    _, S = jax.lax.scan(body, None, rows.reshape(n_blocks, block))
    S = S.reshape(f_pad, W2)[:F]

    if over is not None:
        # Overflow tier: fold each chunk over its M+1 overflow rows (row M
        # is all-zero padding), then route back per feature via over_slot.
        # Wide chunks are re-split column-wise so each fold's gather stays
        # inside the budget (column splits just add more summands).
        oi, ow = over.over_idx, over.over_wts
        n_ch, M1, C = oi.shape
        sub = C
        while sub > 8 and M1 * sub * W2 > budget_elems:
            sub //= 2
        if sub < C:
            k = C // sub
            oi = oi.reshape(n_ch, M1, k, sub).transpose(0, 2, 1, 3).reshape(
                n_ch * k, M1, sub
            )
            ow = ow.reshape(n_ch, M1, k, sub).transpose(0, 2, 1, 3).reshape(
                n_ch * k, M1, sub
            )

        def chunk_body(acc, xs):
            idx_c, wts_c = xs  # [M+1, sub]
            return acc + fold(idx_c, wts_c)[over.over_slot], None

        S, _ = jax.lax.scan(chunk_body, S, (oi, ow))

    if fat is not None and fat.fat_rows is not None:
        # Fat tier: S1 += W @ G1, S2 += W^2 @ G2 on the MXU.  bf16 weight
        # storage composes with a DEFAULT-precision pass (identical
        # truncation); f32 storage runs HIGHEST for exactness.
        s1 = jnp.dot(
            fat.fat_w, G[:, :W], preferred_element_type=jnp.float32,
            precision=precision,
        )
        s2 = jnp.dot(
            fat.fat_w2, G[:, W:], preferred_element_type=jnp.float32,
            precision=precision,
        )
        S = S.at[fat.fat_rows].add(jnp.concatenate([s1, s2], axis=1))
    return S


def _aggregated_feature_update(table, acc, feats_T, G, lr: float,
                               precision=jax.lax.Precision.HIGHEST):
    """Scatter-free adagrad update through an explicit feature matrix.

    Exact reformulation of one expanded-touch `_feature_update` call:
    per-feature sums come from the transposed walk, then the table/acc
    move DENSELY (untouched features have zero sums — exact no-ops, and
    every touch reads this call's pre-call accumulator exactly like
    `_feature_update`).  XLA scatters serialize duplicate rows, and
    hybrid feature updates concentrate ~1M touches/step on a few
    thousand hot tag rows — measured 36.8 ms/step at the production
    hybrid shape; this formulation's pieces (per-entity sums on the MXU
    worklist kernel + transposed gathers + dense streams) total ~4 ms.
    """
    W = table.shape[1]
    S = _transposed_feature_sums(feats_T, G, precision=precision)
    lrl = lr * jax.lax.rsqrt(acc)
    table = table - lrl * S[:, :W]
    acc = acc + S[:, W:]
    return table, acc


def _roll_ids(pool_ids, shifts, K: int):
    """K rotated views of the pool's ids ([K, P]; tiny)."""
    return jnp.stack([jnp.roll(pool_ids, -shifts[k], axis=0) for k in range(K)])


def _rolled_reps(pool_reps, shifts, K: int):
    """K rotated copies of the pool's reps ([K, P, W]) — the einsum path's
    materialization, skipped entirely by the Pallas pool kernels."""
    return jnp.stack([jnp.roll(pool_reps, -shifts[k], axis=0) for k in range(K)])


def _nrep_einsum(onehot, rp, Q: int, P: int, precision):
    """Selected-candidate reps via one-hot contraction over rolled copies."""
    K = rp.shape[0]
    W = rp.shape[2]
    return jnp.einsum(
        "kqs,ksd->qsd", onehot.reshape(K, Q, P), rp, precision=precision
    ).reshape(Q * P, W)


def _fold_gp_einsum(sel, u1q, shifts, precision):
    """Pool-space gradient fold via einsums over rolled copies: returns
    (gp, gp2) [P, W] — sum of sel-weighted u1 (and sel^2-weighted u1^2)
    at each candidate's pool slot."""
    K = sel.shape[0]
    Q, P, W = u1q.shape
    selq = sel.reshape(K, Q, P)
    sel2q = (sel * sel).reshape(K, Q, P)
    # hp.fast_precision controls these MXU contractions: "default" (the
    # shipped default) runs bf16-input/f32-accumulate passes — validated
    # statistically indistinguishable from exact f32 at 1.4-1.7x speed
    # (tools/precision_ab.py) — while "highest" keeps them f32 to match
    # the generic path's gradients bit-for-bit.
    g_roll = jnp.einsum(
        "kqs,qsd->ksd", selq, u1q, precision=precision
    )  # [K, P, W] rolled space
    g2_roll = jnp.einsum("kqs,qsd->ksd", sel2q, u1q * u1q, precision=precision)
    gp = jnp.zeros((P, W), jnp.float32)
    gp2 = jnp.zeros((P, W), jnp.float32)
    for k in range(K):  # fold rotations back to pool slots
        gp = gp + jnp.roll(g_roll[k], shifts[k], axis=0)
        gp2 = gp2 + jnp.roll(g2_roll[k], shifts[k], axis=0)
    return gp, gp2


def _apply_pool_updates(
    state: ModelState,
    uid, pos_ids, gi, gu, suid, sigma,
    pool_ids, gp, gp2,
    lr: float, use_pallas: bool, user_pallas: bool,
    precision=jax.lax.Precision.HIGHEST,
    user_feats=None, item_feats=None,
    user_feats_T=None, item_feats_T=None,
):
    """Shared fast-path update pass (positive pair / pool negatives / user).

    ``gp``/``gp2`` are the pool-space [P, W] folded negative gradients
    (and squared gradients) from `_fold_gp_einsum`/`_fold_gp_kernels`;
    ``gi``/``gu`` are the [B, W] positive-item and user gradients in
    losses._apply_pairwise's fused [emb | bias] layout.

    ``user_feats``/``item_feats`` route each side: identity (None or
    IdentityRows) takes the sorted-kernel/direct-scatter paths below;
    an explicit PaddedRows matrix expands to per-(row, feature) touches
    via `_feature_update` (the hybrid case — the sorted kernel needs
    identity touches, but the pool machinery above already removed the
    hybrid path's dominant cost, the K*B*nnz candidate gathers).

    Update order within the step: positive items (pre-step accumulator),
    pool negatives (post-positive accumulator), users (pre-step
    accumulator) — batched updates commute within each group, and the
    cross-group staleness is the same class the synchronous batching
    already introduces.
    """
    item_identity = item_feats is None or isinstance(item_feats, IdentityRows)
    user_identity = user_feats is None or isinstance(user_feats, IdentityRows)

    # --- item table: positive pairs (ids already sorted) ----------------
    if item_identity:
        item_table, item_acc = _sorted_update(
            state.item_table, state.item_acc, pos_ids, -gi, lr, use_pallas,
            precision,
        )
        # --- item table: pool negatives (P-row scatter) -----------------
        lrp = lr * jax.lax.rsqrt(item_acc[pool_ids])
        item_table = item_table.at[pool_ids].add(-(lrp * gp))
        item_acc = item_acc.at[pool_ids].add(gp2)
    elif item_feats_T is not None:
        # Aggregated hybrid update (scatter-free on the feature table):
        # per-item gradient sums -> transposed walk -> dense table move.
        # Positives and pool apply as TWO dense phases so pool touches
        # read the post-positive accumulator, exactly like the sequential
        # `_feature_update` pair they replace (hot tag features see large
        # within-step accumulator bumps; collapsing the phases measurably
        # shifted training quality).
        n_i = item_feats.n_rows
        W = gi.shape[1]
        if use_pallas:
            # Positive ids arrive SORTED: per-item [sum(-gi) | sum(gi^2)]
            # via the one-hot MXU worklist (no scatter at all).
            from lightfm_tpu.ops.pallas_update import sorted_grad_sums_pallas

            Gp = sorted_grad_sums_pallas(
                pos_ids, -gi, n_rows=n_i, precision=precision
            )
        else:
            Gp = jnp.zeros((n_i, 2 * W), jnp.float32).at[pos_ids].add(
                jnp.concatenate([-gi, gi * gi], axis=1)
            )
        item_table, item_acc = _aggregated_feature_update(
            state.item_table, state.item_acc, item_feats_T, Gp, lr,
            precision=precision,
        )
        Gn = jnp.zeros((n_i, 2 * W), jnp.float32).at[pool_ids].add(
            jnp.concatenate([gp, gp2], axis=1)
        )
        item_table, item_acc = _aggregated_feature_update(
            item_table, item_acc, item_feats_T, Gn, lr,
            precision=precision,
        )
    else:
        item_table, item_acc = _feature_update(
            state.item_table, state.item_acc, item_feats, pos_ids, -gi, lr
        )
        item_table, item_acc = _feature_update(
            item_table, item_acc, item_feats, pool_ids, gp, lr, g2=gp2
        )

    # --- user table -----------------------------------------------------
    if not user_identity:
        if user_feats_T is not None:
            n_u = user_feats.n_rows
            W = gu.shape[1]
            if use_pallas:
                from lightfm_tpu.ops.pallas_update import (
                    sorted_grad_sums_pallas,
                )

                # suid/sigma give the user-sorted gradient stream (the
                # same reorder the identity user_pallas path uses).
                Gu = sorted_grad_sums_pallas(
                    suid, gu[sigma], n_rows=n_u, precision=precision
                )
            else:
                Gu = jnp.zeros((n_u, 2 * W), jnp.float32).at[uid].add(
                    jnp.concatenate([gu, gu * gu], axis=1)
                )
            user_table, user_acc = _aggregated_feature_update(
                state.user_table, state.user_acc, user_feats_T, Gu, lr,
                precision=precision,
            )
        else:
            user_table, user_acc = _feature_update(
                state.user_table, state.user_acc, user_feats, uid, gu, lr
            )
    elif user_pallas:
        sgu = gu[sigma]  # reorder gradients into user-sorted order
        user_table, user_acc = _sorted_update(
            state.user_table, state.user_acc, suid, sgu, lr, use_pallas,
            precision,
        )
    else:
        lru = lr * jax.lax.rsqrt(state.user_acc[uid])
        user_table = state.user_table.at[uid].add(-(lru * gu))
        user_acc = state.user_acc.at[uid].add(gu * gu)

    return state._replace(
        item_table=item_table,
        item_acc=item_acc,
        user_table=user_table,
        user_acc=user_acc,
    )


def _gather_grads(axis_name, *arrays):
    """All-gather per-shard gradient/id streams back to full batch order
    (shard r holds global slice r, so tiled gathers restore the global
    item-sorted order the update kernels require)."""
    return tuple(
        jax.lax.all_gather(a, axis_name, axis=0, tiled=True) for a in arrays
    )


def warp_pool_step(
    state: ModelState,
    batch: Batch,
    positives,
    suid: jax.Array,  # int32 [B] batch user ids, sorted ascending
    sigma: jax.Array,  # int32 [B] position in the item-sorted batch of the
    #                    b-th user-sorted element
    hp: Hyperparams,
    key: jax.Array,
    *,
    n_items: int,
    use_pallas: bool,
    user_pallas: bool,
    n_shards: int = 1,
    axis_name=None,
    user_feats=None,
    item_feats=None,
    user_feats_T=None,
    item_feats_T=None,
) -> ModelState:
    """One fast-path WARP step over an ITEM-SORTED batch.

    Semantics per example match `losses.warp_step` (first margin violator
    among K draws; rank-weighted, clipped loss; template:784-912) with the
    pool negative source documented in the module docstring.

    Under shard_map (``axis_name`` set) the batch arrays hold this shard's
    contiguous slice of the global item-sorted batch: the forward pass and
    gradients are computed locally (the expensive row gathers parallelize
    n_shards ways against the replicated tables), then the gradient
    streams are all-gathered / pool folds psum'd and the table updates
    applied identically on every shard — exactly the single-chip update.
    """
    uid, pos_ids = batch.user_ids, batch.item_ids
    B = uid.shape[0]
    K = hp.max_sampled
    P = min(POOL_SIZE, B * n_shards)
    Q = B // P
    W = state.item_table.shape[1]
    kp, kr = jax.random.split(key)

    # batch_representation == a direct row gather for identity features;
    # with an explicit feature matrix it is the weighted feature sum
    # (compute_representation, template:287-317).  Sorted pos_ids keep the
    # identity gather coalesced.
    u = batch_representation(state.user_table, user_feats, uid)  # [B, W]
    prep = batch_representation(state.item_table, item_feats, pos_ids)

    pool_ids = jax.random.randint(kp, (P,), 0, n_items, dtype=jnp.int32)
    shifts = jax.random.randint(kr, (K,), 0, P, dtype=jnp.int32)
    pool_reps = batch_representation(state.item_table, item_feats, pool_ids)
    rids = _roll_ids(pool_ids, shifts, K)

    u1 = with_unit_bias(u)  # [B, W]
    pos_pred = score_pairs(u, prep)  # [B]
    prec = _precision(hp)
    # preds[k, q*P+s] = dot(emb_u, emb_i) + item_bias (via the unit-bias
    # trick) + user_bias, exactly _score_candidates' scoring.
    # hp.fast_precision: at "highest" candidate scores are f32 like the
    # generic path's `_score_candidates`; at the shipped "default" they
    # take bf16 MXU passes, which shifts individual margin-violator picks
    # but not the training statistics (3-seed A/B: AUC trajectories
    # identical to 4 decimals — tools/precision_ab.py).
    rp = _rolled_reps(pool_reps, shifts, K)
    u1q = u1.reshape(Q, P, W)
    preds = (
        jnp.einsum("qsd,ksd->kqs", u1q, rp, precision=prec)
        + u[:, -1].reshape(1, Q, P)
    ).reshape(K, B)
    cand_ids = jnp.broadcast_to(rids[:, None, :], (K, Q, P)).reshape(K, B)

    violates = preds > pos_pred[None, :] - 1.0  # template:875
    is_pos = in_positives_slots(positives, uid, cand_ids)  # template:878
    cand = violates & (~is_pos)
    found = cand.any(axis=0)
    j = jnp.argmax(cand, axis=0)
    sampled = (j + 1).astype(jnp.float32)
    rank_weight = jnp.log(jnp.maximum(1.0, jnp.floor((n_items - 1) / sampled)))
    loss = jnp.minimum(batch.weight * rank_weight, MAX_LOSS)  # template:881-885
    upd = batch.valid & (batch.y > 0) & found  # template:831
    lossm = jnp.where(upd, loss, 0.0)  # [B]; masked examples are exact no-ops

    onehot = (j[None, :] == jnp.arange(K, dtype=j.dtype)[:, None]).astype(
        jnp.float32
    )  # [K, B]
    nrep = _nrep_einsum(onehot, rp, Q, P, prec)
    sel = onehot * lossm[None, :]  # [K, B] gradient weight per candidate
    gp, gp2 = _fold_gp_einsum(sel, u1q, shifts, prec)

    # Gradients (warp_update, template:537-649; layout of losses._apply_pairwise).
    gi = lossm[:, None] * u1  # [B, W] (+ at the negative, - at the positive)
    gu = lossm[:, None] * with_unit_bias(nrep - prep)  # [B, W]

    if axis_name is not None:
        gi, gu, uid, pos_ids = _gather_grads(axis_name, gi, gu, uid, pos_ids)
        gp = jax.lax.psum(gp, axis_name)
        gp2 = jax.lax.psum(gp2, axis_name)

    return _apply_pool_updates(
        state, uid, pos_ids, gi, gu, suid, sigma, pool_ids, gp, gp2,
        hp.learning_rate, use_pallas, user_pallas, prec,
        user_feats=user_feats, item_feats=item_feats,
        user_feats_T=user_feats_T, item_feats_T=item_feats_T,
    )


def bpr_pool_step(
    state: ModelState,
    batch: Batch,
    positives,
    train_items: jax.Array,
    suid: jax.Array,
    sigma: jax.Array,
    hp: Hyperparams,
    key: jax.Array,
    *,
    n_items: int,
    use_pallas: bool,
    user_pallas: bool,
    n_shards: int = 1,
    axis_name=None,
    user_feats=None,
    item_feats=None,
    user_feats_T=None,
    item_feats_T=None,
) -> ModelState:
    """One fast-path BPR step over an ITEM-SORTED batch.

    Semantics per example match `losses.bpr_step` (``fit_bpr``,
    template:1074-1182): the negative is the first of ``bpr_tries`` draws
    from the EMPIRICAL positive-item distribution (template:1123-1127) that
    is not one of the user's positives, falling through to the last draw.
    The pool holds empirical draws (``train_items`` at random positions);
    selection needs no scores, so only the chosen candidate is scored.
    Sharded execution mirrors `warp_pool_step` (local forward, gathered
    updates).
    """
    del n_items
    uid, pos_ids = batch.user_ids, batch.item_ids
    B = uid.shape[0]
    T = hp.bpr_tries
    P = min(POOL_SIZE, B * n_shards)
    Q = B // P
    W = state.item_table.shape[1]
    kp, kr = jax.random.split(key)

    u = batch_representation(state.user_table, user_feats, uid)
    prep = batch_representation(state.item_table, item_feats, pos_ids)

    n_examples = train_items.shape[0]
    pool_ids = train_items[
        jax.random.randint(kp, (P,), 0, n_examples, dtype=jnp.int32)
    ]
    shifts = jax.random.randint(kr, (T,), 0, P, dtype=jnp.int32)
    pool_reps = batch_representation(state.item_table, item_feats, pool_ids)
    rids = _roll_ids(pool_ids, shifts, T)
    cand_ids = jnp.broadcast_to(rids[:, None, :], (T, Q, P)).reshape(T, B)

    ok = ~in_positives_slots(positives, uid, cand_ids)  # [T, B]
    j = jnp.where(ok.any(axis=0), jnp.argmax(ok, axis=0), T - 1)
    u1 = with_unit_bias(u)
    prec = _precision(hp)
    rp = _rolled_reps(pool_reps, shifts, T)
    u1q = u1.reshape(Q, P, W)
    onehot = (j[None, :] == jnp.arange(T, dtype=j.dtype)[:, None]).astype(
        jnp.float32
    )
    nrep = _nrep_einsum(onehot, rp, Q, P, prec)

    pos_pred = score_pairs(u, prep)
    neg_pred = score_pairs(u, nrep)
    loss = batch.weight * (1.0 - jax.nn.sigmoid(pos_pred - neg_pred))  # :1158
    upd = batch.valid & (batch.y > 0)  # template:1116
    lossm = jnp.where(upd, loss, 0.0)

    sel = onehot * lossm[None, :]
    gp, gp2 = _fold_gp_einsum(sel, u1q, shifts, prec)

    gi = lossm[:, None] * u1
    gu = lossm[:, None] * with_unit_bias(nrep - prep)

    if axis_name is not None:
        gi, gu, uid, pos_ids = _gather_grads(axis_name, gi, gu, uid, pos_ids)
        gp = jax.lax.psum(gp, axis_name)
        gp2 = jax.lax.psum(gp2, axis_name)

    return _apply_pool_updates(
        state, uid, pos_ids, gi, gu, suid, sigma, pool_ids, gp, gp2,
        hp.learning_rate, use_pallas, user_pallas, prec,
        user_feats=user_feats, item_feats=item_feats,
        user_feats_T=user_feats_T, item_feats_T=item_feats_T,
    )


def logistic_sorted_step(
    state: ModelState,
    batch: Batch,
    suid: jax.Array,
    sigma: jax.Array,
    hp: Hyperparams,
    *,
    use_pallas: bool,
    user_pallas: bool,
    axis_name=None,
) -> ModelState:
    """One fast-path LOGISTIC step over an ITEM-SORTED batch.

    Per-example math matches `losses.logistic_step` exactly
    (``fit_logistic``, template:694-781): sigmoid prediction, y = 1 iff
    value > 0, gradient ``weight * (pred - y)``; there is no negative
    sampling, so the pool machinery is unused — the win is purely the
    sorted Pallas table updates replacing the duplicate-index scatters.
    Sharded execution mirrors `warp_pool_step` (local forward, gathered
    updates).
    """
    uid, iid = batch.user_ids, batch.item_ids
    u = state.user_table[uid]  # [B, W]
    irep = state.item_table[iid]  # sorted ids -> coalesced gather
    pred = jax.nn.sigmoid(score_pairs(u, irep))
    y01 = (batch.y > 0).astype(jnp.float32)  # template:751-758
    loss = jnp.where(batch.valid, batch.weight * (pred - y01), 0.0)

    # _apply_pointwise's fused [emb grads | bias grad] layout.
    gi = loss[:, None] * with_unit_bias(u)  # [B, W]
    gu = loss[:, None] * with_unit_bias(irep)

    if axis_name is not None:
        gi, gu, uid, iid = _gather_grads(axis_name, gi, gu, uid, iid)

    prec = _precision(hp)
    item_table, item_acc = _sorted_update(
        state.item_table, state.item_acc, iid, gi, hp.learning_rate,
        use_pallas, prec,
    )
    if user_pallas:
        user_table, user_acc = _sorted_update(
            state.user_table, state.user_acc, suid, gu[sigma],
            hp.learning_rate, use_pallas, prec,
        )
    else:
        lru = hp.learning_rate * jax.lax.rsqrt(state.user_acc[uid])
        user_table = state.user_table.at[uid].add(-(lru * gu))
        user_acc = state.user_acc.at[uid].add(gu * gu)

    return state._replace(
        item_table=item_table,
        item_acc=item_acc,
        user_table=user_table,
        user_acc=user_acc,
    )


def fast_epoch(
    state: ModelState, data, key, hp: Hyperparams, batch_size: int,
    mode="einsum", mesh=None,
):
    """One fast-path epoch: item-sorted shuffle + scan over sorted batches.

    ``mode`` is the static value from `fast_warp_eligible`; any truthy
    value runs the rolled-einsum formulation (the only pool implementation
    since the round-5 A/B removed the Pallas pool kernels).

    With a ``mesh`` (replicated tables + replicated examples; gated by
    `fast_warp_eligible`), each step runs under shard_map over the
    ``data`` axis: the shuffle and table updates are computed identically
    on every device, while the per-example forward/gradient work — the
    row gathers and pool contractions that dominate the step — is split
    over the batch.  The all-gathered update streams make the applied
    update numerically identical to the single-chip step (the psum'd pool
    folds sum the same per-example terms in shard order).
    """
    del mode  # historical: the Pallas pool-kernel mode was removed (r5 A/B)
    n_pad = data.packed.shape[1]
    n_batches = n_pad // batch_size
    kperm, kbatch = jax.random.split(key)
    keys = jax.random.split(kbatch, n_batches)

    n_items = data.item_feats.n_rows
    shuffled, suid, sigma = shuffle_item_sorted(
        data.packed, kperm, n_batches, batch_size, hp.shuffle_mode,
        n_users=data.user_feats.n_rows, n_items=n_items,
    )
    use_pallas = jax.default_backend() == "tpu"
    user_pallas = hp.user_pallas
    n_data = mesh.shape["data"] if mesh is not None else 1

    def step(state, batch, su, sg, bkey, positives, train_items, axis_name,
             user_feats=None, item_feats=None,
             user_feats_T=None, item_feats_T=None):
        if hp.loss == "logistic":
            return logistic_sorted_step(
                state, batch, su, sg, hp,
                use_pallas=use_pallas, user_pallas=user_pallas,
                axis_name=axis_name,
            )
        if hp.loss == "bpr":
            return bpr_pool_step(
                state, batch, positives, train_items, su, sg, hp,
                bkey, n_items=n_items, use_pallas=use_pallas,
                user_pallas=user_pallas,
                n_shards=n_data, axis_name=axis_name,
                user_feats=user_feats, item_feats=item_feats,
                user_feats_T=user_feats_T, item_feats_T=item_feats_T,
            )
        return warp_pool_step(
            state, batch, positives, su, sg, hp, bkey,
            n_items=n_items, use_pallas=use_pallas,
            user_pallas=user_pallas,
            n_shards=n_data, axis_name=axis_name,
            user_feats=user_feats, item_feats=item_feats,
            user_feats_T=user_feats_T, item_feats_T=item_feats_T,
        )

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        def rep_specs(tree):
            return jax.tree.map(lambda x: PS(*([None] * jnp.ndim(x))), tree)

        def sharded_step(state, packed, su, sg, bkey, positives, train_items):
            # Eligibility pins the mesh layout to identity features, so the
            # feature pytrees stay out of the shard_map signature (None ==
            # identity-by-construction inside the steps).
            return step(
                state, _unpack_batch5(packed), su, sg, bkey,
                positives, train_items, "data",
            )

        step_sm = shard_map(
            sharded_step,
            mesh=mesh,
            in_specs=(
                rep_specs(state),
                PS(None, "data"),  # packed [5, B]: split the batch
                PS(None),  # suid: full batch (update side)
                PS(None),  # sigma
                PS(),  # key
                rep_specs(data.positives),
                rep_specs(data.train_items),
            ),
            out_specs=rep_specs(state),
            check_vma=False,
        )

        def body(state, xs):
            packed, su, sg, bkey = xs
            return (
                step_sm(
                    state, packed, su, sg, bkey,
                    data.positives, data.train_items,
                ),
                None,
            )
    else:

        def body(state, xs):
            packed, su, sg, bkey = xs
            batch = _unpack_batch5(packed)
            return (
                step(
                    state, batch, su, sg, bkey,
                    data.positives, data.train_items, None,
                    user_feats=data.user_feats, item_feats=data.item_feats,
                    user_feats_T=data.user_feats_T,
                    item_feats_T=data.item_feats_T,
                ),
                None,
            )

    state, _ = jax.lax.scan(body, state, (shuffled, suid, sigma, keys))
    return state
