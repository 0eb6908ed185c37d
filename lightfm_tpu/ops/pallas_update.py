"""Pallas TPU kernel: blocked adagrad embedding update (scatter-free).

XLA:TPU lowers duplicate-index scatter-adds into serialized row writes —
roughly half of a large WARP epoch.  This kernel reformulates the update
as block-dense linear algebra over SORTED touches:

1. (XLA) sort the M touches by table row (argsort + payload gather,
   ~1.2ms per 262k x 72 on v5e).
2. (XLA) build a WORKLIST of (table block, touch chunk) intersections.
   Sorted touches make chunk block-spans contiguous and the total
   intersection count is bounded by ``n_chunks + n_blocks - 1``; block ids
   along the worklist are NON-DECREASING, so each output block's visits
   are consecutive.
3. (Pallas, 1-D grid over the worklist, scalar-prefetched block/chunk
   ids) every grid step streams one touch chunk against one table block:
   a one-hot [TILE_R, CHUNK] matmul accumulates ``sum_wg`` and
   ``sum_wg2`` on the MXU (duplicates combine in the contraction — no
   serialization), skipping tiles outside the chunk's sorted row span.
   On a block's last visit, adagrad applies blockwise:
   ``table -= lr0 * rsqrt(acc_pre) * sum_wg; acc += sum_wg2`` (the
   pre-batch accumulator rule of ops.updates).

The Pallas pipeline double-buffers the chunk/block DMAs automatically
(the round-1 version's manual DMAs both serialized and required 128-lane
padding of the gradient payload — a ~134MB/step materialisation).
Untouched table blocks are never visited; input/output aliasing leaves
them bit-identical.

Restrictions: adagrad schedule, no lazy-L2 alpha, 2-D tables.
Exactness: matches ops.updates' adagrad branch up to f32 summation order.

STATUS — `sorted_adagrad_update_pallas` is PRODUCTION: it is the table
update of the fast training path (fast_warp._sorted_update), fed
pre-sorted touches by the epoch shuffle, and is differential-tested
(incl. multi-block/ragged/hot-row cases) and verified against numpy on
real v5e at production sizes.  The UNSORTED entry below
(`adagrad_update_pallas` = argsort + the sorted kernel) exists for
microbenchmarks and differential tests only: composed into the generic
epoch it measured ~1.3x slower than XLA's scatters (the per-step argsort
+ payload gather sit on the critical path) and its opt-in integration
crashed with a runtime INVALID_ARGUMENT at B=131072, so the
LIGHTFM_TPU_PALLAS_UPDATE product hook was removed in round 5
(doc/roadmap.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Kernel tiling (env-overridable for A/B measurement; per-process, read at
# import).  Cost model: one-hot MXU flops scale with CHUNK x touched-span,
# block streaming with BLOCK_R x visit count — see tools/update_tune.py.
BLOCK_R = int(_os.environ.get("LIGHTFM_TPU_UPD_BLOCK_R", 2048))
CHUNK = int(_os.environ.get("LIGHTFM_TPU_UPD_CHUNK", 1024))
TILE_R = int(_os.environ.get("LIGHTFM_TPU_UPD_TILE_R", 256))

_SENTINEL = jnp.int32(2**30)  # touch row id that matches no block


def _update_kernel(
    # scalar prefetch
    block_of,  # int32 [L] worklist block ids (non-decreasing; repeats pad)
    chunk_of,  # int32 [L] worklist chunk ids
    flags,  # int32 [L, 2]: [:, 0] first-visit, [:, 1] last-visit
    # blocked inputs
    table_ref,  # VMEM [BLOCK_R, W] (aliased)
    acc_ref,  # VMEM [BLOCK_R, W] (aliased)
    idx_ref,  # VMEM [CHUNK] sorted touch rows for this chunk
    wg_ref,  # VMEM [CHUNK, W] sorted touch gradients
    # outputs
    table_out,
    acc_out,
    # scratch
    sums,  # VMEM [BLOCK_R, 2W]: [:, :W] sum_wg, [:, W:] sum_wg2
    *,
    learning_rate: float,
    precision: jax.lax.Precision,
):
    i = pl.program_id(0)
    block_start = block_of[i] * BLOCK_R
    W = table_ref.shape[1]

    @pl.when(flags[i, 0] == 1)
    def _init():
        sums[...] = jnp.zeros_like(sums)

    local = idx_ref[:] - block_start  # [CHUNK]
    wg = wg_ref[...]
    # One stacked [CHUNK, 2W] payload: each tile then needs a SINGLE
    # one-hot MXU pass for both the gradient and squared-gradient sums
    # (halves the dot count; wg*wg is also hoisted out of the tile loop).
    wgs = jnp.concatenate([wg, wg * wg], axis=1)
    # Sorted touches: only tiles intersecting [min, max] do any work.
    lo = jnp.min(local)
    hi = jnp.max(jnp.where(local < BLOCK_R, local, -1))
    t_lo = jnp.clip(lo // TILE_R, 0, BLOCK_R // TILE_R)
    t_hi = jnp.clip(hi // TILE_R + 1, 0, BLOCK_R // TILE_R)

    def tile_body(t, _):
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_R, CHUNK), 0) + t * TILE_R
        )
        oh = (rows == local[None, :]).astype(jnp.float32)
        # HIGHEST keeps the MXU in full-f32 passes so the per-touch
        # gradients enter the sums exactly ("matches ops.updates up to f32
        # summation order"); DEFAULT runs single-pass (bf16 mantissa inputs,
        # f32 accumulate) at ~6x the MXU rate.  The one-hot operand is 0/1
        # either way, so DEFAULT's only rounding is a bf16 truncation of
        # each gradient before the (exact, f32) summation.
        d = jnp.dot(
            oh, wgs,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        sums[pl.ds(t * TILE_R, TILE_R), :] += d
        return 0

    jax.lax.fori_loop(t_lo, t_hi, tile_body, 0)

    @pl.when(flags[i, 1] == 1)
    def _finalize():
        acc_pre = acc_ref[...]
        lr = learning_rate * jax.lax.rsqrt(acc_pre)
        s = sums[...]
        table_out[...] = table_ref[...] - lr * s[:, :W]
        acc_out[...] = acc_pre + s[:, W:]


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "interpret", "precision")
)
def adagrad_update_pallas(
    table: jax.Array,  # f32 [R, W]
    acc: jax.Array,  # f32 [R, W]
    idx: jax.Array,  # int32 [M] touch rows (sentinel >= R for masked)
    wg: jax.Array,  # f32 [M, W] per-touch gradients (0 for masked)
    *,
    learning_rate: float,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Adagrad table update via the sorted-worklist one-hot-matmul kernel.

    At the default ``precision=HIGHEST`` this exactly matches the XLA
    formulation of ops.updates.sparse_update's adagrad branch (pre-batch
    accumulator lr; duplicate touches summed) up to f32 summation order.
    ``precision=DEFAULT`` truncates each gradient to bf16 mantissa before
    the (still f32) summation and runs ~6x faster on the MXU.
    """
    order = jnp.argsort(idx)
    return sorted_adagrad_update_pallas(
        table, acc, idx[order], wg[order],
        learning_rate=learning_rate, interpret=interpret, precision=precision,
    )



def _build_worklist(sidx, swg, R: int, W: int):
    """Sorted touches -> (padded touches, per-grid-slot block/chunk ids,
    first/last-visit flags, grid length).  Shared by the adagrad-update and
    raw-sums kernels; all shapes static."""
    M = sidx.shape[0]
    # Ragged last block: Pallas pads out-of-bounds block reads and masks
    # out-of-bounds writes, and no real touch lands beyond R, so the tail
    # rows of the final block are never meaningfully read or written.
    n_blocks = -(-R // BLOCK_R)

    m_pad = -(-M // CHUNK) * CHUNK
    if m_pad != M:
        sidx = jnp.concatenate(
            [sidx, jnp.full((m_pad - M,), _SENTINEL, jnp.int32)]
        )
        swg = jnp.concatenate([swg, jnp.zeros((m_pad - M, W), swg.dtype)])
    sidx = jnp.where(sidx >= R, _SENTINEL, sidx)
    n_chunks = m_pad // CHUNK

    # --- worklist construction (all shapes static) ---------------------
    # Chunk c's REAL touches span table blocks [f_c, l_c] (contiguous:
    # sorted).  Sentinels are excluded from the span — a mixed last chunk
    # must not drag its span to the end of the table (that would visit and
    # rewrite every trailing block as a no-op).
    by_chunk = sidx.reshape(n_chunks, CHUNK)
    real = by_chunk < R
    f = jnp.min(jnp.where(real, by_chunk, _SENTINEL), axis=1) // BLOCK_R
    l = jnp.max(jnp.where(real, by_chunk, -1), axis=1) // BLOCK_R
    has_real = real.any(axis=1)
    span = jnp.where(has_real, l - f + 1, 0)
    L = n_chunks + n_blocks  # static upper bound on total intersections
    pos = jnp.cumsum(span) - span  # start slot of chunk c's run
    total = jnp.sum(span)

    slot = jnp.arange(L, dtype=jnp.int32)
    # chunk of slot i: the run containing i (searchsorted over run starts).
    c_of = jnp.clip(
        jnp.searchsorted(pos, slot, side="right").astype(jnp.int32) - 1,
        0,
        n_chunks - 1,
    )
    b_of = (f[c_of] + (slot - pos[c_of])).astype(jnp.int32)
    valid = slot < total
    # Padding slots repeat the last valid block so they neither init nor
    # flush a fresh block; point them at block 0 chunk 0 when empty.
    last_b = jnp.where(total > 0, b_of[jnp.maximum(total - 1, 0)], 0)
    b_of = jnp.where(valid, b_of, last_b).astype(jnp.int32)
    c_of2 = jnp.where(valid, c_of, jnp.where(total > 0, c_of[jnp.maximum(total - 1, 0)], 0))

    prev_b = jnp.concatenate([jnp.full((1,), -1, jnp.int32), b_of[:-1]])
    next_b = jnp.concatenate([b_of[1:], jnp.full((1,), -2, jnp.int32)])
    next_valid = jnp.concatenate([valid[1:], jnp.zeros((1,), bool)])
    first_visit = valid & (b_of != prev_b)
    last_visit = valid & ((b_of != next_b) | (~next_valid))
    # total == 0 (all touches masked/sentinel): slot 0 must still init and
    # flush block 0 as an exact no-op, or the aliased output block would be
    # flushed without ever being written (garbage through the alias).
    empty = total == 0
    first_visit = first_visit.at[0].set(first_visit[0] | empty)
    last_visit = last_visit.at[0].set(last_visit[0] | empty)
    flags = jnp.stack(
        [first_visit.astype(jnp.int32), last_visit.astype(jnp.int32)], axis=1
    )
    return sidx, swg, b_of, c_of2.astype(jnp.int32), flags, L


@functools.partial(
    jax.jit, static_argnames=("learning_rate", "interpret", "precision")
)
def sorted_adagrad_update_pallas(
    table: jax.Array,  # f32 [R, W]
    acc: jax.Array,  # f32 [R, W]
    sidx: jax.Array,  # int32 [M] NON-DECREASING touch rows (masked: wg 0)
    swg: jax.Array,  # f32 [M, W] per-touch gradients in sidx order
    *,
    learning_rate: float,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Sorted-touch entry: skips the sort for callers whose touches arrive
    pre-sorted (e.g. item-sorted batches, where gradient rows are computed
    directly in sorted order and no per-step reorder exists at all).

    Touches with zero gradient are exact no-ops wherever they sort (they
    only widen a block's visited span); rows >= R are clamped to the
    sentinel and excluded from block spans.
    """
    R, W = table.shape
    sidx, swg, b_of, c_of2, flags, L = _build_worklist(sidx, swg, R, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_R, W), lambda i, b, c, fl: (b[i], 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_R, W), lambda i, b, c, fl: (b[i], 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK,), lambda i, b, c, fl: (c[i],), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, W), lambda i, b, c, fl: (c[i], 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (BLOCK_R, W), lambda i, b, c, fl: (b[i], 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLOCK_R, W), lambda i, b, c, fl: (b[i], 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_R, 2 * W), jnp.float32),
        ],
    )

    new_table, new_acc = pl.pallas_call(
        functools.partial(
            _update_kernel, learning_rate=learning_rate, precision=precision
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(
        b_of,
        c_of2,
        flags,
        table,
        acc,
        sidx,  # [m_pad]; blocked as (CHUNK,) runs at chunk offsets
        swg,  # [m_pad, W]; blocked as (CHUNK, W) rows at chunk offsets
    )
    return new_table, new_acc


def _sums_kernel(
    # scalar prefetch
    block_of,
    chunk_of,
    flags,
    # blocked inputs
    zero_ref,  # VMEM [BLOCK_R, 2W] (aliased zeros; passthrough for
    #            blocks the worklist never visits)
    idx_ref,  # VMEM [CHUNK]
    wg_ref,  # VMEM [CHUNK, W]
    # output
    out_ref,  # VMEM [BLOCK_R, 2W]
    # scratch
    sums,
    *,
    precision: jax.lax.Precision,
):
    del zero_ref
    i = pl.program_id(0)
    block_start = block_of[i] * BLOCK_R

    @pl.when(flags[i, 0] == 1)
    def _init():
        sums[...] = jnp.zeros_like(sums)

    local = idx_ref[:] - block_start
    wg = wg_ref[...]
    wgs = jnp.concatenate([wg, wg * wg], axis=1)
    lo = jnp.min(local)
    hi = jnp.max(jnp.where(local < BLOCK_R, local, -1))
    t_lo = jnp.clip(lo // TILE_R, 0, BLOCK_R // TILE_R)
    t_hi = jnp.clip(hi // TILE_R + 1, 0, BLOCK_R // TILE_R)

    def tile_body(t, _):
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_R, CHUNK), 0) + t * TILE_R
        )
        oh = (rows == local[None, :]).astype(jnp.float32)
        d = jnp.dot(
            oh, wgs, preferred_element_type=jnp.float32, precision=precision
        )
        sums[pl.ds(t * TILE_R, TILE_R), :] += d
        return 0

    jax.lax.fori_loop(t_lo, t_hi, tile_body, 0)

    @pl.when(flags[i, 1] == 1)
    def _finalize():
        out_ref[...] = sums[...]


@functools.partial(
    jax.jit, static_argnames=("n_rows", "interpret", "precision")
)
def sorted_grad_sums_pallas(
    sidx: jax.Array,  # int32 [M] NON-DECREASING touch rows
    swg: jax.Array,  # f32 [M, W] per-touch gradients in sidx order
    *,
    n_rows: int,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
):
    """Per-row gradient sums over SORTED touches: returns ``[n_rows, 2W]``
    with ``[:, :W] = sum(wg)`` and ``[:, W:] = sum(wg^2)`` per row —
    the update kernel's accumulation phase WITHOUT the adagrad apply.
    Feeds the hybrid fast path's aggregated feature update
    (`fast_warp._aggregated_feature_update`): per-entity sums computed
    here on the MXU replace a [M]-row duplicate-heavy XLA scatter.
    """
    W = swg.shape[1]
    R = n_rows
    sidx, swg, b_of, c_of2, flags, L = _build_worklist(sidx, swg, R, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_R, 2 * W), lambda i, b, c, fl: (b[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (CHUNK,), lambda i, b, c, fl: (c[i],), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNK, W), lambda i, b, c, fl: (c[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_R, 2 * W), lambda i, b, c, fl: (b[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_R, 2 * W), jnp.float32),
        ],
    )
    zeros = jnp.zeros((R, 2 * W), jnp.float32)
    return pl.pallas_call(
        functools.partial(_sums_kernel, precision=precision),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((R, 2 * W), jnp.float32),
        input_output_aliases={3: 0},
        interpret=interpret,
    )(b_of, c_of2, flags, zeros, sidx, swg)
