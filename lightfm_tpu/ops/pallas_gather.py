"""Pallas TPU kernel: blocked row gather over SORTED indices.

XLA:TPU's row gather is latency-bound (serialized row fetches: ~21ns/row
at [131072] x 288B rows on v5e — ~14 GB/s against an 819 GB/s part) and
does NOT exploit sorted indices.  This kernel reformulates a sorted
gather as block-dense linear algebra, the mirror image of
`ops.pallas_update.sorted_adagrad_update_pallas`:

1. touches arrive SORTED (the fast path's item-sorted batches already
   are; the pool draw is sorted at sampling time);
2. (XLA) build the same worklist of (table block, touch chunk)
   intersections — sorted touches make chunk block-spans contiguous and
   bound the worklist length by ``n_chunks + n_blocks``;
3. (Pallas, 1-D grid over the worklist, scalar-prefetched block/chunk
   ids) each grid step streams one table block against one touch chunk:
   a one-hot ``[CHUNK, TILE_R]`` matmul selects this block's rows into
   the chunk's output tile on the MXU, skipping tiles outside the
   chunk's sorted row span.  The Pallas pipeline double-buffers the
   block DMAs; output chunks stay VMEM-resident across their (adjacent)
   visits.

Rows ``>= n_rows`` (sentinel/padding) gather exact zeros.

Exactness: the one-hot contraction runs ``precision=HIGHEST`` by
default; on the v5e MXU the 0/1 selector reproduces f32 table values
bit-exactly (asserted by tests/test_pallas_gather.py against
``table[sidx]`` on hardware — a one-hot row sums a single 3-term bf16
decomposition of each value, which reconstructs the f32 exactly).
``precision=DEFAULT`` truncates gathered values to bf16 mantissas at
~6x the MXU rate — the fast path's production setting
(``fast_precision="default"``), where downstream contractions truncate
to bf16 anyway.

STATUS — experimental, NOT wired into the fast path.  Correct (bit-exact
at HIGHEST on real v5e, differential-tested in interpret mode) but LOSES
to XLA's gather at the production shape: best measured 1.14 ms/step vs
XLA's 0.96 ms for [131072] sorted rows over [100k, 72] (v5e, 2026-08-19
sweep over chunk/block/tile in {512..8192}).  The cost is NOT the MXU
dots (~0.2 ms) — it is one-hot CONSTRUCTION on the VPU (chunk x span
compares ~= chunk x R element ops per gather) plus ~6us/grid-step fixed
overhead, and the two trade against each other: small chunks pay
overhead, large chunks pay span growth.  Kept as the measured record of
this wall (doc/roadmap.md "gather wall") and as the building block for
shapes where spans are dense (span ~ touches), where it does win.

Reference context: replaces (at TPU scale) the per-example row reads in
`_lightfm_fast.pyx.template:300-420` (compute_representation walks CSR
rows serially per example).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 2048  # table rows per block (matches pallas_update)
CHUNK = 1024  # touches per worklist step
TILE_R = 256  # one-hot tile rows (MXU-friendly)

_SENTINEL = jnp.int32(2**30)


def _gather_kernel(
    # scalar prefetch
    block_of,  # int32 [L] worklist block ids
    chunk_of,  # int32 [L] worklist chunk ids (non-decreasing; repeats pad)
    flags,  # int32 [L, 2]: [:, 0] first visit of this chunk, [:, 1] valid
    # blocked inputs
    idx_ref,  # VMEM [CHUNK] sorted touch rows for this chunk
    table_ref,  # VMEM [BLOCK_R, W] table block
    # outputs
    out_ref,  # VMEM [CHUNK, W] gathered rows for this chunk
    *,
    n_rows: int,
    block_r: int,
    tile_r: int,
    precision: jax.lax.Precision,
):
    i = pl.program_id(0)
    block_start = block_of[i] * block_r

    @pl.when(flags[i, 0] == 1)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    local = idx_ref[:] - block_start  # [CHUNK]; out-of-block rows never match
    # Sorted touches: only tiles intersecting this chunk's span inside the
    # block do any work.  Padding slots (flags[:, 1] == 0) repeat the last
    # (chunk, block) pair and MUST NOT re-accumulate it: collapse their
    # tile range to empty.
    inb = (local >= 0) & (local < block_r)
    lo = jnp.min(jnp.where(inb, local, block_r))
    hi = jnp.max(jnp.where(inb, local, -1))
    t_lo = jnp.clip(lo // tile_r, 0, block_r // tile_r)
    t_hi = jnp.where(
        flags[i, 1] == 1, jnp.clip(hi // tile_r + 1, 0, block_r // tile_r), 0
    )

    chunk = idx_ref.shape[0]

    def tile_body(t, _):
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_r), 1) + t * tile_r
        )
        oh = (cols == local[:, None]).astype(jnp.float32)
        # The last table block is ragged: rows >= n_rows are whatever the
        # OOB block read padded with (NaN in interpret mode) — zero them so
        # 0 * pad cannot poison the contraction.
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_r, 1), 0) + (
            block_start + t * tile_r
        )
        tbl = jnp.where(rows < n_rows, table_ref[pl.ds(t * tile_r, tile_r), :], 0.0)
        out_ref[...] += jnp.dot(
            oh,
            tbl,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return 0

    jax.lax.fori_loop(t_lo, t_hi, tile_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "precision", "chunk", "block_r", "tile_r"),
)
def sorted_gather_pallas(
    table: jax.Array,  # f32 [R, W]
    sidx: jax.Array,  # int32 [M] NON-DECREASING row ids (>= R -> zeros)
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    chunk: int = CHUNK,
    block_r: int = BLOCK_R,
    tile_r: int = TILE_R,
) -> jax.Array:
    """``table[sidx]`` for sorted ``sidx`` via the blocked one-hot kernel.

    Returns f32 [M, W].  Rows >= table.shape[0] gather zeros (sentinel
    padding); duplicate rows are free (they are just extra one-hot rows
    in the same tile pass).
    """
    R, W = table.shape
    M = sidx.shape[0]
    n_blocks = -(-R // block_r)

    m_pad = -(-M // chunk) * chunk
    if m_pad != M:
        sidx = jnp.concatenate(
            [sidx, jnp.full((m_pad - M,), _SENTINEL, jnp.int32)]
        )
    sidx = jnp.where(sidx >= R, _SENTINEL, sidx)
    n_chunks = m_pad // chunk

    # --- worklist construction (all shapes static) ----------------------
    # Chunk c's REAL touches span table blocks [f_c, l_c] (contiguous:
    # sorted).  All-sentinel chunks still get ONE visit against block 0 so
    # their output block is initialized (to zeros) rather than left as
    # whatever the out buffer held.
    by_chunk = sidx.reshape(n_chunks, chunk)
    real = by_chunk < R
    has_real = real.any(axis=1)
    f = jnp.where(
        has_real,
        jnp.min(jnp.where(real, by_chunk, _SENTINEL), axis=1) // block_r,
        0,
    )
    l = jnp.where(
        has_real, jnp.max(jnp.where(real, by_chunk, -1), axis=1) // block_r, 0
    )
    span = l - f + 1  # >= 1 for every chunk
    L = n_chunks + n_blocks  # static upper bound on total intersections
    pos = jnp.cumsum(span) - span  # start slot of chunk c's run
    total = jnp.sum(span)

    slot = jnp.arange(L, dtype=jnp.int32)
    c_of = jnp.clip(
        jnp.searchsorted(pos, slot, side="right").astype(jnp.int32) - 1,
        0,
        n_chunks - 1,
    )
    b_of = (f[c_of] + (slot - pos[c_of])).astype(jnp.int32)
    valid = slot < total
    # Padding slots repeat the last chunk/block so they neither re-init an
    # output chunk nor pull in a fresh block.
    last = jnp.maximum(total - 1, 0)
    b_of = jnp.where(valid, b_of, b_of[last]).astype(jnp.int32)
    c_of = jnp.where(valid, c_of, c_of[last]).astype(jnp.int32)

    prev_c = jnp.concatenate([jnp.full((1,), -1, jnp.int32), c_of[:-1]])
    flags = jnp.stack(
        [
            (valid & (c_of != prev_c)).astype(jnp.int32),
            valid.astype(jnp.int32),
        ],
        axis=1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (chunk,), lambda i, b, c, fl: (c[i],), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_r, W),
                lambda i, b, c, fl: (b[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk, W), lambda i, b, c, fl: (c[i], 0), memory_space=pltpu.VMEM
        ),
    )

    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_rows=R, block_r=block_r, tile_r=tile_r, precision=precision),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, W), jnp.float32),
        interpret=interpret,
    )(b_of, c_of, flags, sidx, table)
    return out[:M] if m_pad != M else out
