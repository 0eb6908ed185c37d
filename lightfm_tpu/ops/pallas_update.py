"""Pallas TPU kernel: blocked adagrad embedding update (scatter-free).

XLA:TPU lowers duplicate-index scatter-adds into serialized row writes
(~24ns/row measured on v5e) — half the WARP epoch.  This kernel reformulates
the update as block-dense linear algebra:

1. (XLA) sort the M touches by table row; compute, per table block of
   ``BLOCK_R`` rows, the chunk range of touches that can land in it
   (searchsorted — touches are sorted, so ranges are contiguous).
2. (Pallas, grid over table blocks) DMA the block's touch chunks from HBM;
   for each chunk build a one-hot [TILE_R, CHUNK] matrix (row == touch
   index) and accumulate ``sum_wg += onehot @ wg`` and
   ``sum_wg2 += onehot @ wg^2`` on the MXU — duplicate touches combine in
   the matmul, no serialization.
3. apply adagrad blockwise: ``table -= lr0 * rsqrt(acc_pre) * sum_wg;
   acc += sum_wg2`` (the pre-batch accumulator rule of ops.updates).

The table/acc blocks stream through VMEM once per update; all compute is
f32 (one-hot values are exact in any dtype; HIGHEST precision keeps the
update bit-faithful to the XLA formulation up to summation order).

Restrictions: adagrad schedule, no lazy-L2 alpha, 2-D tables.

STATUS — experimental, opt-in via LIGHTFM_TPU_PALLAS_UPDATE=1 (adagrad,
alpha==0, TPU only).  Correct everywhere (differential-tested; full WARP
epochs train correctly on v5e with the 32MB kernel VMEM limit).  In an
isolated update-only scan it measures 1.5x faster than the XLA scatter
(7.4ms vs 11.0ms per [262144, 72]-touch step, including its sort), but
composed into the full epoch it is ~1.7x SLOWER end-to-end (1.47s vs
0.84s per 5M-example epoch): the argsort + lane-pad wrapper runs on the
critical path every step and the pallas_call is a pipeline barrier where
XLA's scatters overlap with neighbouring ops.  The follow-up is fusing
the sort into the kernel and double-buffering the chunk DMAs.  Default
training keeps ops.updates' XLA scatters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 2048  # table rows per grid step (VMEM-bounded)
CHUNK = 1024  # touches DMA'd per inner iteration
TILE_R = 256  # one-hot tile rows (MXU-friendly, VMEM-bounded)

_SENTINEL = jnp.int32(2**30)  # touch row id that matches no block


def _update_kernel(
    bounds_ref,  # scalar prefetch: int32 [n_blocks, 2] chunk ranges
    table_ref,  # VMEM [BLOCK_R, W] (aliased output)
    acc_ref,  # VMEM [BLOCK_R, W] (aliased output)
    idx_hbm,  # ANY [m_pad] int32 sorted touch rows
    wg_hbm,  # ANY [n_chunks, CHUNK, Wk] f32 sorted touch gradients (lane-padded)
    table_out,
    acc_out,
    sum_wg,  # VMEM scratch [BLOCK_R, W]
    sum_wg2,  # VMEM scratch [BLOCK_R, W]
    idx_s,  # VMEM scratch [1, CHUNK] int32
    wg_s,  # VMEM scratch [CHUNK, W]
    sem_i,
    sem_w,
    *,
    learning_rate: float,
):
    b = pl.program_id(0)
    block_start = b * BLOCK_R

    sum_wg[...] = jnp.zeros_like(sum_wg)
    sum_wg2[...] = jnp.zeros_like(sum_wg2)

    c_lo = bounds_ref[b, 0]
    c_hi = bounds_ref[b, 1]

    def chunk_body(c, _):
        start = pl.multiple_of(c * CHUNK, CHUNK)
        cp_i = pltpu.make_async_copy(idx_hbm.at[pl.ds(start, CHUNK)], idx_s, sem_i)
        cp_w = pltpu.make_async_copy(wg_hbm.at[c], wg_s, sem_w)
        cp_i.start()
        cp_w.start()
        cp_i.wait()
        cp_w.wait()

        local = idx_s[...] - block_start  # [CHUNK]
        wg = wg_s[...]
        lo = jnp.min(local)
        hi = jnp.max(local)
        # Sorted touches: only tiles intersecting [lo, hi] do any work; a
        # fori_loop (not an unrolled python loop) keeps ONE one-hot buffer
        # live on the VMEM stack.
        t_lo = jnp.clip(lo // TILE_R, 0, BLOCK_R // TILE_R)
        t_hi = jnp.clip(hi // TILE_R + 1, 0, BLOCK_R // TILE_R)

        def tile_body(t, _):
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (TILE_R, CHUNK), 0)
                + t * TILE_R
            )
            oh = (rows == local[None, :]).astype(jnp.float32)
            d1 = jnp.dot(
                oh, wg,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = jnp.dot(
                oh, wg * wg,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            off = pl.ds(t * TILE_R, TILE_R)
            sum_wg[off, :] += d1
            sum_wg2[off, :] += d2
            return 0

        jax.lax.fori_loop(t_lo, t_hi, tile_body, 0)
        return 0

    jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)

    W = table_ref.shape[1]
    acc_pre = acc_ref[...]
    lr = learning_rate * jax.lax.rsqrt(acc_pre)
    table_out[...] = table_ref[...] - lr * sum_wg[:, :W]
    acc_out[...] = acc_pre + sum_wg2[:, :W]


@functools.partial(jax.jit, static_argnames=("learning_rate", "interpret"))
def adagrad_update_pallas(
    table: jax.Array,  # f32 [R, W]
    acc: jax.Array,  # f32 [R, W]
    idx: jax.Array,  # int32 [M] touch rows (sentinel >= R for masked)
    wg: jax.Array,  # f32 [M, W] per-touch gradients (0 for masked)
    *,
    learning_rate: float,
    interpret: bool = False,
):
    """Adagrad table update via the blocked one-hot-matmul kernel.

    Exactly matches the XLA formulation of ops.updates.sparse_update's
    adagrad branch (pre-batch accumulator lr; duplicate touches summed) up
    to f32 summation order.
    """
    R, W = table.shape
    M = idx.shape[0]
    # Manual chunk DMAs need 128-lane alignment; pad the gradient lanes.
    Wk = ((W + 127) // 128) * 128

    order = jnp.argsort(idx)
    sidx = idx[order]
    swg = jnp.zeros((M, Wk), wg.dtype).at[:, :W].set(wg[order])

    m_pad = ((M + CHUNK - 1) // CHUNK) * CHUNK
    if m_pad != M:
        sidx = jnp.concatenate(
            [sidx, jnp.full((m_pad - M,), _SENTINEL, jnp.int32)]
        )
        swg = jnp.concatenate([swg, jnp.zeros((m_pad - M, Wk), swg.dtype)])
    # Out-of-table touches (masked/sentinel) must sort to the tail and never
    # land in a block.
    sidx = jnp.where(sidx >= R, _SENTINEL, sidx)
    n_chunks = m_pad // CHUNK

    n_blocks = (R + BLOCK_R - 1) // BLOCK_R
    # Chunk range per block: touches are sorted, so block b's touches live in
    # chunks [first_touch/CHUNK, (last_touch + CHUNK-1)/CHUNK).
    starts = jnp.searchsorted(sidx, jnp.arange(n_blocks) * BLOCK_R)
    ends = jnp.searchsorted(sidx, (jnp.arange(n_blocks) + 1) * BLOCK_R)
    bounds = jnp.stack([starts // CHUNK, (ends + CHUNK - 1) // CHUNK], axis=1)
    bounds = bounds.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, W), lambda b, _: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, W), lambda b, _: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_R, W), lambda b, _: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, W), lambda b, _: (b, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_R, Wk), jnp.float32),
            pltpu.VMEM((BLOCK_R, Wk), jnp.float32),
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK, Wk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    new_table, new_acc = pl.pallas_call(
        functools.partial(_update_kernel, learning_rate=learning_rate),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(
        bounds,
        table,
        acc,
        sidx,
        swg.reshape(n_chunks, CHUNK, Wk),
    )
    return new_table, new_acc
