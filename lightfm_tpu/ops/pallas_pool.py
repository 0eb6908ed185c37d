"""Pallas TPU kernels for the pool-negative fast path (fast_warp).

The fast pairwise path scores each example against K rotated views of a
shared negative pool and folds violator gradients back into pool space
(`fast_warp.warp_pool_step` / `_apply_pool_updates`).  Its XLA formulation
materializes the K rolled pool copies (``rp`` is ``[K, P, W]`` — ~47MB per
step at production sizes) and re-reads the ``[B, W]`` user block once per
rotation through the scoring/fold einsums.

These kernels exploit the structural fact that makes rolls unnecessary:
example ``b``'s candidate ``k`` lives at pool slot ``(b % P + shift_k) % P``,
so for a CHUNK of consecutive examples the K candidate rows are K
*contiguous* (mod P) slices of the pool.  With the pool VMEM-resident
(wraparound handled by a ``[P + CHUNK, W]`` doubled tail) every operation
becomes chunked VPU slice arithmetic:

- ``pool_scores_pallas``: preds[k, b] = dot(u1[b], pool[slot]) — reads
  ``u1`` ONCE, K in-VMEM slice reads per chunk, rowwise multiply-reduce.
  Replaces the ``einsum("qsd,ksd->kqs")`` over materialized rolls.
- ``pool_fold_pallas``: acc[slot(b, j_b)] += w[b] * x[b] (and optionally
  nrep[b] = pool[slot(b, j_b)]) — the gradient fold-back and selected-
  candidate gather.  The accumulator lives in a VMEM-resident output
  block; overlapping slice updates serialize correctly inside the kernel
  (sequential grid, sequential per-k adds).  Replaces the one-hot einsums
  + K roll-backs.

Replaces the negative-sampling inner loop of ``fit_warp``/``fit_bpr``
(`_lightfm_fast.pyx.template:855-899, 1123-1158`) at the block level.

STATUS — correctness validated in interpret mode and on the CPU backend
(differential vs the einsum formulation, tests/test_pallas_pool.py) and
all entry points execute standalone on v5e at production shapes
(tools/pool_select_debug.py).  Selectable per model via the
``pool_kernels="kernels"`` hyperparameter (or LIGHTFM_TPU_POOL_KERNELS=1
override); ``"auto"`` stays the einsum path until the composed-epoch
hardware A/B at the bench shape proves a win (round 3's kernels-default
bench run died with a runtime INVALID_ARGUMENT — BENCH_r03).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048  # examples per grid step (VMEM-friendly target size)


def _chunk_for(B: int, P: int) -> int:
    """Largest chunk <= CHUNK dividing both B and P.

    The slot-contiguity invariant (`_slot0`) needs chunks that never
    straddle a pool boundary (chunk | P) and a grid that exactly tiles the
    batch (chunk | B).  Power-of-two sizes (the normal case) give CHUNK
    itself; odd explicit batch sizes degrade to a finer grid, never to
    wrong indexing."""
    return math.gcd(math.gcd(B, P), CHUNK)


def _slot0(i: int, shift, chunk: int, P: int):
    """Pool slot of the first example of chunk ``i`` under ``shift``.

    Examples are numbered b = q*P + s with slot s = b % P; chunks never
    straddle a pool boundary (CHUNK divides P), so the chunk's slots are
    the CHUNK consecutive (mod P) slots starting here.
    """
    return (i * chunk + shift) % P


def _scores_kernel(shifts, u1_ref, pool2_ref, out_ref, *, P: int):
    i = pl.program_id(0)
    u1 = u1_ref[...]  # [CHUNK, W]
    chunk = u1.shape[0]
    K = out_ref.shape[0]
    for k in range(K):
        s0 = _slot0(i, shifts[k], chunk, P)
        cand = pool2_ref[pl.ds(s0, chunk), :]  # contiguous slice (mod P)
        out_ref[k, :] = jnp.sum(u1 * cand, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pool_scores_pallas(
    u1: jax.Array,  # f32 [B, W] user reps with the unit-bias column
    pool: jax.Array,  # f32 [P, W] pool candidate reps (bias in last col)
    shifts: jax.Array,  # int32 [K] rotation offsets in [0, P)
    *,
    interpret: bool = False,
) -> jax.Array:
    """preds[k, b] = dot(u1[b], pool[(b % P + shifts[k]) % P]) — the raw
    candidate scores of `fast_warp.warp_pool_step` (caller adds the user
    bias).  Exact f32 multiply-reduce on the VPU."""
    B, W = u1.shape
    P = pool.shape[0]
    K = shifts.shape[0]
    chunk = _chunk_for(B, P)
    n_chunks = B // chunk
    pool2 = jnp.concatenate([pool, pool[:chunk]], axis=0)  # wraparound tail

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, W), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            # Constant index: the doubled pool stays VMEM-resident.
            pl.BlockSpec(
                (P + chunk, W), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (K, chunk), lambda i, s: (0, i), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_scores_kernel, P=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(shifts.astype(jnp.int32), u1, pool2)


def _select_kernel(shifts, j_ref, pool2_ref, nrep_ref, *, P: int):
    i = pl.program_id(0)
    j = j_ref[...]  # [CHUNK]
    chunk = j.shape[0]
    K = shifts.shape[0]
    nrep = jnp.zeros_like(nrep_ref)
    for k in range(K):
        s0 = _slot0(i, shifts[k], chunk, P)
        cand = pool2_ref[pl.ds(s0, chunk), :]
        # Widen the i1 mask to f32 BEFORE the minor-dim insert: Mosaic only
        # supports non-no-op minor-dim reshapes for 32-bit element types.
        sel = (j == k).astype(jnp.float32)[:, None]
        nrep = jnp.where(sel != 0.0, cand, nrep)
    nrep_ref[...] = nrep


@functools.partial(jax.jit, static_argnames=("n_examples", "interpret"))
def pool_select_pallas(
    pool: jax.Array,  # f32 [P, W]
    j: jax.Array,  # int32 [B] selected rotation per example
    shifts: jax.Array,  # int32 [K]
    *,
    n_examples: int,  # B (static)
    interpret: bool = False,
) -> jax.Array:
    """nrep[b] = pool[(b % P + shifts[j_b]) % P] — the selected candidate's
    representation, gathered from the VMEM-resident pool (BPR needs it
    before the loss weights exist, so no fold is fused here)."""
    B = n_examples
    P, W = pool.shape
    K = shifts.shape[0]
    chunk = _chunk_for(B, P)
    n_chunks = B // chunk
    pool2 = jnp.concatenate([pool, pool[:chunk]], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, s: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (P + chunk, W), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk, W), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_select_kernel, P=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(shifts.astype(jnp.int32), j.astype(jnp.int32), pool2)


def _fold_slots(
    i, shifts, x_ref, w_ref, j_ref, acc_ref, *, P: int, n_chunks: int,
    K: int, pool2_ref=None,
):
    """Shared fold body: acc[slot(b, k)] += w[b]*x[b] where j[b] == k, with
    zero-weight touches exact no-ops; wraparound writes land in the doubled
    tail and fold back on the last chunk.  With ``pool2_ref``, also returns
    the selected candidate rows (nrep); None otherwise."""

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # [CHUNK, W]
    chunk = x.shape[0]
    w = w_ref[...]  # [CHUNK]
    j = j_ref[...]  # [CHUNK]
    nrep = None if pool2_ref is None else jnp.zeros_like(x)
    for k in range(K):
        s0 = _slot0(i, shifts[k], chunk, P)
        if pool2_ref is not None:
            cand = pool2_ref[pl.ds(s0, chunk), :]
            # f32 mask before [:, None]: Mosaic rejects i1 minor-dim inserts.
            sel = (j == k).astype(jnp.float32)[:, None]
            nrep = jnp.where(sel != 0.0, cand, nrep)
        contrib = jnp.where((j == k) & (w != 0.0), w, 0.0)[:, None] * x
        acc_ref[pl.ds(s0, chunk), :] += contrib

    @pl.when(i == n_chunks - 1)
    def _fold_tail():
        acc_ref[pl.ds(0, chunk), :] += acc_ref[pl.ds(P, chunk), :]

    return nrep


def _fold_kernel(
    shifts, x_ref, w_ref, j_ref, acc_ref, *, P: int, n_chunks: int, K: int
):
    _fold_slots(
        pl.program_id(0), shifts, x_ref, w_ref, j_ref, acc_ref,
        P=P, n_chunks=n_chunks, K=K,
    )


def _fold_nrep_kernel(
    shifts, x_ref, w_ref, j_ref, pool2_ref, acc_ref, nrep_ref,
    *, P: int, n_chunks: int, K: int,
):
    nrep_ref[...] = _fold_slots(
        pl.program_id(0), shifts, x_ref, w_ref, j_ref, acc_ref,
        P=P, n_chunks=n_chunks, K=K, pool2_ref=pool2_ref,
    )


@functools.partial(jax.jit, static_argnames=("n_slots", "interpret"))
def pool_fold_pallas(
    x: jax.Array,  # f32 [B, W] per-example payload (u1, or u1*u1)
    w: jax.Array,  # f32 [B] per-example weight (0 => exact no-op)
    j: jax.Array,  # int32 [B] selected rotation per example
    shifts: jax.Array,  # int32 [K]
    *,
    n_slots: int,  # P
    pool: jax.Array | None = None,  # f32 [P, W]: also emit nrep
    interpret: bool = False,
):
    """acc[(b % P + shifts[j_b]) % P] += w[b] * x[b] over all examples.

    With ``pool`` given, additionally returns ``nrep[b] = pool[slot(b,
    j_b)]`` (the selected candidate's representation) computed from the
    same VMEM-resident pool — the fast path's negative-rep gather.

    Returns ``acc [P, W]`` or ``(acc, nrep)``.
    """
    B, W = x.shape
    P = n_slots
    K = shifts.shape[0]
    chunk = _chunk_for(B, P)
    n_chunks = B // chunk

    common = dict(P=P, n_chunks=n_chunks, K=K)
    in_specs = [
        pl.BlockSpec((chunk, W), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk,), lambda i, s: (i,), memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk,), lambda i, s: (i,), memory_space=pltpu.VMEM),
    ]
    # The accumulator output block has a constant index map: it stays
    # VMEM-resident across the sequential grid and flushes once at the end.
    acc_spec = pl.BlockSpec(
        (P + chunk, W), lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )
    args = [x, w, j.astype(jnp.int32)]

    if pool is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=in_specs,
            out_specs=acc_spec,
        )
        acc_ext = pl.pallas_call(
            functools.partial(_fold_kernel, **common),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((P + chunk, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(shifts.astype(jnp.int32), *args)
        return acc_ext[:P]

    pool2 = jnp.concatenate([pool, pool[:chunk]], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs
        + [
            pl.BlockSpec(
                (P + chunk, W), lambda i, s: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            acc_spec,
            pl.BlockSpec((chunk, W), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    acc_ext, nrep = pl.pallas_call(
        functools.partial(_fold_nrep_kernel, **common),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P + chunk, W), jnp.float32),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(shifts.astype(jnp.int32), *args, pool2)
    return acc_ext[:P], nrep
