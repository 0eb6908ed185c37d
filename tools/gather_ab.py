"""A/B: XLA row gather vs Pallas alternatives (the forward-gather wall).

The fast WARP step pays ~1.3ms per [B]-row gather at B=131072/W=72 on v5e
(~29 GB/s — latency-bound serialized row fetches, vs 819 GB/s peak).  This
harness measures, at the production shape:

1. XLA `table[idx]` — random and sorted index baselines;
2. a Pallas multi-outstanding-DMA row gather (ring of semaphores, per-row
   HBM->VMEM copies) — wins iff DMA issue overhead << row fetch latency;
3. a Pallas sorted slab gather: DMA the contiguous [lo, hi] row span a
   sorted chunk touches (one large full-bandwidth copy), then expand to
   touch order with a one-hot MXU contraction.

Run on the TPU: python tools/gather_ab.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W = 100_000, 72
B = 131072
CHUNK = 1024
NSEM = 16
STEPS = 10


def timeit(f, *args, n=3):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _i in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- XLA
@jax.jit
def xla_gather(table, idx_steps):
    def body(acc, idx):
        return acc + jnp.sum(table[idx], axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((W,), jnp.float32), idx_steps)
    return acc


# ------------------------------------------------- Pallas per-row DMA
def _dma_kernel(idx_ref, table_ref, out_ref, sems):
    chunk = out_ref.shape[0]

    def get_dma(i):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i]], out_ref.at[i], sems.at[i % NSEM]
        )

    def body(i, _):
        @pl.when(i >= NSEM)
        def _wait():
            get_dma(i - NSEM).wait()

        get_dma(i).start()
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    def drain(i, _):
        get_dma(i).wait()
        return 0

    jax.lax.fori_loop(max(0, chunk - NSEM), chunk, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dma_gather(table, idx, *, interpret=False):
    n_chunks = idx.shape[0] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], W), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)


@jax.jit
def dma_gather_steps(table, idx_steps):
    def body(acc, idx):
        return acc + jnp.sum(dma_gather(table, idx), axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((W,), jnp.float32), idx_steps)
    return acc


# --------------------------------------------- Pallas sorted slab gather
SLAB = 2048  # rows DMA'd per chunk (must cover a sorted chunk's span)


def _slab_kernel(base_ref, idx_ref, table_ref, out_ref, slab, sem):
    i = pl.program_id(0)
    base = base_ref[i]
    cp = pltpu.make_async_copy(
        table_ref.at[pl.ds(base, SLAB)], slab, sem
    )
    cp.start()
    cp.wait()
    local = idx_ref[...] - base  # [CHUNK] in [0, SLAB)
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, SLAB), 1)
    oh = (rows == local[:, None]).astype(jnp.float32)
    out_ref[...] = jnp.dot(
        oh, slab[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def slab_gather_sorted(table, sidx, *, interpret=False):
    """Requires sidx sorted and every CHUNK's span <= SLAB rows (true for
    B >= R uniform touches; the harness pads the table by SLAB)."""
    n_chunks = sidx.shape[0] // CHUNK
    base = jnp.minimum(
        sidx.reshape(n_chunks, CHUNK).min(axis=1), R - 1
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i, b: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, W), lambda i, b: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((SLAB, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _slab_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sidx.shape[0], W), jnp.float32),
        interpret=interpret,
    )(base, sidx, table)


@jax.jit
def slab_gather_steps(table, sidx_steps):
    def body(acc, sidx):
        return acc + jnp.sum(slab_gather_sorted(table, sidx), axis=0), None

    acc, _ = jax.lax.scan(body, jnp.zeros((W,), jnp.float32), sidx_steps)
    return acc


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.RandomState(0)
    # Pad the table by SLAB rows so slab DMAs never run off the end.
    table = jnp.asarray(rng.randn(R + SLAB, W).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, R, (STEPS, B)).astype(np.int32))
    sidx = jnp.sort(idx, axis=1)

    # Correctness first (single step, each variant isolated so a Mosaic
    # compile failure in one cannot take down the others' measurements —
    # the per-row DMA variant is KNOWN not to compile on real v5e: HBM
    # memref slices must be 128-lane aligned and rows are W=72).
    dma_ok = True
    want = np.asarray(table)[np.asarray(idx[0])]
    try:
        got_dma = np.asarray(dma_gather(table, idx[0], interpret=interpret))
        np.testing.assert_array_equal(got_dma, want)
    except Exception as e:
        dma_ok = False
        print(f"dma variant unavailable: {repr(e)[:160]}", flush=True)
    # Slab precondition: every sorted chunk's row span fits in SLAB (holds
    # for B >= R uniform touches, the production shape; checked explicitly).
    s_np = np.asarray(sidx[0]).reshape(-1, CHUNK)
    slab_ok = int((s_np.max(axis=1) - s_np.min(axis=1)).max()) < SLAB
    if slab_ok:
        try:
            want_s = np.asarray(table)[np.asarray(sidx[0])]
            got_slab = np.asarray(
                slab_gather_sorted(table, sidx[0], interpret=interpret)
            )
            np.testing.assert_allclose(got_slab, want_s, rtol=1e-6)
        except Exception as e:
            slab_ok = False
            print(f"slab variant unavailable: {repr(e)[:160]}", flush=True)
    else:
        print(f"slab variant skipped: chunk span exceeds SLAB={SLAB}")
    print("correctness OK", flush=True)
    if interpret:
        print("(CPU backend: correctness only, no timings)")
        return

    per_row = lambda s: f"{s / STEPS / B * 1e9:.1f} ns/row ({B * STEPS * W * 4 / s / 1e9:.0f} GB/s)"
    t = timeit(xla_gather, table, idx)
    print(f"xla random : {per_row(t)}", flush=True)
    t = timeit(xla_gather, table, sidx)
    print(f"xla sorted : {per_row(t)}", flush=True)
    if dma_ok:
        try:
            t = timeit(dma_gather_steps, table, idx)
            print(f"dma random : {per_row(t)}", flush=True)
        except Exception as e:
            print(f"dma FAILED: {e!r}", flush=True)
    if slab_ok:
        try:
            t = timeit(slab_gather_steps, table, sidx)
            print(f"slab sorted: {per_row(t)}", flush=True)
        except Exception as e:
            print(f"slab FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
