"""Probe: can a Pallas multi-outstanding-DMA row gather beat XLA's gather?

XLA's random-row gather moves ~131M rows/s on v5e (288B rows — ~37GB/s,
far under the 819GB/s HBM roofline), and four such [B]-row gathers are
the largest remaining wall of the fast WARP step (doc/roadmap.md).  This
probe measures a Pallas kernel that issues G row-DMAs per grid step from
an HBM-resident table into the output block, with a software pipeline of
S outstanding copies, against the XLA gather at the production shape.

Run on the TPU: python tools/dma_gather_probe.py [G] [S]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, B = 200_000, 72, 131072
STEPS = 10  # scanned steps per timed call

G = int(sys.argv[1]) if len(sys.argv) > 1 else 256  # rows per grid step
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16  # outstanding DMAs
# The drain tail iterates [G-S, G); S > G would walk negative touch
# indices (out-of-range slices + waits on never-started semaphores).
S = min(S, G)


def _kernel(idx_ref, table_ref, out_ref, sems):
    i = pl.program_id(0)

    def copy(k):
        row = idx_ref[i * G + k]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(k, 1), :],
            sems.at[k % S],
        )

    def body(k, _):
        @pl.when(k >= S)
        def _():
            copy(k - S).wait()

        copy(k).start()
        return 0

    jax.lax.fori_loop(0, G, body, 0)

    def tail(k, _):
        copy(k).wait()
        return 0

    jax.lax.fori_loop(G - S, G, tail, 0)


@functools.partial(jax.jit, static_argnames=())
def gather_pallas(table, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((G, W), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((S,))],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W), table.dtype),
    )(idx, table)


def timeit(f, *args, n=3):
    out = f(*args)
    _ = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    best = float("inf")
    for _i in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"device={jax.devices()[0].device_kind} G={G} S={S}", flush=True)
    k = jax.random.key(0)
    table = jax.random.normal(k, (R, W), jnp.float32)
    idx = jax.random.randint(k, (STEPS, B), 0, R, dtype=jnp.int32)

    @jax.jit
    def xla_gather(table, idx):
        def body(c, x):
            return c + jnp.sum(table[x], axis=0), None
        return jax.lax.scan(body, jnp.zeros((W,), jnp.float32), idx)[0]

    t = timeit(xla_gather, table, idx)
    print(f"xla gather    : {t/STEPS*1e3:7.2f} ms/step "
          f"({B*STEPS/t/1e6:.0f}M rows/s)", flush=True)

    @jax.jit
    def pallas_scan(table, idx):
        def body(c, x):
            return c + jnp.sum(gather_pallas(table, x), axis=0), None
        return jax.lax.scan(body, jnp.zeros((W,), jnp.float32), idx)[0]

    # correctness first
    got = np.asarray(gather_pallas(table, idx[0]))
    want = np.asarray(table)[np.asarray(idx[0])]
    assert np.array_equal(got, want), "pallas gather mismatch"

    t = timeit(pallas_scan, table, idx)
    print(f"pallas gather : {t/STEPS*1e3:7.2f} ms/step "
          f"({B*STEPS/t/1e6:.0f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
