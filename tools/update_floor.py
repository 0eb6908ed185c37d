"""Isolate the sorted-update kernel's cost structure: time the SAME
grid/BlockSpec/DMA pipeline with progressively less work in the kernel
body, at the production shapes.

Variants:
  full    — the real kernel
  nodot   — one-hot built, dot skipped (VPU cost, no MXU)
  noloop  — tile loop removed entirely (pure block/chunk DMA pipeline)

Run on the TPU: python tools/update_floor.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
import lightfm_tpu.ops.pallas_update as pu  # noqa: E402

B, W = 131072, 72
STEPS = 20


def make_kernel(variant):
    def kernel(block_of, chunk_of, flags, table_ref, acc_ref, idx_ref,
               wg_ref, table_out, acc_out, sums, *, learning_rate,
               precision):
        i = pl.program_id(0)
        block_start = block_of[i] * pu.BLOCK_R
        Wl = table_ref.shape[1]

        @pl.when(flags[i, 0] == 1)
        def _init():
            sums[...] = jnp.zeros_like(sums)

        if variant != "noloop":
            local = idx_ref[:] - block_start
            wg = wg_ref[...]
            wgs = jnp.concatenate([wg, wg * wg], axis=1)
            lo = jnp.min(local)
            hi = jnp.max(jnp.where(local < pu.BLOCK_R, local, -1))
            t_lo = jnp.clip(lo // pu.TILE_R, 0, pu.BLOCK_R // pu.TILE_R)
            t_hi = jnp.clip(hi // pu.TILE_R + 1, 0, pu.BLOCK_R // pu.TILE_R)

            def tile_body(t, _):
                rows = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (pu.TILE_R, pu.CHUNK), 0
                    )
                    + t * pu.TILE_R
                )
                oh = (rows == local[None, :]).astype(jnp.float32)
                if variant == "full":
                    d = jnp.dot(
                        oh, wgs,
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                else:  # nodot: keep the one-hot, skip the MXU (the 1e-30
                    # weight keeps the compiler from folding it away)
                    d = jnp.broadcast_to(
                        jnp.sum(oh, axis=1)[:, None] * wgs[0, None, :],
                        (pu.TILE_R, 2 * Wl),
                    ) * jnp.float32(1e-30)
                sums[pl.ds(t * pu.TILE_R, pu.TILE_R), :] += d
                return 0

            jax.lax.fori_loop(t_lo, t_hi, tile_body, 0)

        @pl.when(flags[i, 1] == 1)
        def _finalize():
            acc_pre = acc_ref[...]
            lr = learning_rate * jax.lax.rsqrt(acc_pre)
            s = sums[...]
            table_out[...] = table_ref[...] - lr * s[:, :Wl]
            acc_out[...] = acc_pre + s[:, Wl:]

    return kernel


def bench(R, sidx_np, variant):
    jax.clear_caches()
    pu._update_kernel = make_kernel(variant)
    table = jnp.asarray(np.random.RandomState(1).randn(R, W), jnp.float32)
    acc = jnp.ones((R, W), jnp.float32)
    sidx = jnp.asarray(sidx_np)
    wg = jnp.asarray(np.random.RandomState(2).randn(B, W) * 0.01, jnp.float32)

    @jax.jit
    def run(table, acc):
        def body(carry, _):
            t, a = pu.sorted_adagrad_update_pallas(
                *carry, sidx, wg, learning_rate=0.05,
                precision=jax.lax.Precision.DEFAULT,
            )
            return (t, a), None

        (t, a), _ = jax.lax.scan(body, (table, acc), None, length=STEPS)
        return t, a

    t, a = run(table, acc)
    _ = float(jnp.sum(t))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        t, a = run(table, acc)
        _ = float(jnp.sum(t))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    orig = pu._update_kernel
    for name, R in (("item", 100_000), ("user", 200_000)):
        rng = np.random.RandomState(0)
        sidx = np.sort(rng.randint(0, R, B).astype(np.int32))
        for variant in ("full", "nodot", "noloop"):
            try:
                s = bench(R, sidx, variant)
                print(f"{name} {variant:7s} {s * 1e3:6.3f} ms/step",
                      flush=True)
            except Exception as e:
                print(f"{name} {variant:7s} FAILED {repr(e)[:120]}",
                      flush=True)
    pu._update_kernel = orig


if __name__ == "__main__":
    main()
