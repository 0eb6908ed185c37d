"""Parameter sweep for the sorted adagrad update kernel (the step's
dominant cost at default precision: item+user updates = ~6.2ms of the
11.05ms fast WARP step, tools/knockout_ab.py 2026-08-19).

Cost model: one-hot MXU work = 4W * (R*CHUNK + B*TILE_R) FLOPs — both
knobs trade DMA/grid overhead against contraction waste, and the two
per-tile dots (sum_wg, sum_wg2) can be fused into one stacked pass.
This sweeps (CHUNK, TILE_R) per table shape at the production touch
distribution, standalone (no full-epoch executable -> no crash-class
exposure).

Run on the TPU: python tools/update_tune.py [item|user|both]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import lightfm_tpu.ops.pallas_update as pu  # noqa: E402

B, W = 131072, 72
STEPS = 20


def touches(R, clustered, seed=0):
    """Sorted touch ids at the bench's popularity skew (item table) or
    near-uniform (user table)."""
    rng = np.random.RandomState(seed)
    if clustered:
        # Mixture like bench._clustered_interactions: popular head + tail.
        head = rng.zipf(1.3, B * 2) % R
        ids = head[:B]
    else:
        ids = rng.randint(0, R, B)
    return np.sort(ids.astype(np.int32))


def bench_config(R, sidx_np, chunk, tile_r, precision, block_r=2048):
    # The kernel reads these at TRACE time; identical arg shapes would
    # otherwise reuse the previous config's executable.
    jax.clear_caches()
    pu.CHUNK, pu.TILE_R, pu.BLOCK_R = chunk, tile_r, block_r
    table = jnp.asarray(np.random.RandomState(1).randn(R, W), jnp.float32)
    acc = jnp.ones((R, W), jnp.float32)
    sidx = jnp.asarray(sidx_np)
    wg = jnp.asarray(
        np.random.RandomState(2).randn(B, W) * 0.01, jnp.float32
    )

    @jax.jit
    def run(table, acc):
        def body(carry, _):
            t, a = carry
            t, a = pu.sorted_adagrad_update_pallas(
                t, a, sidx, wg, learning_rate=0.05, precision=precision
            )
            return (t, a), None

        (t, a), _ = jax.lax.scan(body, (table, acc), None, length=STEPS)
        return t, a

    t, a = run(table, acc)  # compile + warm
    _ = float(jnp.sum(t))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        t, a = run(table, acc)
        _ = float(jnp.sum(t))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cases = []
    if which in ("item", "both"):
        cases.append(("item", 100_000, True))
    if which in ("user", "both"):
        cases.append(("user", 200_000, False))

    prec = jax.lax.Precision.DEFAULT
    for name, R, clustered in cases:
        sidx = touches(R, clustered)
        spans = sidx.reshape(-1, 1024)
        print(
            f"--- {name} table R={R} (chunk-1024 span p50/p99 = "
            f"{int(np.median(spans.max(1) - spans.min(1)))}/"
            f"{int(np.percentile(spans.max(1) - spans.min(1), 99))})",
            flush=True,
        )
        for block_r, chunk, tile_r in (
            (2048, 1024, 256),
            (4096, 1024, 256),
            (8192, 1024, 256),
            (16384, 1024, 256),
            (8192, 2048, 256),
            (8192, 1024, 512),
        ):
            try:
                s = bench_config(R, sidx, chunk, tile_r, prec, block_r)
                print(
                    f"{name} BLOCK_R={block_r:6d} CHUNK={chunk:5d} "
                    f"TILE_R={tile_r:4d} {s * 1e3:6.3f} ms/step",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"{name} BLOCK_R={block_r:6d} CHUNK={chunk:5d} "
                    f"TILE_R={tile_r:4d} FAILED {repr(e)[:120]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
