"""Pinpoint the BPR kernels-mode INVALID_ARGUMENT: drive each Pallas pool
kernel standalone at the production shape (B=131072, P=16384, W=72, T=8),
then the combinations the BPR step uses (select + fold-without-pool), on
the real TPU.  warp kernels mode (scores + fold-with-pool) runs clean, so
the suspects are the two BPR-only entry points.

Run on the TPU: python tools/pool_select_debug.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from lightfm_tpu.ops.pallas_pool import (  # noqa: E402
    pool_fold_pallas,
    pool_scores_pallas,
    pool_select_pallas,
)

B, P, W, T = 131072, 16384, 72, 8


def run(name, fn, *args, **kw):
    try:
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaves = jax.tree.leaves(out)
        _ = [float(jnp.sum(x)) for x in leaves]
        print(f"{name:30s} OK ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED: {repr(e)[:300]}", flush=True)


def main():
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    k = jax.random.key(0)
    u1 = jax.random.normal(jax.random.fold_in(k, 1), (B, W), jnp.float32)
    pool = jax.random.normal(jax.random.fold_in(k, 2), (P, W), jnp.float32)
    shifts = jax.random.randint(jax.random.fold_in(k, 3), (T,), 0, P, jnp.int32)
    j = jax.random.randint(jax.random.fold_in(k, 4), (B,), 0, T, jnp.int32)
    w = jax.random.uniform(jax.random.fold_in(k, 5), (B,), jnp.float32)

    run("scores", pool_scores_pallas, u1, pool, shifts)
    run("select", pool_select_pallas, pool, j, shifts, n_examples=B)
    run("fold(pool=None)", pool_fold_pallas, u1, w, j, shifts, n_slots=P)
    run("fold(pool)", pool_fold_pallas, u1, w, j, shifts, n_slots=P, pool=pool)

    # The BPR step's exact sequence inside one jit, scanned like the epoch.
    @jax.jit
    def bpr_like(u1, pool, shifts, j, w):
        def body(c, _):
            nrep = pool_select_pallas(pool, j, shifts, n_examples=B)
            gp = pool_fold_pallas(u1, w, j, shifts, n_slots=P)
            gp2 = pool_fold_pallas(u1 * u1, w * w, j, shifts, n_slots=P)
            return c + jnp.sum(nrep) + jnp.sum(gp) + jnp.sum(gp2), None

        out, _ = jax.lax.scan(body, 0.0, None, length=3)
        return out

    run("bpr-like scanned combo", bpr_like, u1, pool, shifts, j, w)


if __name__ == "__main__":
    main()
