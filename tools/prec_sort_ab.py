"""A/B: Pallas update precision (HIGHEST vs DEFAULT) + batch-sort costs.

1. isolated sorted update kernel, B=131072 touches into 100k x 72, both
   precisions;
2. v9-style epoch (pool fwd + item-sorted pallas pos update + user XLA
   scatter) with DEFAULT-precision dots;
3. the extra sorts production needs to feed v9: per-epoch global
   (batch, item) sort and (batch, user) sort of the 5.11M packed set.

Run: python tools/prec_sort_ab.py [kernel|v9|sorts]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas  # noqa: E402

R_I, W, B = 100_000, 72, 131072
LR = 0.05


def timeit(f, *args, n=5):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _i in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


which = sys.argv[1] if len(sys.argv) > 1 else "all"

k = jax.random.key(0)
k1, k2, k3 = jax.random.split(k, 3)
it = jax.random.uniform(k1, (R_I, W), jnp.float32)
ia = jnp.ones((R_I, W), jnp.float32)
sidx = jnp.sort(jax.random.randint(k2, (B,), 0, R_I, dtype=jnp.int32))
swg = jax.random.normal(k3, (B, W), jnp.float32) * 0.01

if which in ("kernel", "all"):
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        f = jax.jit(
            lambda t, a, i, g, p=prec: sorted_adagrad_update_pallas(
                t, a, i, g, learning_rate=LR, precision=p
            )
        )
        t = timeit(f, it, ia, sidx, swg)
        print(f"kernel {prec}: {t*1e3:.2f}ms", flush=True)
    # correctness delta DEFAULT vs HIGHEST
    th, ah = sorted_adagrad_update_pallas(it, ia, sidx, swg, learning_rate=LR)
    td, ad = sorted_adagrad_update_pallas(
        it, ia, sidx, swg, learning_rate=LR, precision=jax.lax.Precision.DEFAULT
    )
    rel = float(jnp.max(jnp.abs(td - th)) / jnp.max(jnp.abs(th)))
    print(f"max rel delta DEFAULT vs HIGHEST: {rel:.2e}", flush=True)

if which in ("v9", "all"):
    import warp_pool_ab as ab  # noqa: E402  (defines tables/batches)

    def make_epoch_prec(prec):
        @jax.jit
        def epoch(it_, ia_, ut_, ua_, uid, pid):
            keys = jax.random.split(jax.random.key(1), ab.STEPS)

            def body(carry, xs):
                it_, ia_, ut_, ua_ = carry
                bu, bi, kk = xs
                _bi, _bu, gi, gu, pool_ids, gp, gp2 = ab.fwd_pool_small(
                    ut_, it_, bu, bi, kk
                )
                it_, ia_ = sorted_adagrad_update_pallas(
                    it_, ia_, bi, -gi, learning_rate=ab.LR, precision=prec
                )
                lrp = ab.LR * jax.lax.rsqrt(ia_[pool_ids])
                it_ = it_.at[pool_ids].add(-(lrp * gp))
                ia_ = ia_.at[pool_ids].add(gp2)
                lru = ab.LR * jax.lax.rsqrt(ua_[bu])
                ut_ = ut_.at[bu].add(-(lru * gu))
                ua_ = ua_.at[bu].add(gu * gu)
                return (it_, ia_, ut_, ua_), None

            return jax.lax.scan(
                body, (it_, ia_, ut_, ua_), (uid, pid, keys)
            )[0]

        return epoch

    srt = [jax.lax.sort([ab.pid[i], ab.uid[i]], num_keys=1) for i in range(ab.STEPS)]
    pid_s = jnp.stack([s[0] for s in srt])
    uid_s = jnp.stack([s[1] for s in srt])
    for prec in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
        t = timeit(
            make_epoch_prec(prec), ab.it, ab.ia, ab.ut, ab.ua, uid_s, pid_s, n=3
        )
        print(
            f"v9 {prec}: {t:.3f}s  ({ab.STEPS*ab.B/t/1e6:.1f}M ex/s)", flush=True
        )

if which in ("sorts", "all"):
    # Production feed for v9: after the random shuffle, re-sort the epoch by
    # (batch, item) carrying all 8 packed columns, and by (batch, user)
    # carrying a within-batch index (for the user-side permutation).
    N = 39 * B  # 5.11M examples
    kk = jax.random.split(jax.random.key(7), 4)
    packed = [jax.random.randint(kk[0], (N,), 0, 1 << 30, dtype=jnp.int32) for _ in range(8)]
    batch_of = jax.random.randint(kk[1], (N,), 0, 39, dtype=jnp.int32)
    item = jax.random.randint(kk[2], (N,), 0, R_I, dtype=jnp.int32)
    user = jax.random.randint(kk[3], (N,), 0, 200_000, dtype=jnp.int32)

    @jax.jit
    def shuffle8(key, cols):
        sk = jax.random.bits(key, (N,), jnp.uint32)
        return jax.lax.sort([sk] + cols, num_keys=1)[1:]

    @jax.jit
    def sort_batch_item(b, i, cols):
        # two int32 keys: batch id then item id; payload = 8 cols
        return jax.lax.sort([b, i] + cols, num_keys=2)[2:]

    @jax.jit
    def sort_batch_user(b, u):
        pos = jnp.arange(N, dtype=jnp.int32)
        return jax.lax.sort([b, u, pos], num_keys=2)[1:]

    t = timeit(shuffle8, jax.random.key(3), packed, n=3)
    print(f"shuffle 1key+8payload: {t*1e3:.1f}ms", flush=True)
    t = timeit(sort_batch_item, batch_of, item, packed, n=3)
    print(f"sort (batch,item)+8payload: {t*1e3:.1f}ms", flush=True)
    t = timeit(sort_batch_user, batch_of, user, n=3)
    print(f"sort (batch,user)+idx: {t*1e3:.1f}ms", flush=True)
