"""Per-component timing of the fast WARP step at production shape.

Times each piece of `fast_warp.warp_pool_step` in isolation (scanned like
the real epoch so XLA cannot hoist loop-invariant work): the row gathers,
the positives-membership test, pool scoring (einsum vs Pallas), the fold
(einsum vs Pallas), the sorted table updates, and the triple-sort shuffle.
This is the map that decides where the next optimization goes.

Run on the TPU: python tools/fast_step_ablate.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

R_U, R_I, D = 200_000, 100_000, 64
B = 131072
K = 10
P = 16384
STEPS = 38
LR = 0.05
INTERPRET = False  # set True off-TPU (kernels interpret-only there)


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


def scan_steps(fn, xs_shape_fn, *carry_args):
    """Scan fn over STEPS of per-step inputs to mimic the epoch loop."""

    @jax.jit
    def run(carry, xs):
        def body(c, x):
            return fn(c, x), None

        out, _ = jax.lax.scan(body, carry, xs)
        return out

    return run


def main():
    from lightfm_tpu.state import init_state, table_width
    from lightfm_tpu.ops.representation import score_pairs, with_unit_bias
    from lightfm_tpu.sparse import in_positives_slots
    import lightfm_tpu.fast_warp as fw
    from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas
    from lightfm_tpu.train import build_train_data
    from lightfm_tpu.config import Hyperparams
    import scipy.sparse as sp

    W = table_width(D)
    rng = np.random.RandomState(0)
    state = init_state(D, R_I, R_U, rng, adagrad=True)
    item_table, item_acc = state.item_table, state.item_acc
    user_table, user_acc = state.user_table, state.user_acc

    k = jax.random.key(0)
    ks = jax.random.split(k, 8)
    uid = jax.random.randint(ks[0], (STEPS, B), 0, R_U, dtype=jnp.int32)
    pid = jnp.sort(jax.random.randint(ks[1], (STEPS, B), 0, R_I, dtype=jnp.int32), axis=1)
    suid = jnp.sort(uid, axis=1)
    sigma = jnp.argsort(uid, axis=1).astype(jnp.int32)
    pool_ids = jax.random.randint(ks[2], (STEPS, P), 0, R_I, dtype=jnp.int32)
    shifts = jax.random.randint(ks[3], (STEPS, K), 0, P, dtype=jnp.int32)
    j = jax.random.randint(ks[4], (STEPS, B), 0, K, dtype=jnp.int32)
    lossm = jax.random.uniform(ks[5], (STEPS, B), jnp.float32)
    wg = jax.random.normal(ks[6], (STEPS, B, W), jnp.float32) * 0.01

    per_step = lambda s: f"{s / STEPS * 1e3:7.2f} ms/step"

    # --- forward gathers -------------------------------------------------
    @jax.jit
    def g_user(table, ids):
        def body(c, x):
            return c + jnp.sum(table[x], axis=0), None
        return jax.lax.scan(body, jnp.zeros((W,), jnp.float32), ids)[0]

    print(f"u gather (random) : {per_step(timeit(g_user, user_table, uid))}", flush=True)
    print(f"prep gather (sorted): {per_step(timeit(g_user, item_table, pid))}", flush=True)
    print(f"sigma permute [B,W] : ", end="", flush=True)

    @jax.jit
    def g_perm(wg, sigma):
        def body(c, x):
            g, s = x
            return c + jnp.sum(g[s], axis=0), None
        return jax.lax.scan(body, jnp.zeros((W,), jnp.float32), (wg, sigma))[0]

    print(per_step(timeit(g_perm, wg, sigma)), flush=True)

    # --- positives membership -------------------------------------------
    nnz = STEPS * B  # exactly whole batches: shuffle grid == STEPS
    coo = sp.coo_matrix(
        (np.ones(nnz, np.float32),
         (rng.randint(0, R_U, nnz), rng.randint(0, R_I, nnz))),
        shape=(R_U, R_I),
    )
    hp = Hyperparams(no_components=D, loss="warp", max_sampled=K)
    from lightfm_tpu.sparse import identity_rows
    data = build_train_data(coo, np.ones(coo.nnz, np.float32),
                            identity_rows(R_U), identity_rows(R_I), hp, B)
    rids = jnp.stack([jnp.roll(pool_ids[0], -shifts[0][kk], axis=0) for kk in range(K)])
    cand_ids0 = jnp.broadcast_to(
        rids[:, None, :], (K, B // P, P)
    ).reshape(K, B)

    @jax.jit
    def g_ispos(positives, uid):
        def body(c, u):
            m = in_positives_slots(positives, u, cand_ids0)
            return c + jnp.sum(m.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0), uid)[0]

    print(f"in_positives [K,B]  : {per_step(timeit(g_ispos, data.positives, uid))}", flush=True)

    # --- pool scoring / fold: einsum vs kernels --------------------------
    u1 = jax.random.normal(ks[7], (STEPS, B, W), jnp.float32)

    @jax.jit
    def f_scores_einsum(item_table, xs):
        def body(c, x):
            u1s, pids, sh = x
            pool = item_table[pids]
            rp = jnp.stack([jnp.roll(pool, -sh[kk], axis=0) for kk in range(K)])
            u1q = u1s.reshape(B // P, P, W)
            preds = jnp.einsum("qsd,ksd->kqs", u1q, rp,
                               precision=jax.lax.Precision.HIGHEST)
            return c + jnp.sum(preds), None
        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    print(f"pool scores einsum  : {per_step(timeit(f_scores_einsum, item_table, (u1, pool_ids, shifts)))}", flush=True)

    # --- sorted updates ---------------------------------------------------
    @jax.jit
    def f_upd(table, acc, xs):
        def body(c, x):
            t, a = c
            ids, g = x
            t, a = sorted_adagrad_update_pallas(t, a, ids, g, learning_rate=LR, interpret=INTERPRET)
            return (t, a), None
        return jax.lax.scan(body, (table, acc), xs)[0]

    print(f"item sorted update  : {per_step(timeit(f_upd, item_table, item_acc, (pid, wg)))}", flush=True)
    print(f"user sorted update  : {per_step(timeit(f_upd, user_table, user_acc, (suid, wg)))}", flush=True)

    # Same components at the production default precision (bf16-input MXU).
    @jax.jit
    def f_upd_bf16(table, acc, xs):
        def body(c, x):
            t, a = c
            ids, g = x
            t, a = sorted_adagrad_update_pallas(
                t, a, ids, g, learning_rate=LR, interpret=INTERPRET,
                precision=jax.lax.Precision.DEFAULT,
            )
            return (t, a), None
        return jax.lax.scan(body, (table, acc), xs)[0]

    print(f"item update (bf16)  : {per_step(timeit(f_upd_bf16, item_table, item_acc, (pid, wg)))}", flush=True)
    print(f"user update (bf16)  : {per_step(timeit(f_upd_bf16, user_table, user_acc, (suid, wg)))}", flush=True)

    @jax.jit
    def f_scores_bf16(item_table, xs):
        def body(c, x):
            u1s, pids, sh = x
            pool = item_table[pids]
            rp = jnp.stack([jnp.roll(pool, -sh[kk], axis=0) for kk in range(K)])
            u1q = u1s.reshape(B // P, P, W)
            preds = jnp.einsum("qsd,ksd->kqs", u1q, rp,
                               precision=jax.lax.Precision.DEFAULT)
            return c + jnp.sum(preds), None
        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    print(f"pool scores (bf16)  : {per_step(timeit(f_scores_bf16, item_table, (u1, pool_ids, shifts)))}", flush=True)

    # --- shuffle sorts (per epoch, amortized) -----------------------------
    @jax.jit
    def f_shuffle(packed, key):
        sh, su, sg = fw.shuffle_item_sorted(packed, key, STEPS, B)
        return jnp.sum(sh[:, 0, :]) + jnp.sum(su) + jnp.sum(sg)

    t = timeit(f_shuffle, data.packed, jax.random.key(1))
    print(f"triple-sort shuffle : {t*1e3:7.1f} ms/epoch = {per_step(t)}", flush=True)


if __name__ == "__main__":
    main()
