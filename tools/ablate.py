import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

# Inline stripped WARP epoch with toggles, mirroring train._epoch shapes.
R_U, R_I, NNZ, D, W, K = 200_000, 100_000, 5_000_000, 64, 72, 10
B = 131072
rng = np.random.RandomState(0)
n_pad = (NNZ + B - 1)//B * B
uid = jnp.asarray(rng.randint(0, R_U, n_pad).astype(np.int32))
iid = jnp.asarray(rng.randint(0, R_I, n_pad).astype(np.int32))
user_table = jnp.asarray(rng.rand(R_U, W).astype(np.float32))
item_table = jnp.asarray(rng.rand(R_I, W).astype(np.float32))
u_acc = jnp.ones((R_U, W), jnp.float32)
i_acc = jnp.ones((R_I, W), jnp.float32)
# positives structure: width 32
posw = 32
pos_idx = jnp.asarray(rng.randint(0, R_I, (R_U, posw)).astype(np.int32))

def timeit(f, *args, n=3):
    out = f(*args); jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0)/n

def make_epoch(do_shuffle, do_forward, do_inpos, do_update, dedup):
    @jax.jit
    def epoch(user_table, item_table, u_acc, i_acc, uid, iid):
        key = jax.random.key(0)
        n_batches = n_pad // B
        if do_shuffle:
            perm = jax.random.permutation(key, n_pad)
            su, si_ = uid[perm].reshape(n_batches, B), iid[perm].reshape(n_batches, B)
        else:
            su, si_ = uid.reshape(n_batches, B), iid.reshape(n_batches, B)
        keys = jax.random.split(key, n_batches)
        def body(carry, xs):
            ut, it, ua, ia = carry
            bu, bi, k = xs
            loss = jnp.ones((B,), jnp.float32)
            neg = jax.random.randint(k, (B, K), 0, R_I, dtype=jnp.int32)
            if do_forward:
                u = ut[bu]                                    # [B, W]
                all_ids = jnp.concatenate([bi[:, None], neg], 1).reshape(-1)
                reps = it[all_ids].reshape(B, K+1, W)
                preds = jnp.einsum("bd,bkd->bk", u[:, :-1], reps[..., :-1]) + u[:, -1:] + reps[..., -1]
                if do_inpos:
                    prows = pos_idx[bu]                       # [B, posw]
                    is_pos = (prows[:, None, :] == neg[:, :, None]).any(-1)
                    preds = jnp.where(jnp.pad(is_pos, ((0,0),(1,0))), -1e9, preds)
                j = jnp.argmax(preds[:, 1:] > preds[:, :1] - 1, axis=-1)
                negid = jnp.take_along_axis(neg, j[:, None], 1)[:, 0]
                nrep = jnp.take_along_axis(reps, j[:, None, None]+1, 1)[:, 0]
                loss = preds.mean(-1)  # keep dataflow
                gu = loss[:, None] * (nrep - reps[:, 0])
                gi = loss[:, None] * u
            else:
                negid = neg[:, 0]
                gu = jnp.ones((B, W), jnp.float32)
                gi = gu
            if do_update:
                iidx = jnp.concatenate([bi, negid])
                ig = jnp.concatenate([-gi, gi])
                if dedup:
                    def upd(tbl, a, idx, g, R):
                        order = jnp.argsort(idx)
                        s, sg = idx[order], g[order]
                        first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
                        seg = jnp.cumsum(first)-1
                        swg = jax.ops.segment_sum(sg, seg, num_segments=idx.shape[0])
                        swg2 = jax.ops.segment_sum(sg*sg, seg, num_segments=idx.shape[0])
                        uq = jax.ops.segment_max(s, seg, num_segments=idx.shape[0])
                        uq = jnp.where((uq>=0)&(uq<=R), uq, R)
                        lr = 0.05*jax.lax.rsqrt(a[jnp.minimum(uq, R-1)])
                        tbl = tbl.at[uq].add(-(lr*swg), mode="drop", unique_indices=True)
                        a = a.at[uq].add(swg2, mode="drop", unique_indices=True)
                        return tbl, a
                else:
                    def upd(tbl, a, idx, g, R):
                        lr = 0.05*jax.lax.rsqrt(a[idx])
                        tbl = tbl.at[idx].add(-(lr*g))
                        a = a.at[idx].add(g*g)
                        return tbl, a
                it, ia = upd(it, ia, iidx, ig, R_I)
                ut, ua = upd(ut, ua, bu, gu, R_U)
            return (ut, it, ua, ia), None
        (ut, it, ua, ia), _ = jax.lax.scan(body, (user_table, item_table, u_acc, i_acc), (su, si_, keys))
        return ut, it
    return epoch

cfgs = [
    ("full dup     ", (True, True, True, True, False)),
    ("full dedup   ", (True, True, True, True, True)),
    ("no update    ", (True, True, True, False, False)),
    ("no inpos     ", (True, True, False, True, False)),
    ("fwd only-noup", (False, True, False, False, False)),
    ("update only  ", (False, False, False, True, False)),
    ("update dedup ", (False, False, False, True, True)),
]
for name, cfg in cfgs:
    f = make_epoch(*cfg)
    t = timeit(f, user_table, item_table, u_acc, i_acc, uid, iid)
    print(f"{name}: {t:.3f}s  ({NNZ/t/1e6:.1f}M ex/s)")
