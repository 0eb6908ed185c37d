"""Ablate the v9 WARP step (pool negatives + item-sorted Pallas update).

Times incremental slices of the step to locate the remaining cost at
B=131072 (full v9 epoch = 0.573s / 14.7ms per step on v5e):
  g    - the three fine-grained gathers only (u, prep, pos_idx rows)
  f    - full forward (scores, selection, gradients; no table updates)
  fi   - forward + item-side updates (pallas pos pair + pool scatter)
  full - v9 (adds the user XLA scatter)

Run: python tools/v9_ablate.py
"""
import sys

sys.argv = ["warp_pool_ab.py", "none"]
sys.path.insert(0, "tools")
sys.path.insert(0, ".")
from warp_pool_ab import (  # noqa: E402
    B, K, LR, P, STEPS, W, fwd_pool_small, ia, it, pid, pos_idx, timeit, ua,
    uid, ut,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas  # noqa: E402

# Item-sorted batches (as production would provide them).
srt = [jax.lax.sort([pid[i], uid[i]], num_keys=1) for i in range(STEPS)]
pid_s = jnp.stack([s[0] for s in srt])
uid_s = jnp.stack([s[1] for s in srt])


@jax.jit
def gathers_only(it_, ut_, uid, pid):
    def body(c, xs):
        bu, bi = xs
        u = ut_[bu]
        prep = it_[bi]
        posr = pos_idx[bu]
        return c + jnp.sum(u[0]) + jnp.sum(prep[0]) + posr[0, 0], None

    return jax.lax.scan(body, jnp.float32(0), (uid, pid))[0]


@jax.jit
def fwd_only(it_, ut_, uid, pid):
    keys = jax.random.split(jax.random.key(1), STEPS)

    def body(c, xs):
        bu, bi, k = xs
        out = fwd_pool_small(ut_, it_, bu, bi, k)
        return c + sum(jnp.sum(o[..., :1].astype(jnp.float32)) for o in out), None

    return jax.lax.scan(body, jnp.float32(0), (uid, pid, keys))[0]


@jax.jit
def fwd_item(it_, ia_, ut_, uid, pid):
    keys = jax.random.split(jax.random.key(1), STEPS)

    def body(carry, xs):
        it_, ia_, c = carry
        bu, bi, k = xs
        bi2, bu2, gi, gu, pool_ids, gp, gp2 = fwd_pool_small(ut_, it_, bu, bi, k)
        it_, ia_ = sorted_adagrad_update_pallas(it_, ia_, bi, -gi, learning_rate=LR)
        lrp = LR * jax.lax.rsqrt(ia_[pool_ids])
        it_ = it_.at[pool_ids].add(-(lrp * gp))
        ia_ = ia_.at[pool_ids].add(gp2)
        return (it_, ia_, c + jnp.sum(gu[0])), None

    return jax.lax.scan(body, (it_, ia_, jnp.float32(0)), (uid, pid, keys))[0][2]


print("g    gathers only:   %.3fs" % timeit(gathers_only, it, ut, uid_s, pid_s), flush=True)
print("f    forward only:   %.3fs" % timeit(fwd_only, it, ut, uid_s, pid_s), flush=True)
print("fi   fwd+item upd:   %.3fs" % timeit(fwd_item, it, ia, ut, uid_s, pid_s), flush=True)
