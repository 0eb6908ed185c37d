"""A/B harness for sparse-update formulations (the scatter wall).

Measures one epoch's worth of update steps (39 x B=131072 WARP-shaped
touches) for several formulations, in a scan like the real epoch.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

R_U, R_I, D, W = 200_000, 100_000, 64, 72
B = 131072
STEPS = 39
LR = 0.05
rng = np.random.RandomState(0)

_k = jax.random.key(0)
_k1, _k2, _k3, _k4 = jax.random.split(_k, 4)
uid = jax.random.randint(_k1, (STEPS, B), 0, R_U, dtype=jnp.int32)
pid = jax.random.randint(_k2, (STEPS, B), 0, R_I, dtype=jnp.int32)
nid = jax.random.randint(_k3, (STEPS, B), 0, R_I, dtype=jnp.int32)
g = jax.random.normal(_k4, (STEPS, B, W), jnp.float32) * 0.01

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

# --- v1: current formulation: 4 scatters (item table+acc, user table+acc) ---
@jax.jit
def v1(it, ia, ut, ua, uid, pid, nid, g):
    def body(carry, xs):
        it, ia, ut, ua = carry
        bu, bp, bn, bg = xs
        iidx = jnp.concatenate([bp, bn])
        ig = jnp.concatenate([-bg, bg])
        lr = LR * jax.lax.rsqrt(ia[iidx])
        it = it.at[iidx].add(-(lr * ig))
        ia = ia.at[iidx].add(ig * ig)
        lru = LR * jax.lax.rsqrt(ua[bu])
        ut = ut.at[bu].add(-(lru * bg))
        ua = ua.at[bu].add(bg * bg)
        return (it, ia, ut, ua), None
    return jax.lax.scan(body, (it, ia, ut, ua), (uid, pid, nid, g))[0]

# --- v2: fused [table | acc] layout: 2 scatters ---
@jax.jit
def v2(itf, utf, uid, pid, nid, g):
    def body(carry, xs):
        itf, utf = carry
        bu, bp, bn, bg = xs
        iidx = jnp.concatenate([bp, bn])
        ig = jnp.concatenate([-bg, bg])
        acc = itf[iidx, W:]
        lr = LR * jax.lax.rsqrt(acc)
        upd = jnp.concatenate([-(lr * ig), ig * ig], axis=1)
        itf = itf.at[iidx].add(upd)
        accu = utf[bu, W:]
        lru = LR * jax.lax.rsqrt(accu)
        updu = jnp.concatenate([-(lru * bg), bg * bg], axis=1)
        utf = utf.at[bu].add(updu)
        return (itf, utf), None
    return jax.lax.scan(body, (itf, utf), (uid, pid, nid, g))[0]

# --- v3: one global fused table: 1 scatter of 3B rows ---
@jax.jit
def v3(tf, uid, pid, nid, g):
    def body(tf, xs):
        bu, bp, bn, bg = xs
        idx = jnp.concatenate([bp + R_U, bn + R_U, bu])
        gg = jnp.concatenate([-bg, bg, bg])
        acc = tf[idx, W:]
        lr = LR * jax.lax.rsqrt(acc)
        upd = jnp.concatenate([-(lr * gg), gg * gg], axis=1)
        tf = tf.at[idx].add(upd)
        return tf, None
    return jax.lax.scan(body, tf, (uid, pid, nid, g))[0]

# --- v4: separate tables but ONE scatter per table incl. acc via stacking
#     [2R, W]: rows 0..R-1 table, R..2R-1 acc ---
@jax.jit
def v4(its, uts, uid, pid, nid, g):
    def body(carry, xs):
        its, uts = carry
        bu, bp, bn, bg = xs
        iidx = jnp.concatenate([bp, bn])
        ig = jnp.concatenate([-bg, bg])
        acc = its[iidx + R_I]
        lr = LR * jax.lax.rsqrt(acc)
        idx2 = jnp.concatenate([iidx, iidx + R_I])
        upd2 = jnp.concatenate([-(lr * ig), ig * ig])
        its = its.at[idx2].add(upd2)
        accu = uts[bu + R_U]
        lru = LR * jax.lax.rsqrt(accu)
        idxu = jnp.concatenate([bu, bu + R_U])
        updu = jnp.concatenate([-(lru * bg), bg * bg])
        uts = uts.at[idxu].add(updu)
        return (its, uts), None
    return jax.lax.scan(body, (its, uts), (uid, pid, nid, g))[0]

_k5, _k6 = jax.random.split(_k4)
it = jax.random.uniform(_k5, (R_I, W), jnp.float32)
ut = jax.random.uniform(_k6, (R_U, W), jnp.float32)
ia = jnp.ones((R_I, W), jnp.float32)
ua = jnp.ones((R_U, W), jnp.float32)

import sys
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("v1", "all"):
    t = timeit(v1, it, ia, ut, ua, uid, pid, nid, g)
    print(f"v1 4-scatter (current):   {t:.3f}s  ({STEPS*B/t/1e6:.1f}M touches/s)", flush=True)
if which in ("v2", "all"):
    itf = jnp.concatenate([it, ia], axis=1)
    utf = jnp.concatenate([ut, ua], axis=1)
    t = timeit(v2, itf, utf, uid, pid, nid, g)
    print(f"v2 fused-acc 2-scatter:   {t:.3f}s", flush=True)
if which in ("v3", "all"):
    itf = jnp.concatenate([it, ia], axis=1)
    utf = jnp.concatenate([ut, ua], axis=1)
    tf = jnp.concatenate([utf, itf], axis=0)
    t = timeit(v3, tf, uid, pid, nid, g)
    print(f"v3 global 1-scatter:      {t:.3f}s", flush=True)
if which in ("v4", "all"):
    its = jnp.concatenate([it, ia], axis=0)
    uts = jnp.concatenate([ut, ua], axis=0)
    t = timeit(v4, its, uts, uid, pid, nid, g)
    print(f"v4 stacked-rows 2-scatter:{t:.3f}s", flush=True)

# --- v5/v6: stripped WARP epoch, strict vs stale-by-one update pipelining ---
K = 10
posw = 32
_k7, _k8 = jax.random.split(_k6)
pos_idx = jax.random.randint(_k7, (R_U, posw), 0, R_I, dtype=jnp.int32)

def fwd(ut_, it_, bu, bi, k):
    u = ut_[bu]
    neg = jax.random.randint(k, (K, B), 0, R_I, dtype=jnp.int32)
    all_ids = jnp.concatenate([bi[None, :], neg], 0).reshape(-1)
    reps = it_[all_ids].reshape(K + 1, B, W)
    preds = jnp.einsum("kbd,bd->kb", reps[..., :-1], u[:, :-1]) + u[:, -1:].T + reps[..., -1]
    prows = pos_idx[bu]
    is_pos = (prows.T[:, None, :] == neg[:, :, None]).any(-1) if False else (
        (pos_idx[bu][None, :, :] == neg[:, :, None]).any(-1))
    cand = (preds[1:] > preds[:1] - 1.0) & (~is_pos)
    j = jnp.argmax(cand, axis=0)
    onehot = (j[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)
    negid = jnp.sum(jnp.where(j[None, :] == jnp.arange(K)[:, None], neg, 0), axis=0)
    nrep = jnp.einsum("kb,kbd->bd", onehot, reps[1:])
    loss = jnp.where(cand.any(0), 1.0, 0.0)
    gu = loss[:, None] * (nrep - reps[0])
    gi = loss[:, None] * u
    return bi, negid, bu, gi, gu

def apply_upd(carry, upd):
    it_, ia_, ut_, ua_ = carry
    bp, bn, bu, gi, gu = upd
    iidx = jnp.concatenate([bp, bn])
    ig = jnp.concatenate([-gi, gi])
    lr = LR * jax.lax.rsqrt(ia_[iidx])
    it_ = it_.at[iidx].add(-(lr * ig))
    ia_ = ia_.at[iidx].add(ig * ig)
    lru = LR * jax.lax.rsqrt(ua_[bu])
    ut_ = ut_.at[bu].add(-(lru * gu))
    ua_ = ua_.at[bu].add(gu * gu)
    return (it_, ia_, ut_, ua_)

@jax.jit
def v5_strict(it_, ia_, ut_, ua_, uid, pid):
    keys = jax.random.split(jax.random.key(1), STEPS)
    def body(carry, xs):
        bu, bi, k = xs
        upd = fwd(carry[2], carry[0], bu, bi, k)
        return apply_upd(carry, upd), None
    return jax.lax.scan(body, (it_, ia_, ut_, ua_), (uid, pid, keys))[0]

@jax.jit
def v6_stale1(it_, ia_, ut_, ua_, uid, pid):
    keys = jax.random.split(jax.random.key(1), STEPS)
    zero = (pid[0], pid[0], uid[0],
            jnp.zeros((B, W), jnp.float32), jnp.zeros((B, W), jnp.float32))
    def body(carry, xs):
        tabs, pending = carry
        bu, bi, k = xs
        upd = fwd(tabs[2], tabs[0], bu, bi, k)   # reads PRE-update tables
        tabs = apply_upd(tabs, pending)           # applies LAST step's update
        return (tabs, upd), None
    (tabs, last), _ = jax.lax.scan(body, ((it_, ia_, ut_, ua_), zero), (uid, pid, keys))
    return apply_upd(tabs, last)

import sys as _sys
if (len(_sys.argv) > 1 and _sys.argv[1] in ("v5", "v6")) or (len(_sys.argv) <= 1):
    if len(_sys.argv) <= 1 or _sys.argv[1] == "v5":
        t = timeit(v5_strict, it, ia, ut, ua, uid, pid)
        print(f"v5 strict epoch:   {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
    if len(_sys.argv) <= 1 or _sys.argv[1] == "v6":
        t = timeit(v6_stale1, it, ia, ut, ua, uid, pid)
        print(f"v6 stale-1 epoch:  {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
