"""A/B: WARP forward via per-example candidate gather vs negative-pool rolls.

The (K+1)*B candidate row gather is fine-grained random HBM access (~100M
rows/s on v5e) — the same wall the update scatters hit.  The pool variant
draws B i.i.d. uniform pool items ONCE per step (one B-row gather), and
example b's k-th candidate is pool slot (b + r_k) mod B — K contiguous
rolls of the pool rep block instead of K*B random row reads.  Marginally
each example still sees i.i.d. uniform candidates scanned in draw order,
so the WARP rank estimator is unchanged; the only delta is that a pool
item serves K examples (vs ~K*B/n_items under per-example draws), a far
weaker coupling than Hogwild's racy shared-table writes.

Run: python tools/warp_pool_ab.py [v5|v7|v8]
"""
import sys
import time
import numpy as np
import jax, jax.numpy as jnp

R_U, R_I, D, W = 200_000, 100_000, 64, 72
B = 131072
STEPS = 39
K = 10
LR = 0.05
posw = 32

_k = jax.random.key(0)
_k1, _k2, _k7, _k8 = jax.random.split(_k, 4)
uid = jax.random.randint(_k1, (STEPS, B), 0, R_U, dtype=jnp.int32)
pid = jax.random.randint(_k2, (STEPS, B), 0, R_I, dtype=jnp.int32)
pos_idx = jax.random.randint(_k7, (R_U, posw), 0, R_I, dtype=jnp.int32)


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


def fwd_gather(ut_, it_, bu, bi, k):
    """Current formulation: per-example candidate gather."""
    u = ut_[bu]
    neg = jax.random.randint(k, (K, B), 0, R_I, dtype=jnp.int32)
    all_ids = jnp.concatenate([bi[None, :], neg], 0).reshape(-1)
    reps = it_[all_ids].reshape(K + 1, B, W)
    preds = (
        jnp.einsum("kbd,bd->kb", reps[..., :-1], u[:, :-1])
        + u[:, -1:].T
        + reps[..., -1]
    )
    is_pos = (pos_idx[bu][None, :, :] == neg[:, :, None]).any(-1)
    cand = (preds[1:] > preds[:1] - 1.0) & (~is_pos)
    j = jnp.argmax(cand, axis=0)
    onehot = (j[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)
    negid = jnp.sum(jnp.where(j[None, :] == jnp.arange(K)[:, None], neg, 0), axis=0)
    nrep = jnp.einsum("kb,kbd->bd", onehot, reps[1:])
    loss = jnp.where(cand.any(0), 1.0, 0.0)
    gu = loss[:, None] * (nrep - reps[0])
    gi = loss[:, None] * u
    return bi, negid, bu, gi, gu


def fwd_pool(ut_, it_, bu, bi, k):
    """Pool formulation: one B-row pool gather + K rolls."""
    kp, kr = jax.random.split(k)
    u = ut_[bu]
    pool_ids = jax.random.randint(kp, (B,), 0, R_I, dtype=jnp.int32)
    pool_reps = it_[pool_ids]  # [B, W]
    prep = it_[bi]  # positive reps [B, W]
    shifts = jax.random.randint(kr, (K,), 0, B, dtype=jnp.int32)

    # K rolled views stacked: candidate k of example b = pool slot (b+r_k)%B
    rolled = jnp.stack(
        [jnp.roll(pool_reps, -shifts[kk], axis=0) for kk in range(K)], 0
    )  # [K, B, W]
    rolled_ids = jnp.stack(
        [jnp.roll(pool_ids, -shifts[kk], axis=0) for kk in range(K)], 0
    )  # [K, B]

    pos_pred = (
        jnp.einsum("bd,bd->b", prep[:, :-1], u[:, :-1]) + u[:, -1] + prep[:, -1]
    )
    preds = (
        jnp.einsum("kbd,bd->kb", rolled[..., :-1], u[:, :-1])
        + u[:, -1:].T
        + rolled[..., -1]
    )
    is_pos = (pos_idx[bu][None, :, :] == rolled_ids[:, :, None]).any(-1)
    cand = (preds > pos_pred[None, :] - 1.0) & (~is_pos)
    j = jnp.argmax(cand, axis=0)
    onehot = (j[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)
    negid = jnp.sum(
        jnp.where(j[None, :] == jnp.arange(K)[:, None], rolled_ids, 0), axis=0
    )
    nrep = jnp.einsum("kb,kbd->bd", onehot, rolled)
    loss = jnp.where(cand.any(0), 1.0, 0.0)
    gu = loss[:, None] * (nrep - prep)
    gi = loss[:, None] * u
    return bi, negid, bu, gi, gu


def make_epoch(fwd):
    @jax.jit
    def epoch(it_, ia_, ut_, ua_, uid, pid):
        keys = jax.random.split(jax.random.key(1), STEPS)

        def body(carry, xs):
            bu, bi, k = xs
            upd = fwd(carry[2], carry[0], bu, bi, k)
            return apply_upd(carry, upd), None

        return jax.lax.scan(body, (it_, ia_, ut_, ua_), (uid, pid, keys))[0]

    return epoch


_k5, _k6 = jax.random.split(_k8)
it = jax.random.uniform(_k5, (R_I, W), jnp.float32)
ut = jax.random.uniform(_k6, (R_U, W), jnp.float32)
ia = jnp.ones((R_I, W), jnp.float32)
ua = jnp.ones((R_U, W), jnp.float32)

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("v5", "all"):
    t = timeit(make_epoch(fwd_gather), it, ia, ut, ua, uid, pid)
    print(f"v5 gather-fwd epoch: {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
if which in ("v7", "all"):
    t = timeit(make_epoch(fwd_pool), it, ia, ut, ua, uid, pid)
    print(f"v7 pool-fwd epoch:   {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)


# ---------------------------------------------------------------------------
# v8: small pool (P) — negative scoring/selection/update all in pool space.
# v9: v8 + item-sorted batches + Pallas sorted kernel for the pos-item pair.
# v10: v9 + user update via per-epoch precomputed sort permutation + Pallas.
# ---------------------------------------------------------------------------
P = 16384
Q = B // P

import sys as _s
sys.path.insert(0, ".")
from lightfm_tpu.ops.pallas_update import sorted_adagrad_update_pallas


def fwd_pool_small(ut_, it_, bu, bi, k):
    kp, kr = jax.random.split(k)
    u = ut_[bu]
    pool_ids = jax.random.randint(kp, (P,), 0, R_I, dtype=jnp.int32)
    pool_reps = it_[pool_ids]  # [P, W]
    prep = it_[bi]
    shifts = jax.random.randint(kr, (K,), 0, P, dtype=jnp.int32)

    rp = jnp.stack([jnp.roll(pool_reps, -shifts[kk], axis=0) for kk in range(K)], 0)  # [K,P,W]
    rids = jnp.stack([jnp.roll(pool_ids, -shifts[kk], axis=0) for kk in range(K)], 0)  # [K,P]

    pos_pred = jnp.einsum("bd,bd->b", prep[:, :-1], u[:, :-1]) + u[:, -1] + prep[:, -1]
    uq = u.reshape(Q, P, W)
    # preds[k, q, s] = dot(u_{qP+s}, rp[k, s]) with unit bias on the user side
    preds = (
        jnp.einsum("qsd,ksd->kqs", uq[..., :-1], rp[..., :-1])
        + uq[None, :, :, -1]
        + rp[:, None, :, -1]
    ).reshape(K, B)
    cand_ids = jnp.broadcast_to(rids[:, None, :], (K, Q, P)).reshape(K, B)
    is_pos = (pos_idx[bu][None, :, :] == cand_ids[:, :, None]).any(-1)
    cand = (preds > pos_pred.reshape(1, B) - 1.0) & (~is_pos)
    j = jnp.argmax(cand, axis=0)
    found = cand.any(0)
    onehot = (j[None, :] == jnp.arange(K)[:, None]).astype(jnp.float32)  # [K,B]
    loss = jnp.where(found, 1.0, 0.0)
    # n_rep via pool-space one-hot (batched over the pool-slot dim)
    nrep = jnp.einsum("kqs,ksd->qsd", (onehot * loss).reshape(K, Q, P), rp).reshape(B, W)
    gu = loss[:, None] * (nrep - prep)
    gi = loss[:, None] * u
    # pool-space negative gradient: slot s accumulates sum over (k, q) hits
    sel = (onehot * loss[None, :]).reshape(K, Q, P)
    g_pool = jnp.einsum("kqs,qsd->ksd", sel, uq)  # before unroll: per-k rolled
    g2_pool = jnp.einsum("kqs,qsd->ksd", sel, uq * uq)
    # unroll the k-th shift: slot (s) in rolled space = pool slot (s+shift)%P
    gp = jnp.zeros((P, W), jnp.float32)
    gp2 = jnp.zeros((P, W), jnp.float32)
    for kk in range(K):
        gp = gp + jnp.roll(g_pool[kk], shifts[kk], axis=0)
        gp2 = gp2 + jnp.roll(g2_pool[kk], shifts[kk], axis=0)
    return bi, bu, gi, gu, pool_ids, gp, gp2


def make_epoch_pool(pallas_item, pallas_user, sorted_uid=None, sigma=None):
    spid = pid  # possibly pre-sorted outside
    @jax.jit
    def epoch(it_, ia_, ut_, ua_, uid, spid_, suid_, sigma_):
        keys = jax.random.split(jax.random.key(1), STEPS)

        def body(carry, xs):
            it_, ia_, ut_, ua_ = carry
            bu, bi, su_, sg_, k = xs
            bi2, bu2, gi, gu, pool_ids, gp, gp2 = fwd_pool_small(ut_, it_, bu, bi, k)
            # --- item table: positive pair ---
            if pallas_item:
                it_, ia_ = sorted_adagrad_update_pallas(
                    it_, ia_, bi, -gi, learning_rate=LR)
            else:
                lr = LR * jax.lax.rsqrt(ia_[bi])
                it_ = it_.at[bi].add(-(lr * (-gi)))
                ia_ = ia_.at[bi].add(gi * gi)
            # --- item table: pool negatives (tiny scatter) ---
            lrp = LR * jax.lax.rsqrt(ia_[pool_ids])
            it_ = it_.at[pool_ids].add(-(lrp * gp))
            ia_ = ia_.at[pool_ids].add(gp2)
            # --- user table ---
            if pallas_user:
                sgu = gu[sg_]  # reorder gradients into user-sorted order
                ut_, ua_ = sorted_adagrad_update_pallas(
                    ut_, ua_, su_, sgu, learning_rate=LR)
            else:
                lru = LR * jax.lax.rsqrt(ua_[bu])
                ut_ = ut_.at[bu].add(-(lru * gu))
                ua_ = ua_.at[bu].add(gu * gu)
            return (it_, ia_, ut_, ua_), None

        return jax.lax.scan(
            body, (it_, ia_, ut_, ua_), (uid, spid_, suid_, sigma_, keys)
        )[0]

    return epoch


if which in ("v8", "v9", "v10", "all"):
    # Pre-sorted views (computed per epoch in production; amortized cost
    # measured separately below).
    spid = jax.lax.sort([pid] + [uid], num_keys=1)  # per-step item sort
    spid_all, uid_of_spid = jnp.stack([jax.lax.sort([pid[i], uid[i]], num_keys=1)[0] for i in range(STEPS)]), None
    # item-sorted batches: sort each step's (pid, uid) by pid
    srt = [jax.lax.sort([pid[i], uid[i]], num_keys=1) for i in range(STEPS)]
    pid_s = jnp.stack([s[0] for s in srt])
    uid_s = jnp.stack([s[1] for s in srt])
    # user-sort of the item-sorted batch + permutation sigma
    srt_u = [
        jax.lax.sort([uid_s[i], jnp.arange(B, dtype=jnp.int32)], num_keys=1)
        for i in range(STEPS)
    ]
    suid = jnp.stack([s[0] for s in srt_u])
    sigma = jnp.stack([s[1] for s in srt_u])

if which in ("v8", "all"):
    f = make_epoch_pool(False, False)
    t = timeit(f, it, ia, ut, ua, uid, pid, suid, sigma)
    print(f"v8 pool-P fwd+negupd:  {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
if which in ("v9", "all"):
    f = make_epoch_pool(True, False)
    t = timeit(f, it, ia, ut, ua, uid_s, pid_s, suid, sigma)
    print(f"v9 +item-sorted pallas:{t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
if which in ("v10", "all"):
    f = make_epoch_pool(True, True)
    t = timeit(f, it, ia, ut, ua, uid_s, pid_s, suid, sigma)
    print(f"v10 +user pallas:      {t:.3f}s  ({STEPS*B/t/1e6:.1f}M ex/s)", flush=True)
