"""Knockout attribution for the fast WARP einsum epoch.

The per-component scans in fast_step_ablate.py over-count: components
overlap inside the real epoch, so their sum (~19ms) exceeds the measured
step (~16.7ms).  This harness measures each component's TRUE critical-path
contribution by knocking it out of the real `run_epochs` program (keeping
its inputs alive with a 0-weighted sum so XLA cannot DCE the upstream
work) and timing the delta.

Run on the TPU: python tools/knockout_ab.py [epochs]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _clustered_interactions  # noqa: E402
import lightfm_tpu.fast_warp as fw  # noqa: E402
from lightfm_tpu import LightFM  # noqa: E402
from lightfm_tpu.train import run_epochs  # noqa: E402

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
# One variant per PROCESS (the TPU runtime flakily kills processes that run
# several distinct full-epoch executables; drive via:
#   for v in baseline no_user no_item no_pool no_membership no_fold no_sigma;
#     do python tools/knockout_ab.py 5 $v; done
VARIANT = sys.argv[2] if len(sys.argv) > 2 else "baseline"


def main():
    n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
    coo = _clustered_interactions(n_users, n_items, nnz)
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    model = LightFM(
        loss="warp", no_components=D, random_state=10, batch_size=131072
    )
    model.fit(coo, epochs=0)
    data, hp, bs = model._staged_train_data, model._staged_hp, model._staged_batch_size
    init = model._state
    seeds = jnp.arange(EPOCHS, dtype=jnp.uint32)

    def measure(tag):
        jax.clear_caches()
        t0 = time.perf_counter()
        s = run_epochs(init, data, seeds, hp, bs, fast="einsum")
        _ = float(jnp.sum(s.item_table))
        compile_wall = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = run_epochs(init, data, seeds, hp, bs, fast="einsum")
            _ = float(jnp.sum(s.item_table))
            best = min(best, time.perf_counter() - t0)
        steps = EPOCHS * (data.packed.shape[1] // bs)
        print(
            f"{tag:24s} {best:.3f}s  {best / steps * 1e3:6.2f} ms/step "
            f"(compile {compile_wall:.0f}s)",
            flush=True,
        )
        return best

    if VARIANT == "baseline":
        measure("baseline")
        return

    # --- knockout: user table update -------------------------------------
    orig_apply = fw._apply_pool_updates

    def no_user_update(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                       gp, gp2, lr, use_pallas, user_pallas, precision):
        out = orig_apply(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                         gp, gp2, lr, use_pallas, user_pallas, precision)
        # keep the permuted gradient stream alive; drop only the kernel
        return out._replace(
            user_table=state.user_table + 0.0 * jnp.sum(gu[sigma]),
            user_acc=state.user_acc,
        )

    if VARIANT == "no_user":
        fw._apply_pool_updates = no_user_update
        measure("no user update")
        return

    def no_item_update(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                       gp, gp2, lr, use_pallas, user_pallas, precision):
        out = orig_apply(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                         gp, gp2, lr, use_pallas, user_pallas, precision)
        return out._replace(
            item_table=state.item_table + 0.0 * jnp.sum(gi),
            item_acc=state.item_acc,
        )

    if VARIANT == "no_item":
        fw._apply_pool_updates = no_item_update
        measure("no item updates (pos+pool)")
        return

    # (zeroed-gp variants still scatter; knock out the scatter itself)
    def no_pool_scatter(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                        gp, gp2, lr, use_pallas, user_pallas, precision):
        item_table, item_acc = fw._sorted_update(
            state.item_table, state.item_acc, pos_ids, -gi, lr, use_pallas,
            precision,
        )
        item_table = item_table + 0.0 * (jnp.sum(gp) + jnp.sum(gp2))
        sgu = gu[sigma]
        user_table, user_acc = fw._sorted_update(
            state.user_table, state.user_acc, suid, sgu, lr, use_pallas,
            precision,
        )
        return state._replace(
            item_table=item_table, item_acc=item_acc,
            user_table=user_table, user_acc=user_acc,
        )

    if VARIANT == "no_pool":
        fw._apply_pool_updates = no_pool_scatter
        measure("no pool-negative scatter")
        return

    # --- knockout: membership test ---------------------------------------
    if VARIANT == "no_membership":
        fw.in_positives_slots = lambda pos, uid, cand: (
            jnp.zeros(cand.shape, bool) | (0.0 * pos.idx[uid[0], 0] > 1)
        )
        measure("no membership test")
        return

    # --- knockout: the fold einsums (gp/gp2) ------------------------------
    if VARIANT == "no_fold":
        fw._fold_gp_einsum = lambda sel, u1q, shifts, precision: (
            jnp.zeros((u1q.shape[1], u1q.shape[2]), jnp.float32)
            + 0.0 * jnp.sum(sel),
            jnp.zeros((u1q.shape[1], u1q.shape[2]), jnp.float32),
        )
        measure("no fold einsums")
        return

    # --- knockout: sigma permute ------------------------------------------
    def no_sigma_apply(state, uid, pos_ids, gi, gu, suid, sigma, pool_ids,
                       gp, gp2, lr, use_pallas, user_pallas, precision):
        item_table, item_acc = fw._sorted_update(
            state.item_table, state.item_acc, pos_ids, -gi, lr, use_pallas,
            precision,
        )
        lrp = lr * jax.lax.rsqrt(item_acc[pool_ids])
        item_table = item_table.at[pool_ids].add(-(lrp * gp))
        item_acc = item_acc.at[pool_ids].add(gp2)
        sgu = gu  # WRONG order on purpose: removes the [B, W] permute
        user_table, user_acc = fw._sorted_update(
            state.user_table, state.user_acc, suid, sgu, lr, use_pallas,
            precision,
        )
        return state._replace(
            item_table=item_table, item_acc=item_acc,
            user_table=user_table, user_acc=user_acc,
        )

    if VARIANT == "no_sigma":
        fw._apply_pool_updates = no_sigma_apply
        measure("no sigma permute")
        return
    raise SystemExit(f"unknown variant {VARIANT}")


if __name__ == "__main__":
    main()
