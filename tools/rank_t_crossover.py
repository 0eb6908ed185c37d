"""Measure where the predict_rank fused-vs-sort crossover sits in T.

COUNT_T_LIMIT=32 (ops/ranking.py) routes narrow-T tiers to the
Pallas-fused count path on TPU and wide-T tiers to the sort+searchsorted
fallback; the 32 was calibrated on CPU (round-4 verdict, weak #7).  This
sweeps T at a production-ish eval shape and reports both paths' walls so
the limit is a hardware-measured constant.

Run on the TPU: python tools/rank_t_crossover.py
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")

from lightfm_tpu.ops import ranking
from lightfm_tpu.sparse import identity_rows
from lightfm_tpu.state import init_state

N_USERS, N_ITEMS, D = 8192, 100_000, 64
UB = 256  # production predict_ranks_padded user_block


def timeit(f, n=3):
    out = f()
    np.asarray(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.RandomState(0)
    state = init_state(D, N_ITEMS, N_USERS, rng, adagrad=True)
    uf, itf = identity_rows(N_USERS), identity_rows(N_ITEMS)
    uid = np.arange(N_USERS, dtype=np.int32)
    import jax.numpy as jnp

    print(f"device={jax.devices()[0].device_kind} "
          f"{N_USERS} users x {N_ITEMS} items, D={D}", flush=True)
    for T in (8, 16, 32, 64, 128):
        test_idx = rng.randint(0, N_ITEMS, (N_USERS, T)).astype(np.int32)
        valid = np.ones((N_USERS, T), dtype=bool)
        train_idx = np.full((N_USERS, 8), N_ITEMS, np.int32)  # no exclusions
        args = (
            state, uf, itf, jnp.asarray(uid), jnp.asarray(test_idx),
            jnp.asarray(valid), jnp.asarray(train_idx),
        )
        row = [f"T={T:4d}"]
        try:
            t = timeit(lambda: ranking._ranks_fused(
                *args, n_items=N_ITEMS, user_block=UB, item_block=2048))
            row.append(f"fused {t*1e3:7.1f} ms ({N_USERS/t:7.0f} users/s)")
        except Exception as e:
            row.append(f"fused FAILED: {e!r}"[:80])
        try:
            t = timeit(lambda: ranking._ranks_blocked(
                *args, n_items=N_ITEMS, user_block=UB, item_block=8192))
            row.append(f"blocked-sort {t*1e3:7.1f} ms ({N_USERS/t:7.0f} users/s)")
        except Exception as e:
            row.append(f"blocked FAILED: {e!r}"[:80])
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
