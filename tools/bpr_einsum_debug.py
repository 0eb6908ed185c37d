"""Isolate the BPR fast-einsum INVALID_ARGUMENT at production shape.

The 5M/200k/100k bench crashes `fast=einsum` for BPR only; WARP (K=10)
einsum runs.  Suspects: the auto-sized rejection budget T (clamped [8,64]
by model._bpr_tries_for — the clustered bench data is skewed, so T is
likely at the cap) blowing up the [T, P, W] rolled-copy einsums, vs
something BPR-specific at any T.

Run on the TPU: python tools/bpr_einsum_debug.py [tries ...]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _clustered_interactions  # noqa: E402
from lightfm_tpu import LightFM  # noqa: E402
from lightfm_tpu.train import run_epochs  # noqa: E402

TRIES = [int(a) for a in sys.argv[1:]] or [None, 8, 16, 32, 64]


def main():
    n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
    coo = _clustered_interactions(n_users, n_items, nnz)
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    model = LightFM(loss="bpr", no_components=D, random_state=10, batch_size=131072)
    model.fit(coo, epochs=0)
    data = model._staged_train_data
    hp, bs = model._staged_hp, model._staged_batch_size
    init = model._state
    seeds = jnp.arange(1, dtype=jnp.uint32)
    print(f"auto bpr_tries={hp.bpr_tries}", flush=True)

    for t in TRIES:
        hp_t = hp if t is None else dataclasses.replace(hp, bpr_tries=t)
        try:
            t0 = time.perf_counter()
            state = run_epochs(init, data, seeds, hp_t, bs, fast="einsum")
            _ = float(jnp.sum(state.item_table))
            print(
                f"tries={hp_t.bpr_tries:3d} OK "
                f"({time.perf_counter() - t0:.1f}s incl compile)",
                flush=True,
            )
        except Exception as e:
            msg = repr(e)
            print(f"tries={hp_t.bpr_tries:3d} FAILED: {msg[:2000]}", flush=True)


if __name__ == "__main__":
    main()
