"""A/B: fast-path modes over the REAL training path (`run_epochs`) at the
bench's production shape (5M x 200k x 100k, D=64, B=131072): generic
(fast=False) vs fast-einsum.  The mode is a static jit argument, so each
mode compiles its own executable.

The Pallas pool-kernel mode this tool existed to measure LOST its final
composed A/B (2026-08-20, v5e, WARP: einsum 11.89M ex/s / 64s compile vs
kernels 10.61M ex/s / 500s compile) and was removed from the library.

Run on the TPU: python tools/pool_kernels_ab.py [epochs]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _clustered_interactions  # noqa: E402
from lightfm_tpu import LightFM  # noqa: E402
from lightfm_tpu.train import run_epochs  # noqa: E402

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
# Optional filters: pool_kernels_ab.py [epochs] [losses] [modes]
# e.g. `... 5 bpr einsum,kernels` re-measures just those cells.
LOSSES = sys.argv[2].split(",") if len(sys.argv) > 2 else ["warp", "bpr"]
MODES = (
    [m if m != "False" else False for m in sys.argv[3].split(",")]
    if len(sys.argv) > 3
    else [False, "einsum"]
)


def main():
    n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
    coo = _clustered_interactions(n_users, n_items, nnz)
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    for loss in LOSSES:
        model = LightFM(
            loss=loss, no_components=D, random_state=10, batch_size=131072
        )
        model.fit(coo, epochs=0)  # stage data + init state only
        data = model._staged_train_data
        hp, bs = model._staged_hp, model._staged_batch_size
        init = model._state
        seeds = jnp.arange(EPOCHS, dtype=jnp.uint32)

        for mode in MODES:
            try:
                t0 = time.perf_counter()
                state = run_epochs(init, data, seeds, hp, bs, fast=mode)
                _ = float(jnp.sum(state.item_table))
                compile_wall = time.perf_counter() - t0
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    state = run_epochs(init, data, seeds, hp, bs, fast=mode)
                    _ = float(jnp.sum(state.item_table))
                    best = min(best, time.perf_counter() - t0)
                exps = nnz * EPOCHS / best
                print(
                    f"{loss:5s} mode={str(mode):8s} steady {best:.3f}s "
                    f"({exps/1e6:.2f}M ex/s; first+compile {compile_wall:.1f}s)",
                    flush=True,
                )
            except Exception as e:  # keep the other modes running
                print(f"{loss:5s} mode={str(mode):8s} FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()
