"""A/B: fast_precision="highest" (f32 MXU passes) vs "default" (bf16-input,
f32-accumulate) across the whole fast path — the one-hot update dots are
6x cheaper on the MXU at DEFAULT, and the ablation map shows the sorted
updates are now the step's dominant cost (tools/fast_step_ablate.py).

Measures steady 5-epoch throughput AND the 15-epoch train-AUC guard for
each precision, per loss, at the bench's production shape.  The reference
itself compiles with -ffast-math (`setup.py:11-38`), so exact-f32 update
arithmetic is not part of reference parity — the bar is the statistical
accuracy guard, same as everywhere else.

Run on the TPU: python tools/precision_ab.py [losses]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _auc_sample, _clustered_interactions  # noqa: E402
from lightfm_tpu import LightFM  # noqa: E402
from lightfm_tpu.train import run_epochs  # noqa: E402

LOSSES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["warp", "bpr"]


def main():
    n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
    coo = _clustered_interactions(n_users, n_items, nnz)
    csr = coo.tocsr()
    print(f"device={jax.devices()[0].device_kind}", flush=True)

    for loss in LOSSES:
        for prec in ("highest", "default"):
            model = LightFM(
                loss=loss, no_components=D, random_state=10,
                batch_size=131072, fast_precision=prec,
            )
            model.fit(coo, epochs=0)
            data = model._staged_train_data
            hp, bs = model._staged_hp, model._staged_batch_size
            fast = model._staged_fast
            seeds5 = jnp.arange(5, dtype=jnp.uint32)

            state = run_epochs(model._state, data, seeds5, hp, bs, fast=fast)
            _ = float(jnp.sum(state.item_table))  # compile + warm
            t0 = time.perf_counter()
            state = run_epochs(
                state, data, jnp.arange(5, 10, dtype=jnp.uint32), hp, bs,
                fast=fast,
            )
            _ = float(jnp.sum(state.item_table))
            best = time.perf_counter() - t0
            # Guard at 15 epochs like bench.py.
            state = run_epochs(
                state, data, jnp.arange(10, 15, dtype=jnp.uint32), hp, bs,
                fast=fast,
            )
            model._state = state
            auc = _auc_sample(model, csr)
            print(
                f"{loss:5s} prec={prec:8s} steady {best:.3f}s "
                f"({nnz * 5 / best / 1e6:.2f}M ex/s)  auc15={auc:.4f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
