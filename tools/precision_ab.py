"""A/B: fast_precision="highest" (f32 MXU passes) vs "default" (bf16-input,
f32-accumulate) across the whole fast path — the one-hot update dots are
6x cheaper on the MXU at DEFAULT, and the ablation map shows the sorted
updates are now the step's dominant cost (tools/fast_step_ablate.py).

Measures steady 5-epoch throughput AND the train-AUC trajectory (epochs
5/10/15/20) plus precision@10 at 20 epochs, per (loss, precision, seed),
at the bench's production shape.  The reference itself compiles with
-ffast-math (`setup.py:11-38`), so exact-f32 update arithmetic is not
part of reference parity — the bar is the statistical accuracy guard,
same as everywhere else.

One config per PROCESS, and within a process exactly one fast-epoch
executable (a single 5-epoch program re-invoked per block): the TPU
runtime flakily poisons a process that compiles a second distinct
fast-epoch executable (see bench.py `_run_loss_subprocess`).

Parent (drives children):  python tools/precision_ab.py [losses] [seeds]
Child (one config):        python tools/precision_ab.py --child LOSS PREC SEED
"""
import subprocess
import sys
import time

import numpy as np  # noqa: F401  (re-exported pattern with other tools)


def child(loss, prec, seed):
    import jax.numpy as jnp
    import scipy.sparse as sp

    sys.path.insert(0, ".")
    from bench import _auc_sample, _clustered_interactions
    from lightfm_tpu import LightFM
    from lightfm_tpu.evaluation import precision_at_k
    from lightfm_tpu.train import run_epochs

    n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
    coo = _clustered_interactions(n_users, n_items, nnz)
    csr = coo.tocsr()

    model = LightFM(
        loss=loss, no_components=D, random_state=seed,
        batch_size=131072, fast_precision=prec,
    )
    model.fit(coo, epochs=0)
    data = model._staged_train_data
    hp, bs = model._staged_hp, model._staged_batch_size
    fast = model._staged_fast

    aucs, times = [], []
    for block in range(4):  # 4 x 5 epochs, ONE executable
        seeds5 = jnp.arange(5 * block, 5 * block + 5, dtype=jnp.uint32)
        t0 = time.perf_counter()
        model._state = run_epochs(
            model._state, data, seeds5, hp, bs, fast=fast
        )
        _ = float(jnp.sum(model._state.item_table))
        times.append(time.perf_counter() - t0)
        aucs.append(_auc_sample(model, csr))
    # p@10 over the same sampled-user trick as _auc_sample: zero out
    # rows outside a 2048-user sample, evaluate at full catalog width.
    rng = np.random.RandomState(0)
    keep = np.zeros(n_users, np.float32)
    keep[rng.choice(n_users, 2048, replace=False)] = 1.0
    sub = sp.diags(keep).dot(csr).tocsr()
    sub.eliminate_zeros()
    p10 = float(
        precision_at_k(model, sub, k=10, check_intersections=False).mean()
    )
    steady = min(times[1:])
    print(
        f"{loss:5s} prec={prec:8s} seed={seed:2d} "
        f"steady {steady:.3f}s ({nnz * 5 / steady / 1e6:.2f}M ex/s)  "
        f"auc@5/10/15/20 = "
        + "/".join(f"{a:.4f}" for a in aucs)
        + f"  p@10={p10:.4f}",
        flush=True,
    )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    losses = sys.argv[1].split(",") if len(sys.argv) > 1 else ["warp"]
    seeds = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [10, 20, 30]
    )
    for loss in losses:
        for prec in ("default", "highest"):
            for seed in seeds:
                r = subprocess.run(
                    [sys.executable, __file__, "--child", loss, prec,
                     str(seed)],
                    capture_output=True, text=True, timeout=2400,
                )
                out = (r.stdout or "").strip()
                if r.returncode != 0:
                    tail = (r.stderr or out)[-300:]
                    print(f"{loss} prec={prec} seed={seed} FAILED: {tail}",
                          flush=True)
                else:
                    print(out.splitlines()[-1], flush=True)


if __name__ == "__main__":
    main()
