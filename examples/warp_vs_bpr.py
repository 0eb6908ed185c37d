"""WARP vs BPR accuracy/time study (reference: doc/examples/warp_loss.rst).

Reproduces the reference's learning-to-rank comparison on MovieLens 100k
(or the synthetic twin when no cached copy exists): WARP and BPR models
with equivalent hyperparameters (no_components=32, alpha=1e-5, adagrad,
70 epochs), recording per-epoch test ROC AUC and per-epoch wall time, then
the reference's follow-up: the effect of ``max_sampled`` on WARP's epoch
time.

On the reference's CPU implementation WARP epochs get SLOWER as the model
fits (its sample-until-violation loop runs longer); the TPU reformulation
draws a fixed ``max_sampled`` candidate block per example inside one
compiled step, so epoch time is constant by construction and ``max_sampled``
scales compute linearly instead of adaptively.  The accuracy story (WARP
beats BPR at equal budgets) is implementation-independent and reproduced
here.

Prints sampled epoch/AUC/duration tables; full curves are written to
``/tmp/warp_vs_bpr.json`` for plotting.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run from the repo

import numpy as np

from lightfm_tpu import LightFM
from lightfm_tpu.evaluation import auc_score


def load():
    try:
        from lightfm_tpu.datasets import fetch_movielens

        return fetch_movielens()
    except Exception:
        from lightfm_tpu.datasets import generate_synthetic

        return generate_synthetic(seed=42)


def run(loss, train, test, epochs, max_sampled=10, alpha=1e-5):
    model = LightFM(
        no_components=32,
        loss=loss,
        learning_schedule="adagrad",
        max_sampled=max_sampled,
        user_alpha=alpha,
        item_alpha=alpha,
        random_state=42,
    )
    auc, duration = [], []
    for _ in range(epochs):
        start = time.perf_counter()
        model.fit_partial(train, epochs=1)
        duration.append(time.perf_counter() - start)
        auc.append(float(auc_score(model, test, train_interactions=train).mean()))
    return auc, duration


def main():
    data = load()
    train, test = data["train"].tocsr(), data["test"].tocsr()

    epochs = int(os.environ.get("EPOCHS", "70"))
    results = {}
    # The reference uses max_sampled=100 for the headline WARP model; the
    # batched TPU path scores all draws every step, so 100 would be an
    # apples-to-oranges compute budget — 10 (the package default) already
    # reproduces the accuracy gap.
    for name, loss, max_sampled in (
        ("warp", "warp", 10),
        ("bpr", "bpr", 10),
        ("warp_max_sampled_3", "warp", 3),
    ):
        auc, duration = run(loss, train, test, epochs, max_sampled=max_sampled)
        results[name] = {"auc": auc, "duration_s": duration}

    ticks = sorted({0, 1, 2, 4, 9, 19, 39, epochs - 1} & set(range(epochs)))
    print("epoch" + " " * 19 + "  ".join(f"{t + 1:>5d}" for t in ticks))
    for name, r in results.items():
        print(f"{name + ' AUC':<24s}" + "  ".join(f"{r['auc'][t]:.3f}" for t in ticks))
    for name, r in results.items():
        d = np.asarray(r["duration_s"])
        print(
            f"{name:<24s}epoch time: first {d[0]:.3f}s, "
            f"steady median {np.median(d[1:]):.3f}s, last {d[-1]:.3f}s"
        )

    with open("/tmp/warp_vs_bpr.json", "w") as fh:
        json.dump(results, fh)
    print("curves -> /tmp/warp_vs_bpr.json")


if __name__ == "__main__":
    main()
