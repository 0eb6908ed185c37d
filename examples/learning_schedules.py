"""Adagrad vs adadelta convergence study (reference: doc/examples/learning_schedules.rst).

Fits WARP and k-OS WARP models under both learning schedules on MovieLens
100k (or the synthetic twin when no cached copy exists), recording the test
ROC AUC after every epoch — the same experiment the reference's
learning-schedules notebook runs, with the same hyperparameters
(no_components=30, alpha=1e-3, 70 epochs).

Prints a sampled epoch/AUC table per loss; the full curves are written to
``/tmp/learning_schedules.json`` for plotting.
"""

import json
import os
import sys

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


def run(loss, schedule, train, test, epochs=70, alpha=1e-3):
    model = LightFM(
        no_components=30,
        loss=loss,
        learning_schedule=schedule,
        user_alpha=alpha,
        item_alpha=alpha,
        random_state=42,
    )
    curve = []
    for _ in range(epochs):
        model.fit_partial(train, epochs=1)
        curve.append(float(auc_score(model, test).mean()))
    return curve


def main():
    data = load()
    train, test = data["train"], data["test"]

    epochs = int(os.environ.get("EPOCHS", "70"))
    results = {}
    for loss in ("warp", "warp-kos"):
        for schedule in ("adagrad", "adadelta"):
            curve = run(loss, schedule, train, test, epochs=epochs)
            results[f"{loss}/{schedule}"] = curve

    ticks = sorted({0, 1, 2, 4, 9, 19, 39, epochs - 1} & set(range(epochs)))
    header = "epoch" + " " * 15 + "  ".join(f"{t + 1:>5d}" for t in ticks)
    print(header)
    for name, curve in results.items():
        row = "  ".join(f"{curve[t]:.3f}" for t in ticks)
        print(f"{name:<20s}{row}")

    with open("/tmp/learning_schedules.json", "w") as fh:
        json.dump(results, fh)
    print("curves -> /tmp/learning_schedules.json")


if __name__ == "__main__":
    main()
