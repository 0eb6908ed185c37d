"""Multi-chip training and serving over a device mesh.

Run on a TPU slice, or emulate on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip_sharded.py

The mesh has a ``data`` axis (minibatch split) and a ``model`` axis
(embedding tables row-sharded over feature ids); gradient exchange lowers to
XLA collectives over ICI under GSPMD — no hand-written transport.  For a
multi-host pod slice call ``jax.distributed.initialize()`` first; device
enumeration and collectives then span hosts transparently.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # run from the repo

import numpy as np

import jax

# Honour a JAX_PLATFORMS=cpu request even when a site hook already
# initialised another platform at interpreter startup (axon-style envs).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic
from lightfm_tpu.evaluation import auc_score
from lightfm_tpu.parallel import make_mesh


def main():
    n_dev = len(jax.devices())
    n_model = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)
    print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    data = generate_synthetic(seed=0)
    train = data["train"]

    model = LightFM(
        loss="warp",
        no_components=32,
        random_state=3,
        mesh=mesh,
        table_partition="rows",  # feature-id space split over the model axis
    )
    model.fit(train, epochs=5)
    print("fit:", model.fit_stats_.as_dict())
    print("AUC:", auc_score(model, train.tocsr(), check_intersections=False).mean())

    # Item-sharded retrieval: per-shard top-k + all-gather merge over ICI.
    scores, ids = model.recommend(np.arange(4), k=5)
    print("top-5 for user 0:", ids[0].tolist())


if __name__ == "__main__":
    main()
