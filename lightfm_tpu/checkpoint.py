"""Checkpoint / resume.

The reference's checkpoint format is pickle of the model object (its
`tests/test_movielens.py:387-398` round-trip), which this package also
supports (``LightFM.__getstate__`` stores numpy arrays, not device buffers).
This module adds an explicit, pickle-free format better suited to
production: one ``.npz`` file holding the state pytree + optimizer
accumulators + the numpy RandomState, with hyperparameters in a JSON header
— versioned, inspectable, and loadable without executing arbitrary code.

Resume semantics mirror the reference: a loaded model continues training
with ``fit_partial`` (warm start skips re-init, `lightfm/lightfm.py:636-641`)
and resets with ``fit``.
"""

from __future__ import annotations

import json

import numpy as np

import jax.numpy as jnp

from lightfm_tpu.state import ModelState

FORMAT_VERSION = 2  # v2: lazy-reg scales stored in log space

_STATE_FIELDS = ModelState._fields


def save_model(model, path: str) -> None:
    """Serialize a fitted (or unfitted) LightFM model to ``path`` (.npz)."""
    model._sync_mirrors()  # fold pending in-place edits of state views
    header = {
        "format_version": FORMAT_VERSION,
        "params": {
            k: v
            for k, v in model.get_params().items()
            # random_state is serialized separately; mesh holds device
            # handles (not JSON-serializable, not meaningful across hosts).
            if k not in ("random_state", "mesh")
        },
        "fitted": model._state is not None,
        # Serving metadata: without these a reloaded hybrid model would
        # bypass recommend()'s feature guards and mis-size its catalog.
        "serving": {
            "n_users_": getattr(model, "n_users_", None),
            "n_items_": getattr(model, "n_items_", None),
            "_item_features_used": getattr(model, "_item_features_used", False),
            "_user_features_used": getattr(model, "_user_features_used", False),
        },
    }
    arrays = {"_header": np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)}

    # numpy RandomState: 5-tuple ('MT19937', keys, pos, has_gauss, cached).
    rs = model.random_state.get_state()
    arrays["_rng_keys"] = rs[1]
    arrays["_rng_meta"] = np.array([rs[2], rs[3], rs[4]], dtype=np.float64)

    if model._state is not None:
        for name in _STATE_FIELDS:
            arrays[f"state_{name}"] = np.asarray(getattr(model._state, name))

    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_model(path: str):
    """Load a model saved by :func:`save_model`."""
    from lightfm_tpu.model import LightFM

    with np.load(path) as z:
        header = json.loads(bytes(z["_header"].tobytes()).decode())
        if header["format_version"] > FORMAT_VERSION:
            raise ValueError(
                "Checkpoint format version {} is newer than supported {}".format(
                    header["format_version"], FORMAT_VERSION
                )
            )
        model = LightFM(**header["params"])
        rng_keys = z["_rng_keys"]
        pos, has_gauss, cached = z["_rng_meta"]
        model.random_state.set_state(
            ("MT19937", rng_keys, int(pos), int(has_gauss), float(cached))
        )
        if header["fitted"]:
            arrays = {}
            for name in _STATE_FIELDS:
                if f"state_{name}" in z:
                    arrays[name] = np.asarray(z[f"state_{name}"])
            # v1 migration: scales were stored linear; v2 stores log.
            if header["format_version"] < 2:
                for side in ("item", "user"):
                    old = f"state_{side}_scale"
                    if old in z:
                        arrays[f"{side}_log_scale"] = np.log(
                            np.asarray(z[old], dtype=np.float32)
                        )
            missing = [n for n in _STATE_FIELDS if n not in arrays]
            if missing:
                raise ValueError(
                    f"Checkpoint is missing state fields {missing}; it may "
                    "come from an incompatible version."
                )
            model._state = ModelState(
                **{k: jnp.asarray(v) for k, v in arrays.items()}
            )
            for attr, value in header.get("serving", {}).items():
                if value is not None:
                    setattr(model, attr, value)
    return model
