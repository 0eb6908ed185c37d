"""Per-host (multi-process) training-data ingestion.

At pod scale no single host should materialise the full interaction set.
Each process reads/builds only its own slice of the examples and calls
:func:`build_local_train_data`; the packed example block is assembled as a
global jax.Array sharded over the mesh's data axis with
``jax.make_array_from_process_local_data`` — no host ever holds more than
its slice.  Pair with ``example_shuffle="local"`` on the model so the
per-epoch permutation also stays host-local (stratified batches, no
shuffle exchange over DCN); see ``train._shuffle_local``.

The reference has no multi-process story at all (its only parallelism is
OpenMP threads over shared memory, `setup.py:82-93`); this module is the
TPU-native scale-out of its single `_run_epoch` input path
(`lightfm/lightfm.py:668-692`).

Negative-sampling support structures (the per-user positives table used
for WARP/BPR rejection, and BPR's empirical item distribution) describe
the GLOBAL training set.  With more than one process they MUST be passed
in (``global_positives`` / ``global_train_items``): these arrays are
replicated into a jointly-compiled SPMD program, and building them from
per-process slices would give each process differently-shaped (and
differently-valued) "replicated" operands — mismatched executables that
can hang or crash the run.  Single-process callers may omit them, where
the local slice IS the global set.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightfm_tpu.config import Hyperparams
from lightfm_tpu.train import TrainData

from lightfm_tpu.parallel.mesh import DATA_AXIS


def _pack_local(coo, weights: np.ndarray, n_local_pad: int) -> np.ndarray:
    """Pack one host's example slice into its [8, n_local_pad] block."""
    n = len(coo.data)
    packed = np.zeros((8, n_local_pad), dtype=np.int32)
    packed[0, :n] = coo.row.astype(np.int32)
    packed[1, :n] = coo.col.astype(np.int32)
    packed[2, :n] = coo.data.astype(np.float32).view(np.int32)
    packed[3, :n] = weights.astype(np.float32).view(np.int32)
    packed[4, :n] = 1
    return packed


def build_local_train_data(
    local_interactions,
    sample_weight_data: Optional[np.ndarray],
    user_feats,
    item_feats,
    hp: Hyperparams,
    batch_size: int,
    mesh: Mesh,
    n_examples_global: int,
    global_positives=None,
    global_train_items: Optional[np.ndarray] = None,
) -> TrainData:
    """Assemble a data-axis-sharded :class:`TrainData` from per-process slices.

    Parameters
    ----------
    local_interactions : scipy COO [n_users, n_items]
        THIS process's slice of the training interactions (full matrix
        shape, locally-held nonzeros).
    sample_weight_data : float32 [local nnz] or None
    user_feats / item_feats : IdentityRows | PaddedRows
        Feature structures (replicated; small relative to examples).
    n_examples_global : int
        Total interaction count across all processes (callers know this
        from their sharded input manifest).
    global_positives : scipy CSR, optional
        Global per-user positive items for negative-sample rejection.
        Defaults to the local slice (see module docstring).
    global_train_items : int array, optional
        Global item column for BPR's empirical negative distribution.
        Defaults to the local slice's items.
    """
    import scipy.sparse as sp

    from lightfm_tpu.sparse import pad_csr_sorted

    coo = local_interactions.tocoo()
    n_local = len(coo.data)
    if sample_weight_data is None:
        sample_weight_data = np.ones(n_local, dtype=np.float32)

    n_procs = jax.process_count()
    n_data = mesh.shape[DATA_AXIS]
    if n_data % n_procs != 0:
        raise ValueError(
            f"data axis ({n_data}) must be a multiple of process count ({n_procs})"
        )
    # Global pad: whole number of batches AND an equal slice per data shard.
    chunk = int(np.lcm(batch_size, n_data))
    n_pad = max(1, -(-n_examples_global // chunk)) * chunk
    n_local_pad = n_pad // n_procs
    if n_local > n_local_pad:
        raise ValueError(
            f"local slice ({n_local}) exceeds its share of the padded global "
            f"block ({n_local_pad}); pass the true global example count"
        )

    local_packed = _pack_local(coo, np.asarray(sample_weight_data), n_local_pad)

    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    packed = jax.make_array_from_process_local_data(sharding, local_packed)

    positives = None
    train_items = None
    if hp.loss in ("warp", "bpr", "warp-kos"):
        # Replicated-operand shape safety: the positives table's padded width
        # derives from the max user degree of its SOURCE.  Built from local
        # slices, each process would produce a differently-shaped "replicated"
        # array feeding one jointly-compiled SPMD program — a hang/crash, not
        # just statistical noise.  Same for BPR's train_items length below.
        if global_positives is None and jax.process_count() > 1:
            raise ValueError(
                f"loss='{hp.loss}' needs the GLOBAL per-user positives for "
                "negative-sample rejection; with multiple processes pass "
                "global_positives (a [n_users, n_items] CSR of all training "
                "interactions) — per-process slices would give each process "
                "a differently-shaped replicated array"
            )
        src = global_positives if global_positives is not None else coo
        csr = sp.csr_matrix(src)
        if not csr.has_sorted_indices:
            csr = csr.sorted_indices()
        max_width = None if hp.loss == "warp-kos" else 512
        positives = pad_csr_sorted(csr, pad_multiple=8, max_width=max_width)
    if hp.loss == "bpr":
        if global_train_items is None and jax.process_count() > 1:
            raise ValueError(
                "loss='bpr' needs the GLOBAL training item column (its "
                "empirical negative distribution); with multiple processes "
                "pass global_train_items — per-process slices would give "
                "each process a differently-shaped replicated array"
            )
        items = (
            np.asarray(global_train_items, dtype=np.int32)
            if global_train_items is not None
            else coo.col.astype(np.int32)
        )
        train_items = jnp.asarray(items)

    replicated = NamedSharding(mesh, P())
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, replicated), t)

    return TrainData(
        packed=packed,
        user_feats=put(user_feats),
        item_feats=put(item_feats),
        positives=put(positives) if positives is not None else None,
        train_items=(
            jax.device_put(train_items, replicated)
            if train_items is not None
            else None
        ),
    )
