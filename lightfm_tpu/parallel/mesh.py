"""Device mesh + sharding layout for multi-chip training and serving.

The reference's only parallelism is shared-memory Hogwild threading
(`setup.py:82-93`, OpenMP ``prange``); there is no distributed backend at
all (SURVEY §2.3).  The TPU-native replacement:

- **data axis**: minibatches are split across devices; gradient scatter-adds
  into replicated tables become XLA ``psum``s automatically under GSPMD.
- **model axis**: embedding tables are ROW-SHARDED across devices
  (feature-id space partitioned).  Gathers/scatters against sharded tables
  lower to XLA collectives (all-to-all / collective-permute) over ICI.

Layouts are expressed with ``NamedSharding`` + ``jax.jit`` (GSPMD); XLA
inserts the collectives.  No hand-written transport.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightfm_tpu.state import ModelState
from lightfm_tpu.train import TrainData

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(**kwargs) -> None:
    """Initialise the multi-host JAX runtime (one process per host).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host pods work
    with the same code path: after this, ``jax.devices()`` spans all hosts
    and the mesh built by :func:`make_mesh` lays the ``data``/``model`` axes
    across ICI within a slice and DCN between slices automatically (device
    order is ICI-contiguous).  On Cloud TPU all arguments are auto-detected;
    pass coordinator_address/num_processes/process_id explicitly elsewhere.
    """
    import jax

    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"Mesh shape ({n_data}, {n_model}) does not match {len(devices)} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def _table_spec(mesh: Mesh, table_partition: str, ndim: int) -> P:
    if table_partition == "rows":
        return P(MODEL_AXIS) if ndim == 1 else P(MODEL_AXIS, None)
    if table_partition == "components":
        return P() if ndim == 1 else P(None, MODEL_AXIS)
    return P()  # replicated


def shard_state(state: ModelState, mesh: Mesh, table_partition: str = "rows") -> ModelState:
    """Place model state on the mesh.

    ``table_partition``:
      - ``"rows"``: feature-id space split over the model axis (the
        BASELINE.json north-star layout); gathers exchange rows over ICI.
      - ``"components"``: embedding dimension split; gathers are local,
        scores reduce over the model axis.
      - ``"replicated"``: tables copied to every device (data-parallel only).
    """
    if table_partition == "components":
        n_model = mesh.shape[MODEL_AXIS]
        width = state.item_table.shape[1]
        if width % n_model != 0:
            raise ValueError(
                "'components' table partitioning requires the fused table "
                f"width (= {width}: embedding columns + zero pad + bias "
                f"column; see lightfm_tpu.state.table_width) to be divisible "
                f"by the model-axis size {n_model}; pick a compatible "
                "no_components or use 'rows'."
            )

    n_model_axis = mesh.shape[MODEL_AXIS]
    warned: set = set()

    def place(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = _table_spec(mesh, table_partition, x.ndim)
        if (
            table_partition == "rows"
            and x.shape[0] % n_model_axis != 0
        ):
            # jax rejects device_put of globally-uneven shards; replicate
            # this table (mixed layouts are fine under GSPMD) rather than
            # failing the fit.  Production-sized tables are typically
            # padded/divisible; tiny ones lose nothing by replication.
            if x.shape[0] not in warned:
                warned.add(x.shape[0])
                import warnings

                warnings.warn(
                    f"table with {x.shape[0]} rows is not divisible by the "
                    f"model axis ({n_model_axis}); replicating it instead "
                    "of row-sharding",
                    stacklevel=3,
                )
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    # Scales are scalars; embeddings/biases/accumulators share their table's
    # layout so optimizer updates stay local to the owning shard.
    return jax.tree.map(place, state)


def shard_train_data(
    data: TrainData, mesh: Mesh, shard_examples: bool = False
) -> TrainData:
    """Place training arrays on the mesh.

    By default example arrays are replicated: the per-epoch global shuffle
    (`lightfm/lightfm.py:689-690`) permutes across the whole set, and the
    batch is sharded over the data axis inside the train step (see
    ``run_epoch``'s sharding constraint).

    With ``shard_examples=True`` the packed example block is split over the
    data axis instead — each device (host) holds only its slice, which is
    what a pod-scale input pipeline needs.  The epoch's key-sort shuffle then
    runs under GSPMD over the sharded axis (XLA inserts the exchange); the
    shuffle remains a uniform global permutation.  Feature structures and
    the positives table stay replicated (they are gathered by arbitrary
    ids inside every step).
    """
    replicated = NamedSharding(mesh, P())
    if not shard_examples:
        return jax.tree.map(lambda x: jax.device_put(x, replicated), data)

    packed = jax.device_put(
        data.packed, NamedSharding(mesh, P(None, DATA_AXIS))
    )
    rest = jax.tree.map(
        lambda x: jax.device_put(x, replicated),
        data._replace(packed=jnp.zeros((0,), jnp.int32)),
    )
    return rest._replace(packed=packed)
