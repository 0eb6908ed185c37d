from lightfm_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    initialize_multihost,
    make_mesh,
    shard_state,
    shard_train_data,
)
from lightfm_tpu.parallel.ingest import build_local_train_data  # noqa: F401
