from lightfm_tpu.ops.representation import (  # noqa: F401
    batch_representation,
    full_representations,
    score_pairs,
)
from lightfm_tpu.ops.updates import sparse_update  # noqa: F401
