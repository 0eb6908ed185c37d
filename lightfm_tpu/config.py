"""Static hyperparameter configuration.

Mirrors the 12 constructor hyperparameters of the reference model
(`lightfm/lightfm.py:189-241`) plus TPU-specific execution knobs.  The
dataclass is frozen/hashable so it can be a static argument to jitted
functions (one compile per distinct config).
"""

from __future__ import annotations

import dataclasses

LOSSES = ("logistic", "warp", "bpr", "warp-kos")
SCHEDULES = ("adagrad", "adadelta")

# Gradient clip applied to ranking losses, mirroring MAX_LOSS
# (`_lightfm_fast.pyx.template:817,884`).
MAX_LOSS = 10.0


@dataclasses.dataclass(frozen=True)
class Hyperparams:
    """Model hyperparameters (static under jit)."""

    no_components: int = 10
    k: int = 5
    n: int = 10
    learning_schedule: str = "adagrad"
    loss: str = "logistic"
    learning_rate: float = 0.05
    rho: float = 0.95
    epsilon: float = 1e-6
    item_alpha: float = 0.0
    user_alpha: float = 0.0
    max_sampled: int = 10

    # --- TPU execution knobs (no reference equivalent) ---
    # Minibatch size for the synchronous batched SGD reformulation of the
    # reference's per-sample Hogwild loop.  Auto-chosen if None.
    batch_size: int | None = None
    # Number of candidate draws for BPR's rejection sampling of negatives.
    bpr_tries: int = 8

    # --- fast-path execution knobs (lightfm_tpu.fast_warp) ---
    # Per-model, hashable (static under jit, so flipping any of them
    # retraces), visible to get_params/pickles/checkpoints.  The matching
    # LIGHTFM_TPU_* env vars, when set, override these at FIT time for
    # process-wide A/B (fast_warp.apply_env_overrides) — they no longer
    # freeze anything at import.
    #
    # Whether the specialised pool/sorted-update path may engage at all
    # ("auto": TPU backends only; eligibility gates still apply).
    fast_path: str = "auto"  # "auto" | "on" | "off"
    # Pool scoring/fold implementation for the pairwise fast path.  Always
    # the rolled-einsum XLA formulation since round 5: the Pallas pool
    # kernels lost their composed hardware A/B (v5e, WARP 5M/D=64: einsum
    # 11.89M ex/s / 64s compile vs kernels 10.61M ex/s / 500s compile) and
    # were deleted.  "kernels" remains ACCEPTED as a deprecated alias (old
    # checkpoints/params carry it) and resolves to einsum with a warning.
    pool_kernels: str = "auto"  # "auto" | "einsum" | "kernels" (deprecated)
    # Route the user-table update through the sorted Pallas kernel (one
    # extra [B, W] permutation gather) instead of the XLA scatter.
    user_pallas: bool = True
    # MXU precision for the fast path's scoring/fold/update contractions.
    # "default" (bf16 inputs, f32 accumulate) is 1.4-1.7x faster than
    # "highest" (exact-f32 passes) and statistically indistinguishable:
    # 3-seed x 3-loss hardware A/B at the production shape showed AUC
    # trajectories identical to 4 decimals and p@10 within seed noise
    # (tools/precision_ab.py, v5e 2026-08-19).  The reference itself
    # compiles -ffast-math, so exact-f32 update arithmetic was never part
    # of parity; "highest" remains selectable for exactness studies.
    fast_precision: str = "default"  # "default" | "highest"
    # Fast-path epoch-shuffle batch assignment: pointwise Feistel bijection
    # (2 device sorts/epoch) vs sort-based uniform permutation (3 sorts).
    # Changes the RNG consumption pattern, hence part of the model config.
    shuffle_mode: str = "feistel"  # "feistel" | "sort"

    def __post_init__(self):
        # Mirror the reference's constructor asserts (`lightfm/lightfm.py:205-216`).
        assert self.item_alpha >= 0.0
        assert self.user_alpha >= 0.0
        assert self.no_components > 0
        assert self.k > 0
        assert self.n > 0
        assert 0 < self.rho < 1
        assert self.epsilon >= 0
        assert self.learning_schedule in SCHEDULES
        assert self.loss in LOSSES
        # The CONSTRUCTOR rejects max_sampled < 1 (LightFM.__init__, mirroring
        # `lightfm/lightfm.py:215-216`), but a post-construction mutation to 0
        # must reach fit as the reference's "no-op pass" semantics
        # (`tests/test_movielens.py:247-263`), so only negatives are invalid
        # here.
        if self.max_sampled < 0:
            raise ValueError("max_sampled must be non-negative")
        if self.fast_path not in ("auto", "on", "off"):
            raise ValueError("fast_path must be 'auto', 'on' or 'off'")
        if self.pool_kernels not in ("auto", "kernels", "einsum"):
            raise ValueError(
                "pool_kernels must be 'auto', 'kernels' or 'einsum'"
            )
        if self.fast_precision not in ("highest", "default"):
            raise ValueError("fast_precision must be 'highest' or 'default'")
        if self.shuffle_mode not in ("feistel", "sort"):
            raise ValueError("shuffle_mode must be 'feistel' or 'sort'")

    @property
    def adadelta(self) -> bool:
        return self.learning_schedule == "adadelta"
