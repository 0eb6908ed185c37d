"""The LightFM-compatible hybrid factorization model, TPU-native.

Public API mirrors the reference class (`lightfm/lightfm.py:189-1107`):
``fit``, ``fit_partial``, ``predict``, ``predict_rank``,
``get_item_representations``, ``get_user_representations``, ``get_params``,
``set_params``, and the twelve state attributes (numpy views over the device
pytree).  ``num_threads`` arguments are accepted for drop-in compatibility
but ignored: parallelism comes from the XLA device (mesh) instead of OpenMP.
"""

from __future__ import annotations

import weakref

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from lightfm_tpu.config import Hyperparams
from lightfm_tpu.ops.representation import batch_representation, score_pairs
from lightfm_tpu.ops.ranking import predict_ranks_padded
from lightfm_tpu.sparse import content_fingerprint, identity_rows, pad_csr
from lightfm_tpu.state import ModelState, init_state
from lightfm_tpu.train import (
    build_train_data,
    choose_batch_size,
    run_epoch,
    run_epochs,
)

__all__ = ["LightFM"]

CYTHON_DTYPE = np.float32  # the reference's on-disk dtype; kept for parity

# Cross-model memo for staged transposed-feature structures (the hybrid
# fast path's fat tier is a few hundred MB of build+upload; see
# LightFM._transposed_features).  Keyed by matrix identity + content
# fingerprint with a weakref liveness guard; bounded FIFO.
_TRANSPOSE_MEMO: dict = {}

# Public attribute name -> (internal fused array, column view).  The
# reference exposes 12 separate arrays (`lightfm/lightfm.py:243-257`);
# internally biases live in the LAST column of each width-padded table
# (see lightfm_tpu.state.table_width).
_FIELD_MAP = {
    "item_embeddings": ("item_table", "emb"),
    "item_biases": ("item_table", "bias"),
    "item_embedding_gradients": ("item_acc", "emb"),
    "item_bias_gradients": ("item_acc", "bias"),
    "item_embedding_momentum": ("item_mom", "emb"),
    "item_bias_momentum": ("item_mom", "bias"),
    "user_embeddings": ("user_table", "emb"),
    "user_biases": ("user_table", "bias"),
    "user_embedding_gradients": ("user_acc", "emb"),
    "user_bias_gradients": ("user_acc", "bias"),
    "user_embedding_momentum": ("user_mom", "emb"),
    "user_bias_momentum": ("user_mom", "bias"),
}


@jax.jit
def _predict_pairs_jit(state: ModelState, user_feats, item_feats, user_ids, item_ids):
    # Lazy-reg scales are folded into the tables at every epoch end, so
    # prediction skips the scale multiply.
    u_rep = batch_representation(state.user_table, user_feats, user_ids)
    i_rep = batch_representation(state.item_table, item_feats, item_ids)
    return score_pairs(u_rep, i_rep)


class LightFM:
    """A hybrid latent representation recommender model (TPU-native).

    Semantics follow the reference LightFM: user/item representations are the
    weighted sums of their features' embeddings; four losses (logistic, BPR,
    WARP, WARP-kOS); two adaptive schedules (adagrad, adadelta).  Training is
    synchronous batched SGD with vectorised negative sampling instead of the
    reference's per-sample Hogwild loop — equivalent in the same statistical
    sense the reference's multithreaded mode is to its single-threaded mode.
    """

    def __init__(
        self,
        no_components=10,
        k=5,
        n=10,
        learning_schedule="adagrad",
        loss="logistic",
        learning_rate=0.05,
        rho=0.95,
        epsilon=1e-6,
        item_alpha=0.0,
        user_alpha=0.0,
        max_sampled=10,
        random_state=None,
        batch_size=None,
        mesh=None,
        table_partition="replicated",
        shard_examples=False,
        example_shuffle="global",
        fast_path="auto",
        pool_kernels="auto",
        user_pallas=True,
        fast_precision="default",
        shuffle_mode="feistel",
    ):
        # Validation mirrors `lightfm/lightfm.py:205-216` (assertions +
        # max_sampled ValueError); mostly delegated to
        # Hyperparams.__post_init__.  max_sampled=0 is rejected HERE but not
        # there: the reference's suite reaches fit with 0 by mutating the
        # attribute post-construction (a documented no-op pass,
        # `tests/test_movielens.py:247-263`), so only the constructor raises.
        if max_sampled < 1:
            raise ValueError("max_sampled must be a positive integer")
        _ = Hyperparams(
            no_components=no_components,
            k=int(k),
            n=int(n),
            learning_schedule=learning_schedule,
            loss=loss,
            learning_rate=learning_rate,
            rho=rho,
            epsilon=epsilon,
            item_alpha=item_alpha,
            user_alpha=user_alpha,
            max_sampled=max_sampled,
            batch_size=batch_size,
            fast_path=fast_path,
            pool_kernels=pool_kernels,
            user_pallas=user_pallas,
            fast_precision=fast_precision,
            shuffle_mode=shuffle_mode,
        )

        self.loss = loss
        self.learning_schedule = learning_schedule
        self.no_components = no_components
        self.learning_rate = learning_rate
        self.k = int(k)
        self.n = int(n)
        self.rho = rho
        self.epsilon = epsilon
        self.max_sampled = max_sampled
        self.item_alpha = item_alpha
        self.user_alpha = user_alpha
        self.batch_size = batch_size
        # Fast-path execution knobs (lightfm_tpu.fast_warp; see config.py).
        # Per-model and checkpointable; matching LIGHTFM_TPU_* env vars
        # override them at fit time (fast_warp.apply_env_overrides).
        self.fast_path = fast_path
        self.pool_kernels = pool_kernels
        self.user_pallas = user_pallas
        self.fast_precision = fast_precision
        self.shuffle_mode = shuffle_mode
        # TPU execution config: device mesh + table partitioning
        # ("replicated" | "rows" | "components" | "auto") + example-block
        # sharding over the data axis (pod-scale inputs); see
        # lightfm_tpu.parallel.  "auto" resolves at fit time: replicated
        # while the model state fits the per-device budget (the layout the
        # fast path requires — measured 1.9x the generic path per chip),
        # row-sharded beyond it (capacity scaling; generic path).
        self.mesh = mesh
        self.table_partition = table_partition
        self.shard_examples = shard_examples
        # "global": one permutation over the whole example block (the
        # reference's semantics). "local": per-data-shard permutations with
        # stratified batches — the pod-scale input layout (no shuffle
        # exchange over DCN); requires mesh + shard_examples.
        if example_shuffle not in ("global", "local"):
            raise ValueError("example_shuffle must be 'global' or 'local'")
        if example_shuffle == "local" and mesh is None:
            raise ValueError(
                "example_shuffle='local' shuffles within data-axis shards "
                "and requires a mesh; without one it would silently behave "
                "like 'global'"
            )
        self.example_shuffle = example_shuffle

        if random_state is None:
            self.random_state = np.random.RandomState()
        elif isinstance(random_state, np.random.RandomState):
            self.random_state = random_state
        else:
            self.random_state = np.random.RandomState(random_state)

        self._reset_state()

    # ------------------------------------------------------------------
    # State plumbing
    # ------------------------------------------------------------------

    def _reset_state(self):
        self._state: ModelState | None = None
        # recommend()'s catalog representations / compressed index, rebuilt
        # lazily whenever the model state changes.
        self._serving_cache: dict = {}
        # Writable host mirrors of the fused state tables, handed out (as
        # views) by the state-attribute getters so user code can edit
        # embeddings IN PLACE like the reference's plain numpy attributes
        # (`lightfm/lightfm.py:243-257`).  Keyed by ModelState field name;
        # `_mirror_snaps` holds pristine copies used to detect edits at the
        # next state-consuming call (`_sync_mirrors`).
        self._host_mirrors: dict = {}
        self._mirror_snaps: dict = {}

    def _hp(self, bpr_tries: int = 8) -> Hyperparams:
        return Hyperparams(
            no_components=self.no_components,
            k=int(self.k),
            n=int(self.n),
            learning_schedule=self.learning_schedule,
            loss=self.loss,
            learning_rate=self.learning_rate,
            rho=self.rho,
            epsilon=self.epsilon,
            item_alpha=self.item_alpha,
            user_alpha=self.user_alpha,
            max_sampled=self.max_sampled,
            batch_size=self.batch_size,
            bpr_tries=bpr_tries,
            fast_path=self.fast_path,
            pool_kernels=self.pool_kernels,
            user_pallas=self.user_pallas,
            fast_precision=self.fast_precision,
            shuffle_mode=self.shuffle_mode,
        )

    @staticmethod
    def _bpr_tries_for(interactions) -> int:
        """Rejection-draw budget for BPR's empirical negative sampling.

        The reference retries up to ``no_examples`` times when a draw lands
        on a true positive (template:1122-1126) — effectively always finding
        a negative.  Our batched draw uses a fixed number of tries T; a draw
        hits user u's positives with probability p_u = (empirical mass of
        u's positive ITEMS) / nnz — a user whose few positives are the
        globally most popular items can have large p_u despite a small
        degree.  Size T so the worst user falls through < 1e-3 of the time,
        snapped to powers of two (stable jit cache keys), clamped [8, 64].
        """
        import scipy.sparse as sp

        nnz = interactions.nnz
        if nnz == 0:
            return 8
        csr = sp.csr_matrix(interactions)
        item_counts = np.asarray(csr.getnnz(axis=0), dtype=np.float64).ravel()
        # Per-user sum of their positive items' global counts (one spmv).
        indicator = csr.copy()
        indicator.data = np.ones_like(indicator.data)
        user_mass = indicator.dot(item_counts)
        p = min(float(user_mass.max(initial=0.0)) / nnz, 0.99)
        if p <= 0:
            return 8
        need = int(np.ceil(np.log(1e-3) / np.log(p))) if p > 1e-3 else 1
        return int(min(64, max(8, 1 << (max(need, 1) - 1).bit_length())))

    def _check_initialized(self):
        if self._state is None:
            raise ValueError(
                "You must fit the model before trying to obtain predictions."
            )
        self._sync_mirrors()

    # The reference exposes its 12 state arrays as plain numpy attributes
    # (`lightfm/lightfm.py:243-257`) that user code edits in place (e.g.
    # normalizing embeddings after training).  We hand out views over
    # writable HOST MIRRORS of the fused device tables; edits are detected
    # by snapshot comparison and pushed back to the device at the next
    # state-consuming call (fit_partial/predict/predict_rank/recommend/
    # representations/pickle).  Attribute ASSIGNMENT writes through
    # immediately, as before.
    def _mirror(self, attr):
        m = self._host_mirrors.get(attr)
        if m is None:
            m = np.array(getattr(self._state, attr))  # writable host copy
            self._host_mirrors[attr] = m
            self._mirror_snaps[attr] = m.copy()
        return m

    def _drop_mirrors(self):
        self._host_mirrors = {}
        self._mirror_snaps = {}

    def _sync_mirrors(self):
        """Push in-place edits of handed-out state views back to the device.

        Exact (bytewise snapshot compare, no checksum collisions); costs one
        host-memory pass per mirrored table per call, and mirrors only exist
        once a state attribute has been read since the last fit.  Under
        multi-process execution the mirrors are per-host, so in-place edits
        must be applied identically on every process (the same contract as
        any replicated host input).
        """
        mirrors = getattr(self, "_host_mirrors", None)
        if not mirrors or self._state is None:
            return
        for attr, m in mirrors.items():
            if np.array_equal(m, self._mirror_snaps[attr]):
                continue
            orig = getattr(self._state, attr)
            self._state = self._state._replace(
                **{attr: jax.device_put(m, orig.sharding)}
            )
            self._mirror_snaps[attr] = m.copy()
            self._drop_state_dependent_cache()  # representations changed

    def _transposed_features(self, csr, padded, batch_size, fast_precision):
        """Transposed feature lists for the aggregated hybrid fast-path
        update, or None when it should not engage (identity features, or
        entity+feature counts so large that the dense per-step table
        streams of the aggregated formulation would dominate the batch
        work).  Memoized by the feature matrix's identity."""
        from lightfm_tpu.sparse import PaddedRows

        if not isinstance(padded, PaddedRows):
            return None
        # The aggregated update streams [n_entities + n_features, 2W]
        # densely every step; keep that proportional to the batch work
        # (beyond it the expanded-touch scatter path costs less).
        if padded.n_rows + padded.n_cols > 32 * batch_size:
            return None
        # Split the transpose by row width: identity columns transpose to
        # width-1 rows (cheap padded gathers), tag/genre columns to rows
        # listing hundreds of entities — those become DENSE [M, n_entities]
        # weight matrices whose walk is one MXU matmul per gradient half
        # instead of a padding-inflated gather (measured: the chunked
        # gather walk alone cost ~29 ms/step at the production hybrid
        # shape; the dense fat tier streams in ~1 ms).
        # Module-level memo (not the per-model serving cache): the fat
        # tier is a few hundred MB built+uploaded from the CSR, and
        # refitting a fresh model on the same features — the benchmark /
        # hyperparameter-search pattern — must not pay it again.
        key = (f"feats_T_{fast_precision}", id(csr), content_fingerprint(csr))
        hit = _TRANSPOSE_MEMO.get(key)
        if hit is not None:
            ref, val = hit
            if ref() is csr:
                return val
        val = self._build_transposed(csr, fast_precision)
        try:
            # Sweep dead entries FIRST (a GC'd matrix must not keep pinning
            # hundreds of MB of device arrays until FIFO eviction), then
            # bound what's left.
            dead = [k for k, (r, _) in _TRANSPOSE_MEMO.items() if r() is None]
            for k in dead:
                _TRANSPOSE_MEMO.pop(k, None)
            if len(_TRANSPOSE_MEMO) >= 4:  # bounded: drop the oldest
                _TRANSPOSE_MEMO.pop(next(iter(_TRANSPOSE_MEMO)))
            _TRANSPOSE_MEMO[key] = (weakref.ref(csr), val)
        except TypeError:
            pass
        return val

    # Dense fat-tier budget (total across fat_w + fat_w2).  ~10% of a
    # v5e's HBM: the tier is streamed once per step, so beyond this the
    # dense matmuls stop being cheap relative to the batch work anyway.
    # LIGHTFM_TPU_FAT_TIER_BYTES overrides.
    @property
    def _FAT_TIER_LIMIT_BYTES(self):
        import os

        return int(
            os.environ.get("LIGHTFM_TPU_FAT_TIER_BYTES", 1536 << 20)
        )

    def _build_transposed(self, csr, fast_precision):
        import scipy.sparse as _sp

        from lightfm_tpu.fast_warp import TransposedFeats
        from lightfm_tpu.sparse import pad_csr

        csr_t = csr.T.tocsr()
        lengths = np.diff(csr_t.indptr)
        C = 8
        fat = np.flatnonzero(lengths > C)
        # Fat tier budget, stage 1 (before paying todense): reject when
        # even the BEST case (one shared bf16 matrix) is over.  Stage 2
        # below re-checks the ACTUAL bytes once dtype/sharing are known
        # (f32 fallback + a distinct squared matrix cost up to 4x).
        # Over budget -> None: the expanded-touch scatter path measured
        # FASTER than the chunked transposed gather walk at production
        # shape (doc/roadmap.md round-5 table), so the walk is not a
        # useful fallback.
        if len(fat) and len(fat) * csr_t.shape[1] * 2 > (
            self._FAT_TIER_LIMIT_BYTES
        ):
            return None
        if len(fat):
            keep = np.ones(csr_t.shape[0], np.float32)
            keep[fat] = 0.0
            thin_csr = _sp.diags(keep).dot(csr_t).tocsr()
            thin_csr.eliminate_zeros()
            thin = pad_csr(thin_csr, pad_multiple=1)
            dense = np.asarray(csr_t[fat].todense(), dtype=np.float32)
            sq = dense * dense
            import ml_dtypes

            # bf16 storage halves the per-step stream but must not round
            # the DATA (the scatter path it replaces keeps f32 weights):
            # only when both matrices round-trip exactly (the ubiquitous
            # binary-weight case, where sq is dense too).
            bf16_ok = (
                fast_precision == "default"
                and np.array_equal(
                    dense.astype(ml_dtypes.bfloat16).astype(np.float32),
                    dense,
                )
                and np.array_equal(
                    sq.astype(ml_dtypes.bfloat16).astype(np.float32), sq
                )
            )
            dt = jnp.bfloat16 if bf16_ok else jnp.float32
            shared = np.array_equal(sq, dense)
            actual = (1 if shared else 2) * dense.size * (
                2 if bf16_ok else 4
            )
            if actual > self._FAT_TIER_LIMIT_BYTES:
                return None  # stage-2 budget check (see above)
            fat_w = jnp.asarray(dense, dtype=dt)
            fat_w2 = fat_w if shared else jnp.asarray(sq, dtype=dt)
            return TransposedFeats(
                thin=thin,
                fat_rows=jnp.asarray(fat.astype(np.int32)),
                fat_w=fat_w,
                fat_w2=fat_w2,
            )
        return TransposedFeats(
            thin=pad_csr(csr_t, pad_multiple=1),
            fat_rows=None, fat_w=None, fat_w2=None,
        )

    def _resolve_table_partition(self):
        """Resolve ``table_partition="auto"`` at fit time.

        The decision (design.md "Layout decision"): REPLICATED tables +
        data-parallel is strictly better per chip while the model state
        fits HBM — it is the only layout the fast path supports, and the
        fast path measured 1.9x the generic path on v5e at the production
        shape (the generic path is what row-sharding would run).  "auto"
        therefore picks replicated until the state (tables + optimizer
        accumulators, f32) exceeds a per-device budget, then falls back to
        row-sharding over the model axis for capacity.

        Budget: LIGHTFM_TPU_REPLICATED_TABLE_BUDGET (bytes) when set, else
        half the device's reported memory limit, else 4 GiB.
        """
        if self.table_partition != "auto":
            return self.table_partition
        if self.mesh is None or self._state is None:
            return "replicated"
        import os

        raw = os.environ.get("LIGHTFM_TPU_REPLICATED_TABLE_BUDGET")
        if raw:
            budget = int(raw)
        else:
            budget = 4 << 30
            try:
                stats = jax.devices()[0].memory_stats()
                if stats and stats.get("bytes_limit"):
                    budget = stats["bytes_limit"] // 2
            except Exception:
                pass
        # Count the ACTUAL state pytree (ModelState allocates the adadelta
        # mom arrays full-size even under adagrad — state.py init_state).
        state_bytes = sum(
            x.size * x.dtype.itemsize for x in self._state
        )
        if state_bytes <= budget:
            return "replicated"
        n_model = dict(
            zip(self.mesh.axis_names, self.mesh.devices.shape)
        ).get("model", 1)
        if n_model <= 1:
            import warnings

            warnings.warn(
                f"table_partition='auto': model state ({state_bytes >> 20} "
                f"MiB) exceeds the per-device replication budget "
                f"({budget >> 20} MiB), but the mesh's 'model' axis has "
                "size 1, so row-sharding cannot reduce per-device memory. "
                "Build the mesh with n_model > 1 for capacity scaling.",
                stacklevel=3,
            )
        return "rows"

    def _save_checkpoint(self, path):
        """Atomic mid-fit checkpoint: write-to-temp + rename, so a kill
        during the write can never leave a truncated checkpoint behind."""
        import os

        from lightfm_tpu.checkpoint import save_model

        tmp = f"{path}.tmp"
        save_model(self, tmp)
        os.replace(tmp, path)

    def _drop_state_dependent_cache(self):
        """Drop serving-cache entries derived from MODEL STATE (the serving
        index / staged catalog representations), keeping the identity-keyed
        host prep (padded features, converted CSRs, rank tiers) that depends
        only on the input matrices."""
        self._serving_cache = {
            k: v
            for k, v in self._serving_cache.items()
            if not (isinstance(k, tuple) and k and k[0] in ("index", "catalog"))
        }

    def _get_field(self, name):
        if self._state is None:
            return None
        attr, kind = _FIELD_MAP[name]
        arr = self._mirror(attr)
        # Layout: [emb cols 0..D-1 | zero pad | bias col W-1] (lightfm_tpu.state).
        return arr[:, : self.no_components] if kind == "emb" else arr[:, -1]

    def _set_field(self, name, value):
        if value is None:
            return
        if self._state is None:
            raise ValueError("Cannot set model state before the model is fitted.")
        # Fold any pending in-place edits first so assignment to one field
        # does not silently discard edits made through another field's view.
        self._sync_mirrors()
        attr, kind = _FIELD_MAP[name]
        table = getattr(self._state, attr)
        value = jnp.asarray(np.asarray(value, dtype=np.float32))
        if kind == "emb":
            table = table.at[:, : self.no_components].set(value)
        else:
            table = table.at[:, -1].set(value)
        self._state = self._state._replace(**{attr: table})
        # The mirror (and any outstanding views of it) no longer reflects
        # the device table; drop it so the next read re-mirrors.
        self._host_mirrors.pop(attr, None)
        self._mirror_snaps.pop(attr, None)
        self._serving_cache = {}

    # ------------------------------------------------------------------
    # Input coercion / validation (mirrors lightfm.py:314-472)
    # ------------------------------------------------------------------

    def _construct_feature_matrices(self, n_users, n_items, user_features, item_features):
        if user_features is None:
            user_features = sp.identity(n_users, dtype=CYTHON_DTYPE, format="csr")
        else:
            user_features = user_features.tocsr()

        if item_features is None:
            item_features = sp.identity(n_items, dtype=CYTHON_DTYPE, format="csr")
        else:
            item_features = item_features.tocsr()

        if n_users > user_features.shape[0]:
            raise Exception(
                "Number of user feature rows does not equal the number of users"
            )
        if n_items > item_features.shape[0]:
            raise Exception(
                "Number of item feature rows does not equal the number of items"
            )

        if self._state is not None:
            if not self._state.user_table.shape[0] >= user_features.shape[1]:
                raise ValueError(
                    "The user feature matrix specifies more "
                    "features than there are estimated "
                    "feature embeddings: {} vs {}.".format(
                        self._state.user_table.shape[0], user_features.shape[1]
                    )
                )
            if not self._state.item_table.shape[0] >= item_features.shape[1]:
                raise ValueError(
                    "The item feature matrix specifies more "
                    "features than there are estimated "
                    "feature embeddings: {} vs {}.".format(
                        self._state.item_table.shape[0], item_features.shape[1]
                    )
                )

        if user_features.dtype != CYTHON_DTYPE:
            user_features = user_features.astype(CYTHON_DTYPE)
        if item_features.dtype != CYTHON_DTYPE:
            item_features = item_features.astype(CYTHON_DTYPE)

        return user_features, item_features

    @staticmethod
    def _is_identity(csr) -> bool:
        n, m = csr.shape
        if n != m or csr.nnz != n:
            return False
        return (
            np.array_equal(csr.indptr, np.arange(n + 1))
            and np.array_equal(csr.indices, np.arange(n))
            and np.all(csr.data == 1.0)
        )

    @classmethod
    def _pad_features(cls, csr):
        if cls._is_identity(csr):
            return identity_rows(csr.shape[0])
        # Multiple-of-8 row widths keep the per-row index/weight gathers on
        # the fast TPU lowering path (see lightfm_tpu.state.table_width).
        # The width cap bounds padding on skewed data: when the heaviest row
        # is far wider than the 99th percentile, its tail spills into
        # ChunkedRows overflow chunks instead of inflating [n_rows, width]
        # for the whole matrix (exact either way).
        lengths = np.diff(sp.csr_matrix(csr).indptr)
        if len(lengths):
            p99 = int(np.percentile(lengths, 99))
            cap = max(8 * ((p99 + 7) // 8), 8)
            if int(lengths.max()) > max(4 * cap, 64):
                return pad_csr(csr, pad_multiple=8, width_cap=cap)
        return pad_csr(csr, pad_multiple=8)

    def _memo_by_identity(self, kind: str, obj, build):
        """Memoize ``build(obj)`` in the serving cache keyed by ``obj``'s
        identity (weakref-guarded against id reuse) plus a content checksum
        (in-place mutation misses instead of returning stale results).

        The standard per-epoch evaluation loop passes the SAME test/train
        matrices and feature matrices to every metric call; memoizing on
        identity lets repeated ``predict_rank``/``predict`` calls skip all
        host-side padding and host->device staging (round-2 verdict #6).
        """
        # CRC32 content checksum (sparse.content_fingerprint) so in-place
        # mutation — including sum-preserving edits like swapping two
        # entries — misses instead of returning stale results.
        key = (kind, id(obj), content_fingerprint(obj))
        hit = self._serving_cache.get(key)
        if hit is not None:
            ref, val = hit
            if ref() is obj:
                return val
        val = build(obj)
        if val is obj:
            # Identity build (e.g. the input was already CSR/float32):
            # nothing to memoize, and caching would make the entry
            # immortal — the cache's strong reference to ``val`` would keep
            # the weakref alive forever, so the dead-entry sweep could
            # never evict it.
            return val
        try:
            entry = (weakref.ref(obj), val)
        except TypeError:  # non-weakref-able input; skip caching
            return val
        # Evict same-identity entries with a stale checksum, then any
        # dead-identity entries (so dropped matrices don't pin device
        # buffers until an arbitrary size threshold).
        for k, v in list(self._serving_cache.items()):
            stale_same = (
                isinstance(k, tuple) and len(k) == 3
                and k[:2] == key[:2] and k != key
            )
            dead = (
                isinstance(v, tuple)
                and v
                and isinstance(v[0], weakref.ref)
                and v[0]() is None
            )
            if stale_same or dead:
                del self._serving_cache[k]
        self._serving_cache[key] = entry
        # Hard cap as a backstop for callers that stream fresh LIVE
        # matrices through every call (nothing is dead to sweep then):
        # evict the oldest weakref-carrying entries beyond the cap so the
        # cache cannot pin host matrices / device tiers without bound.
        live = [
            k
            for k, v in self._serving_cache.items()
            if isinstance(v, tuple) and v and isinstance(v[0], weakref.ref)
        ]
        for k in live[: max(0, len(live) - 64)]:
            del self._serving_cache[k]
        return val

    def _pad_features_cached(self, csr):
        if self._is_identity(csr):
            # Identity matrices are rebuilt each call by
            # _construct_feature_matrices, so identity-keying would bloat
            # the cache with dead weakrefs; key by shape instead.
            key = ("pad_feats_id", csr.shape[0])
            hit = self._serving_cache.get(key)
            if hit is None:
                hit = identity_rows(csr.shape[0])
                self._serving_cache[key] = hit
            return hit
        return self._memo_by_identity("pad_feats", csr, self._pad_features)

    def _process_sample_weight(self, interactions, sample_weight):
        if sample_weight is not None:
            if self.loss == "warp-kos":
                raise NotImplementedError(
                    "k-OS loss with sample weights not implemented."
                )
            if not isinstance(sample_weight, sp.coo_matrix):
                raise ValueError("Sample_weight must be a COO matrix.")
            if sample_weight.shape != interactions.shape:
                raise ValueError(
                    "Sample weight and interactions matrices must be the same shape"
                )
            if not (
                np.array_equal(interactions.row, sample_weight.row)
                and np.array_equal(interactions.col, sample_weight.col)
            ):
                raise ValueError(
                    "Sample weight and interaction matrix "
                    "entries must be in the same order"
                )
            if sample_weight.data.dtype != CYTHON_DTYPE:
                return sample_weight.data.astype(CYTHON_DTYPE)
            return sample_weight.data
        if np.array_equiv(interactions.data, 1.0):
            return interactions.data
        return np.ones_like(interactions.data, dtype=CYTHON_DTYPE)

    def _check_finite(self):
        state = self._state
        for parameter in (state.item_table, state.user_table):
            if not np.isfinite(float(jnp.sum(parameter))):
                raise ValueError(
                    "Not all estimated parameters are finite,"
                    " your model may have diverged. Try decreasing"
                    " the learning rate or normalising feature values"
                    " and sample weights"
                )

    def _check_input_finite(self, data):
        if not np.isfinite(np.sum(data)):
            raise ValueError(
                "Not all input values are finite. "
                "Check the input for NaNs and infinite values."
            )

    @staticmethod
    def _progress(n, verbose):
        if not verbose:
            return range(n)
        try:
            from tqdm import trange

            return trange(n, desc="Epoch")
        except ImportError:

            def verbose_range():
                for i in range(n):
                    print("Epoch {}".format(i))
                    yield i

            return verbose_range()

    # ------------------------------------------------------------------
    # Fitting
    # ------------------------------------------------------------------

    def fit(
        self,
        interactions,
        user_features=None,
        item_features=None,
        sample_weight=None,
        epochs=1,
        num_threads=1,
        verbose=False,
        checkpoint_every_n_epochs=None,
        checkpoint_path=None,
    ):
        """Fit the model, discarding any previously learned state."""
        self._reset_state()
        return self.fit_partial(
            interactions,
            user_features=user_features,
            item_features=item_features,
            sample_weight=sample_weight,
            epochs=epochs,
            num_threads=num_threads,
            verbose=verbose,
            checkpoint_every_n_epochs=checkpoint_every_n_epochs,
            checkpoint_path=checkpoint_path,
        )

    def fit_partial(
        self,
        interactions,
        user_features=None,
        item_features=None,
        sample_weight=None,
        epochs=1,
        num_threads=1,
        verbose=False,
        checkpoint_every_n_epochs=None,
        checkpoint_path=None,
    ):
        """Fit the model, resuming from the current state if already fitted.

        ``checkpoint_every_n_epochs``/``checkpoint_path``: when set, the
        model is atomically checkpointed (``checkpoint.save_model`` to a
        temp file + rename) every N epochs and at fit end.  A killed run
        resumes bit-exactly: ``load_model(path)`` restores the state,
        optimizer accumulators AND the numpy RandomState at the chunk
        boundary, so ``fit_partial`` for the remaining epochs (same
        checkpoint cadence) replays the identical seed stream an
        uninterrupted run would have used.  (The reference has no mid-fit
        checkpointing; its pickle round-trip — tests/test_movielens.py:
        387-398 — is the save/load format this extends.)
        """
        if checkpoint_every_n_epochs is not None:
            if int(checkpoint_every_n_epochs) < 1:
                raise ValueError("checkpoint_every_n_epochs must be >= 1")
            if not checkpoint_path:
                raise ValueError(
                    "checkpoint_path is required when "
                    "checkpoint_every_n_epochs is set"
                )
        # Fold pending in-place edits of handed-out state views into the
        # device state so a warm re-fit resumes from what the user sees.
        self._sync_mirrors()
        interactions = interactions.tocoo()
        if interactions.dtype != CYTHON_DTYPE:
            interactions.data = interactions.data.astype(CYTHON_DTYPE)

        sample_weight_data = self._process_sample_weight(interactions, sample_weight)

        n_users, n_items = interactions.shape
        (user_features, item_features) = self._construct_feature_matrices(
            n_users, n_items, user_features, item_features
        )

        for input_data in (
            user_features.data,
            item_features.data,
            interactions.data,
            sample_weight_data,
        ):
            self._check_input_finite(input_data)

        if self._state is None:
            self._state = init_state(
                self.no_components,
                item_features.shape[1],
                user_features.shape[1],
                self.random_state,
                adagrad=(self.learning_schedule == "adagrad"),
            )
        # Remembered for serving defaults (recommend's catalog size).
        self.n_users_, self.n_items_ = n_users, n_items
        self._item_features_used = not self._is_identity(item_features)
        self._user_features_used = not self._is_identity(user_features)

        if not item_features.shape[1] == self._state.item_table.shape[0]:
            raise ValueError("Incorrect number of features in item_features")
        if not user_features.shape[1] == self._state.user_table.shape[0]:
            raise ValueError("Incorrect number of features in user_features")
        if num_threads < 1:
            raise ValueError("Number of threads must be 1 or larger.")

        from lightfm_tpu.fast_warp import apply_env_overrides

        hp = apply_env_overrides(
            self._hp(
                bpr_tries=(
                    self._bpr_tries_for(interactions)
                    if self.loss == "bpr"
                    else 8
                )
            )
        )
        batch_size = choose_batch_size(len(interactions.data), self.batch_size)
        data = build_train_data(
            interactions,
            np.asarray(sample_weight_data),
            self._pad_features(user_features),
            self._pad_features(item_features),
            hp,
            batch_size,
        )

        table_partition = self._resolve_table_partition()
        if self.mesh is not None:
            from lightfm_tpu.parallel import shard_state, shard_train_data

            self._state = shard_state(self._state, self.mesh, table_partition)
            data = shard_train_data(data, self.mesh, self.shard_examples)

        from lightfm_tpu.fast_warp import fast_warp_eligible

        fast = fast_warp_eligible(
            hp, data, self.mesh, self.example_shuffle, batch_size,
            table_partition=table_partition,
            shard_examples=self.shard_examples,
        )
        if fast and hp.loss in ("warp", "bpr"):
            # Hybrid aggregated update: stage the TRANSPOSED feature lists
            # so feature-table updates run scatter-free
            # (fast_warp._aggregated_feature_update); None for identity
            # sides or when the dense per-step streams would outgrow the
            # batch-proportional budget.
            data = data._replace(
                user_feats_T=self._transposed_features(
                    user_features, data.user_feats, batch_size,
                    hp.fast_precision,
                ),
                item_feats_T=self._transposed_features(
                    item_features, data.item_feats, batch_size,
                    hp.fast_precision,
                ),
            )

        # Staged device-resident training set, exposed so callers (warm
        # re-fits, benchmarks) can re-dispatch epochs without re-paying host
        # prep + upload.  Overwritten every fit_partial.
        self._staged_train_data = data
        self._staged_hp = hp
        self._staged_batch_size = batch_size
        self._staged_fast = fast

        from lightfm_tpu.observability import FitStats

        stats = FitStats(n_examples=len(interactions.data), epochs=epochs)

        if checkpoint_every_n_epochs is not None:
            # Chunked dispatch with a checkpoint at every chunk boundary.
            # Seeds are drawn PER CHUNK (not all upfront): the checkpoint
            # stores the RandomState at the boundary, so a resumed run's
            # remaining chunks draw exactly the seeds an uninterrupted
            # chunked run would have drawn — kill-and-resume reproduces
            # the uninterrupted trajectory bit-for-bit.
            # NOTE: a ragged final chunk (epochs % N != 0) compiles a
            # second multi-epoch executable for its smaller seed shape
            # (one-time, persisted by the compilation cache); a divisible
            # cadence avoids it.  verbose=True dispatches per epoch inside
            # each chunk, keeping the per-epoch progress/finite checks of
            # the non-checkpointed verbose path.
            n_chunk = int(checkpoint_every_n_epochs)
            progress = (
                iter(self._progress(epochs, verbose=verbose))
                if verbose
                else None
            )
            done = 0
            while done < epochs:
                n = min(n_chunk, epochs - done)
                seeds = self.random_state.randint(
                    0, np.iinfo(np.int32).max, size=n
                ).astype(np.uint32)
                if verbose:
                    for i in range(n):
                        next(progress, None)
                        key = jax.random.key(int(seeds[i]))
                        self._state = run_epoch(
                            self._state, data, key, hp, batch_size,
                            mesh=self.mesh, shuffle=self.example_shuffle,
                            fast=fast,
                        )
                        self._check_finite()
                else:
                    self._state = run_epochs(
                        self._state, data, jnp.asarray(seeds), hp,
                        batch_size, mesh=self.mesh,
                        shuffle=self.example_shuffle, fast=fast,
                    )
                    self._check_finite()
                done += n
                self._save_checkpoint(checkpoint_path)
            self.fit_stats_ = stats.finish()
            self._drop_mirrors()
            self._drop_state_dependent_cache()
            return self

        # All device randomness is rooted in the numpy RandomState so that
        # seeded runs reproduce and the RNG advances across epochs (the
        # reference's `test_random_state_fixing` contract): one seed drawn
        # per epoch regardless of dispatch granularity.
        seeds = self.random_state.randint(
            0, np.iinfo(np.int32).max, size=epochs
        ).astype(np.uint32)

        if verbose:
            # Per-epoch dispatch so progress/finite checks track epochs,
            # exactly like the reference's epoch loop (lightfm.py:654-664).
            for i in self._progress(epochs, verbose=verbose):
                key = jax.random.key(int(seeds[i]))
                self._state = run_epoch(
                    self._state, data, key, hp, batch_size, mesh=self.mesh,
                    shuffle=self.example_shuffle, fast=fast,
                )
                self._check_finite()
        elif epochs > 0:
            # Whole fit in ONE dispatch: epochs scanned on device; divergence
            # (`_check_finite`, lightfm.py:447-464) still raises from fit.
            self._state = run_epochs(
                self._state, data, jnp.asarray(seeds), hp, batch_size, mesh=self.mesh,
                shuffle=self.example_shuffle, fast=fast,
            )
            self._check_finite()

        # Throughput counter (the _check_finite sync makes wall time honest).
        self.fit_stats_ = stats.finish()
        # Training moved the device state; outstanding host mirrors (and any
        # views of them) are snapshots of the PRE-fit state and must not
        # sync back over the new tables.
        self._drop_mirrors()
        # The identity-keyed host prep stays valid across fits — the
        # per-epoch `fit_partial(1); metrics()` loop hits it every epoch.
        self._drop_state_dependent_cache()
        return self

    # ------------------------------------------------------------------
    # Prediction
    # ------------------------------------------------------------------

    def predict(
        self, user_ids, item_ids, item_features=None, user_features=None, num_threads=1
    ):
        """Compute the recommendation score for user-item pairs."""
        self._check_initialized()

        if isinstance(user_ids, int) or (
            isinstance(user_ids, np.integer) and np.ndim(user_ids) == 0
        ):
            user_ids = np.repeat(np.int32(user_ids), len(item_ids))
        if isinstance(user_ids, (list, tuple)):
            user_ids = np.array(user_ids, dtype=np.int32)
        if isinstance(item_ids, (list, tuple)):
            item_ids = np.array(item_ids, dtype=np.int32)

        if len(user_ids) != len(item_ids):
            raise ValueError(
                f"Expected the number of user IDs ({len(user_ids)}) to equal the number"
                f" of item IDs ({len(item_ids)})"
            )

        if user_ids.dtype != np.int32:
            user_ids = user_ids.astype(np.int32)
        if item_ids.dtype != np.int32:
            item_ids = item_ids.astype(np.int32)

        if num_threads < 1:
            raise ValueError("Number of threads must be 1 or larger.")

        if len(user_ids) and (user_ids.min() < 0 or item_ids.min() < 0):
            raise ValueError(
                "User or item ids cannot be negative. "
                "Check your inputs for negative numbers "
                "or very large numbers that can overflow."
            )

        n_users = user_ids.max() + 1
        n_items = item_ids.max() + 1

        (user_features, item_features) = self._construct_feature_matrices(
            n_users, n_items, user_features, item_features
        )

        scores = _predict_pairs_jit(
            self._state,
            self._pad_features_cached(user_features),
            self._pad_features_cached(item_features),
            jnp.asarray(user_ids),
            jnp.asarray(item_ids),
        )
        return np.asarray(scores, dtype=np.float32)

    def _check_test_train_intersections(self, test_mat, train_mat):
        if train_mat is not None:
            n_intersections = test_mat.multiply(train_mat).nnz
            if n_intersections:
                raise ValueError(
                    "Test interactions matrix and train interactions "
                    "matrix share %d interactions. This will cause "
                    "incorrect evaluation, check your data split." % n_intersections
                )

    def predict_rank(
        self,
        test_interactions,
        train_interactions=None,
        item_features=None,
        user_features=None,
        num_threads=1,
        check_intersections=True,
    ):
        """Rank of every non-zero test interaction among all items.

        Returns a scipy CSR with the same sparsity as ``test_interactions``
        whose data holds 0-based ranks, excluding train positives — matching
        the reference ``predict_rank`` (`lightfm/lightfm.py:884-989`) and its
        native kernel's pessimistic `>=` tie handling (template:1318).
        Computed on-device as blocked dense user x catalog scoring on the MXU.
        """
        self._check_initialized()

        if num_threads < 1:
            raise ValueError("Number of threads must be 1 or larger.")

        if check_intersections:
            self._check_test_train_intersections(test_interactions, train_interactions)

        n_users, n_items = test_interactions.shape

        (user_features, item_features) = self._construct_feature_matrices(
            n_users, n_items, user_features, item_features
        )

        if not item_features.shape[1] == self._state.item_table.shape[0]:
            raise ValueError("Incorrect number of features in item_features")
        if not user_features.shape[1] == self._state.user_table.shape[0]:
            raise ValueError("Incorrect number of features in user_features")

        # Identity-keyed memoization keeps the converted CSRs stable across
        # the per-epoch metric loop, so the downstream tier prep (also
        # identity-keyed, in ops.ranking) hits its cache too.
        test_interactions = self._memo_by_identity(
            "test_csr",
            test_interactions,
            lambda m: m.tocsr().astype(CYTHON_DTYPE, copy=False),
        )
        if train_interactions is None:
            train_interactions = self._serving_cache.setdefault(
                ("empty_train", n_users, n_items),
                sp.csr_matrix((n_users, n_items), dtype=CYTHON_DTYPE),
            )
        else:
            train_interactions = self._memo_by_identity(
                "train_csr", train_interactions, lambda m: m.tocsr()
            )

        ranks_data = predict_ranks_padded(
            self._state,
            self._pad_features_cached(user_features),
            self._pad_features_cached(item_features),
            test_interactions,
            train_interactions,
            cache=self._serving_cache,
        )

        return sp.csr_matrix(
            (ranks_data, test_interactions.indices, test_interactions.indptr),
            shape=test_interactions.shape,
        )

    def recommend(
        self,
        user_ids,
        k=10,
        item_features=None,
        user_features=None,
        train_interactions=None,
        n_items=None,
        mode="auto",
        rerank_mult=4,
    ):
        """Top-k item recommendations for a batch of users.

        The serving path the reference delegates to external ANN libraries
        (`examples/ann/annoy_nsmlib_example.ipynb`); here it's dense MXU
        catalog scoring with four top-k strategies:

        - ``"exact"``: full ``lax.top_k`` (exact, slow for huge catalogs);
        - ``"approx"``: TPU-native ``approx_max_k`` + exact rerank of 2k
          candidates (recall ~0.99, ~500x faster at 100k+ item catalogs);
        - ``"compressed"``: int8-quantized coarse scoring + exact f32 rerank
          (ANN-style; halves catalog HBM traffic on top of approx);
        - ``"auto"`` (default): exact below 16384 items, approx above.

        ``train_interactions`` (any scipy sparse) excludes known positives.
        Returns ``(scores [B, k], item_ids [B, k])`` numpy arrays.
        """
        self._check_initialized()
        from lightfm_tpu import retrieval

        user_ids = np.atleast_1d(np.asarray(user_ids, dtype=np.int32))
        if n_items is None:
            if item_features is not None:
                n_items = item_features.shape[0]
            elif train_interactions is not None:
                n_items = train_interactions.shape[1]
            elif getattr(self, "n_items_", None) is not None:
                n_items = self.n_items_
            else:
                n_items = self._state.item_table.shape[0]
        if item_features is None and getattr(self, "_item_features_used", False):
            raise ValueError(
                "This model was fitted with item_features; recommend() needs "
                "the same item_features to build catalog representations."
            )
        if user_features is None and getattr(self, "_user_features_used", False):
            raise ValueError(
                "This model was fitted with user_features; recommend() needs "
                "the same user_features to build user representations."
            )
        n_users = int(user_ids.max()) + 1 if len(user_ids) else 1

        (user_features, item_features) = self._construct_feature_matrices(
            n_users, n_items, user_features, item_features
        )
        user_feats = self._pad_features_cached(user_features)
        item_feats = self._pad_features_cached(item_features)

        exclude_idx = None
        if train_interactions is not None:
            tr = train_interactions.tocsr()
            lengths = np.diff(tr.indptr)
            sel_lengths = lengths[user_ids]
            P = max(1, int(sel_lengths.max()) if len(sel_lengths) else 1)
            # Sentinel > any padded catalog width so masked scatters drop.
            exclude = np.full((len(user_ids), P), np.iinfo(np.int32).max, np.int32)
            # Vectorised ragged fill over the selected users' rows.
            nnz_sel = int(sel_lengths.sum())
            if nnz_sel:
                row_of = np.repeat(np.arange(len(user_ids)), sel_lengths)
                pos = np.arange(nnz_sel) - np.repeat(
                    np.cumsum(sel_lengths) - sel_lengths, sel_lengths
                )
                flat = np.repeat(tr.indptr[user_ids], sel_lengths) + pos
                exclude[row_of, pos] = tr.indices[flat]
            exclude_idx = jnp.asarray(exclude)

        uid = jnp.asarray(user_ids)
        k = min(int(k), int(n_items))  # never return catalog padding
        if mode == "auto":
            mode = "exact" if n_items <= 16384 else "approx"
        # Cache catalog structures across calls for the identity-features
        # serving case (invalidated whenever model state changes).
        cacheable = item_features is None or self._is_identity(item_features)
        if mode == "compressed":
            index = self._serving_cache.get(("index", n_items)) if cacheable else None
            if index is None:
                index = retrieval.build_compressed_index(
                    self._state, item_feats, n_items
                )
                if cacheable:
                    self._serving_cache[("index", n_items)] = index
            scores, ids = retrieval.top_k_compressed(
                self._state, user_feats, index, uid, k,
                exclude_idx=exclude_idx, rerank_mult=rerank_mult,
            )
        elif mode in ("exact", "approx"):
            if self.mesh is not None:
                scores, ids = retrieval.top_k_sharded(
                    self._state, user_feats, item_feats, uid, k, n_items,
                    self.mesh, exclude_idx=exclude_idx, method=mode,
                )
            else:
                catalog = (
                    self._serving_cache.get(("catalog", n_items))
                    if cacheable
                    else None
                )
                if catalog is None and cacheable:
                    # Streaming-size catalogs must be padded to the tile
                    # multiple or top_k rejects (and rebuilds) the cache.
                    multiple = (
                        131_072
                        if n_items > retrieval.STREAMING_CATALOG_LIMIT
                        else 128
                    )
                    catalog = retrieval.build_catalog(
                        self._state, item_feats, n_items, multiple=multiple
                    )
                    self._serving_cache[("catalog", n_items)] = catalog
                scores, ids = retrieval.top_k(
                    self._state, user_feats, item_feats, uid, k, n_items,
                    exclude_idx=exclude_idx, method=mode, catalog=catalog,
                )
        else:
            raise ValueError(f"Unknown retrieval mode: {mode!r}")
        return np.asarray(scores), np.asarray(ids)

    # ------------------------------------------------------------------
    # Representations / params (lightfm.py:991-1107)
    # ------------------------------------------------------------------

    def get_item_representations(self, features=None):
        self._check_initialized()
        if features is None:
            return self.item_biases, self.item_embeddings
        features = sp.csr_matrix(features, dtype=CYTHON_DTYPE)
        return features * self.item_biases, features * self.item_embeddings

    def get_user_representations(self, features=None):
        self._check_initialized()
        if features is None:
            return self.user_biases, self.user_embeddings
        features = sp.csr_matrix(features, dtype=CYTHON_DTYPE)
        return features * self.user_biases, features * self.user_embeddings

    def get_params(self, deep=True):
        return {
            "loss": self.loss,
            "learning_schedule": self.learning_schedule,
            "no_components": self.no_components,
            "learning_rate": self.learning_rate,
            "k": self.k,
            "n": self.n,
            "rho": self.rho,
            "epsilon": self.epsilon,
            "max_sampled": self.max_sampled,
            "item_alpha": self.item_alpha,
            "user_alpha": self.user_alpha,
            "random_state": self.random_state,
            "batch_size": self.batch_size,
            "mesh": self.mesh,
            "table_partition": self.table_partition,
            "shard_examples": self.shard_examples,
            "example_shuffle": getattr(self, "example_shuffle", "global"),
            "fast_path": getattr(self, "fast_path", "auto"),
            "pool_kernels": getattr(self, "pool_kernels", "auto"),
            "user_pallas": getattr(self, "user_pallas", True),
            "fast_precision": getattr(self, "fast_precision", "highest"),
            "shuffle_mode": getattr(self, "shuffle_mode", "feistel"),
        }

    def __sklearn_tags__(self):
        # sklearn >= 1.6 estimator-tags protocol; enables clone()/CV search.
        from sklearn.base import BaseEstimator

        tags = BaseEstimator.__sklearn_tags__(self)
        tags.input_tags.sparse = True
        tags.requires_fit = True
        return tags

    def set_params(self, **params):
        valid_params = self.get_params()
        for key, value in params.items():
            if key not in valid_params:
                raise ValueError(
                    "Invalid parameter %s for estimator %s. "
                    "Check the list of available parameters "
                    "with `estimator.get_params().keys()`."
                    % (key, self.__class__.__name__)
                )
            setattr(self, key, value)
        return self

    # ------------------------------------------------------------------
    # Pickling: store numpy arrays, not device buffers.
    # ------------------------------------------------------------------

    def __getstate__(self):
        self._sync_mirrors()  # pickle what the user sees, edits included
        d = dict(self.__dict__)
        d.pop("_host_mirrors", None)  # host-side caches; rebuilt on demand
        d.pop("_mirror_snaps", None)
        state = d.pop("_state")
        d.pop("mesh", None)  # device handles are not picklable
        d.pop("_serving_cache", None)  # rebuildable device buffers
        # Staged device-resident training set: rebuildable, not picklable.
        d.pop("_staged_train_data", None)
        d.pop("_staged_hp", None)
        d.pop("_staged_batch_size", None)
        d.pop("_staged_fast", None)
        if state is None:
            d["_state_np"] = None
        else:
            # Keyed by field name so pickles survive ModelState layout
            # changes (a positional restore silently misassigns fields).
            d["_state_np"] = {
                name: np.asarray(x) for name, x in zip(ModelState._fields, state)
            }
        return d

    def __setstate__(self, d):
        state_np = d.pop("_state_np", None)
        self.__dict__.update(d)
        self.__dict__.setdefault("mesh", None)
        self.__dict__.setdefault("example_shuffle", "global")
        # Fast-path knobs added in 0.4.0; older pickles predate them.
        # fast_precision migrates to "highest" (not the 0.4.0 "default"):
        # pre-0.4.0 models trained under the old import-time default, so
        # resuming one keeps its numerics.
        self.__dict__.setdefault("fast_path", "auto")
        self.__dict__.setdefault("pool_kernels", "auto")
        self.__dict__.setdefault("user_pallas", True)
        self.__dict__.setdefault("fast_precision", "highest")
        self.__dict__.setdefault("shuffle_mode", "feistel")
        self.__dict__.setdefault("_serving_cache", {})
        self.__dict__["_host_mirrors"] = {}
        self.__dict__["_mirror_snaps"] = {}
        if state_np is None:
            self._state = None
            return
        if isinstance(state_np, list):
            # Legacy positional pickle (pre log-space scales): six arrays
            # followed by two LINEAR scale scalars.
            arrays, scales = state_np[:6], state_np[6:]
            state_np = dict(zip(ModelState._fields[:6], arrays))
            state_np["item_log_scale"] = np.log(
                np.asarray(scales[0] if scales else 1.0, np.float32)
            )
            state_np["user_log_scale"] = np.log(
                np.asarray(scales[1] if len(scales) > 1 else 1.0, np.float32)
            )
        if isinstance(state_np, dict):
            missing = [n for n in ModelState._fields if n not in state_np]
            if missing:
                raise ValueError(
                    f"Pickled model state is missing fields {missing}; it may "
                    "come from an incompatible version."
                )
            self._state = ModelState(
                **{k: jnp.asarray(state_np[k]) for k in ModelState._fields}
            )


def _make_state_property(name):
    def getter(self):
        return self._get_field(name)

    def setter(self, value):
        self._set_field(name, value)

    return property(getter, setter)


for _f in _FIELD_MAP:
    setattr(LightFM, _f, _make_state_property(_f))
