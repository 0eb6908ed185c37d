"""Dataset construction utilities (mirrors ``lightfm/data.py``).

Builds the id/feature-name ↔ internal-index mappings and the COO interaction
/ CSR feature matrices the model consumes.  Insertion-ordered dict mapping
semantics match the reference exactly (setdefault ordering, `data.py:229-257`)
so externally-visible index assignment is identical.
"""

from __future__ import annotations

import array

import numpy as np
import scipy.sparse as sp

__all__ = ["Dataset"]


class _IncrementalCOOMatrix:
    """Append-only COO builder over compact typed arrays (`data.py:10-52`)."""

    def __init__(self, shape, dtype):
        if dtype is np.int32:
            type_flag = "i"
        elif dtype is np.int64:
            type_flag = "l"
        elif dtype is np.float32:
            type_flag = "f"
        elif dtype is np.float64:
            type_flag = "d"
        else:
            raise Exception("Dtype not supported.")

        self.shape = shape
        self.dtype = dtype
        self.rows = array.array("i")
        self.cols = array.array("i")
        self.data = array.array(type_flag)

    def append(self, i, j, v):
        m, n = self.shape
        if i >= m or j >= n:
            raise Exception("Index out of bounds")
        self.rows.append(i)
        self.cols.append(j)
        self.data.append(v)

    def tocoo(self):
        rows = np.frombuffer(self.rows, dtype=np.int32)
        cols = np.frombuffer(self.cols, dtype=np.int32)
        data = np.frombuffer(self.data, dtype=self.dtype)
        return sp.coo_matrix((data, (rows, cols)), shape=self.shape)

    def __len__(self):
        return len(self.data)


class _FeatureBuilder:
    """Assembles an entity x feature CSR with optional identity block and
    L1 row normalisation (`data.py:55-133`)."""

    def __init__(self, id_mapping, feature_mapping, identity_features, normalize, entity_type):
        self._id_mapping = id_mapping
        self._feature_mapping = feature_mapping
        self._identity_features = identity_features
        self._normalize = normalize
        self._entity_type = entity_type

    def features_shape(self):
        return len(self._id_mapping), len(self._feature_mapping)

    def _iter_features(self, features):
        if isinstance(features, dict):
            yield from features.items()
        else:
            for feature_name in features:
                yield (feature_name, 1.0)

    def _process_features(self, datum):
        if len(datum) != 2:
            raise ValueError(
                "Expected tuples of ({}_id, features), "
                "got {}.".format(self._entity_type, datum)
            )

        entity_id, features = datum

        if entity_id not in self._id_mapping:
            raise ValueError(
                "{entity_type} id {entity_id} not in {entity_type} id mappings.".format(
                    entity_type=self._entity_type, entity_id=entity_id
                )
            )

        idx = self._id_mapping[entity_id]

        for feature, weight in self._iter_features(features):
            if feature not in self._feature_mapping:
                raise ValueError(
                    "Feature {} not in feature mapping. Call fit first.".format(feature)
                )
            yield (idx, self._feature_mapping[feature], weight)

    def _build_arrays(self, entity_ids, feature_ids, weights):
        """Vectorised build from numpy id arrays via the native engine."""
        from lightfm_tpu import native

        def keys_i64(mapping):
            try:
                return np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
            except (TypeError, ValueError, OverflowError):
                return None

        ekeys = keys_i64(self._id_mapping)
        fkeys = keys_i64(self._feature_mapping)
        if ekeys is None or fkeys is None or not native.AVAILABLE:
            if weights is None:
                it = ((e, [f]) for e, f in zip(entity_ids, feature_ids))
            else:
                it = (
                    (e, {f: w})
                    for e, f, w in zip(entity_ids, feature_ids, weights)
                )
            return self.build(it)

        eidx = native.lookup_ids(ekeys, np.asarray(entity_ids, dtype=np.int64))
        fidx = native.lookup_ids(fkeys, np.asarray(feature_ids, dtype=np.int64))
        if (eidx < 0).any():
            bad = np.asarray(entity_ids)[eidx < 0][0]
            raise ValueError(
                "{entity_type} id {entity_id} not in {entity_type} id mappings.".format(
                    entity_type=self._entity_type, entity_id=bad
                )
            )
        if (fidx < 0).any():
            bad = np.asarray(feature_ids)[fidx < 0][0]
            raise ValueError(
                "Feature {} not in feature mapping. Call fit first.".format(bad)
            )
        w = (
            np.ones(len(eidx), dtype=np.float32)
            if weights is None
            else np.asarray(weights, dtype=np.float32)
        )

        rows, cols, vals = [eidx], [fidx], [w]
        if self._identity_features:
            id_rows = np.fromiter(
                self._id_mapping.values(), dtype=np.int32, count=len(self._id_mapping)
            )
            id_cols = np.array(
                [self._feature_mapping[k] for k in self._id_mapping], dtype=np.int32
            )
            rows.insert(0, id_rows)
            cols.insert(0, id_cols)
            vals.insert(0, np.ones(len(id_rows), dtype=np.float32))
        mat = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=self.features_shape(),
        ).tocsr()
        return self._normalized(mat)

    def _normalized(self, features):
        if self._normalize:
            if np.any(features.getnnz(1) == 0):
                raise ValueError(
                    "Cannot normalize feature matrix: some rows have zero norm. "
                    "Ensure that features were provided for all entries."
                )
            row_sums = np.abs(features).sum(axis=1).A.ravel()
            scale = np.repeat(1.0 / row_sums, np.diff(features.indptr))
            features.data = (features.data * scale).astype(np.float32)
        return features

    def build(self, data):
        if (
            isinstance(data, tuple)
            and len(data) in (2, 3)
            and all(isinstance(a, np.ndarray) for a in data)
        ):
            return self._build_arrays(
                data[0], data[1], data[2] if len(data) == 3 else None
            )

        features = _IncrementalCOOMatrix(self.features_shape(), np.float32)

        if self._identity_features:
            for _id, idx in self._id_mapping.items():
                features.append(idx, self._feature_mapping[_id], 1.0)

        for datum in data:
            for entity_idx, feature_idx, weight in self._process_features(datum):
                features.append(entity_idx, feature_idx, weight)

        return self._normalized(features.tocoo().tocsr())


class Dataset:
    """Tool for building interaction and feature matrices, managing the
    mapping between external ids / feature names and internal indices
    (`data.py:136-449`)."""

    def __init__(self, user_identity_features=True, item_identity_features=True):
        self._user_identity_features = user_identity_features
        self._item_identity_features = item_identity_features

        self._user_id_mapping = {}
        self._item_id_mapping = {}
        self._user_feature_mapping = {}
        self._item_feature_mapping = {}

    def _check_fitted(self):
        if not self._user_id_mapping or not self._item_id_mapping:
            raise ValueError(
                "You must call fit first to build the item and user id mappings."
            )

    def fit(self, users, items, user_features=None, item_features=None):
        """Fit the user/item id and feature name mappings, resetting existing ones."""
        self._user_id_mapping = {}
        self._item_id_mapping = {}
        self._user_feature_mapping = {}
        self._item_feature_mapping = {}

        return self.fit_partial(users, items, user_features, item_features)

    @staticmethod
    def _extend_mapping_fast(mapping, ids) -> bool:
        """Extend ``mapping`` with numpy integer ``ids`` via the native
        ingest engine (first-seen order, identical to setdefault).  Returns
        False when the fast path does not apply (non-int ids, mixed-type
        mapping, or no native library)."""
        from lightfm_tpu import native

        if not native.AVAILABLE:
            return False
        if not (isinstance(ids, np.ndarray) and ids.dtype.kind in "iu"):
            return False
        if mapping:
            # Existing keys must all be Python/numpy ints for a faithful merge.
            try:
                existing = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
            except (TypeError, ValueError, OverflowError):
                return False
        else:
            existing = np.empty(0, dtype=np.int64)
        new = native.map_ids(existing, ids.astype(np.int64, copy=False))
        base = len(mapping)
        mapping.update(
            zip(new.tolist(), range(base, base + len(new)))
        )
        return True

    def fit_partial(self, users=None, items=None, user_features=None, item_features=None):
        """Add new entries to the existing mappings.

        Numpy integer-array inputs take the native C++ ingest path
        (lightfm_tpu/native/ingest.cpp — ~40x faster than the per-element
        dict loop at 10M rows); arbitrary hashables use the reference's
        setdefault semantics (`lightfm/data.py:229-257`).
        """
        if users is not None:
            if self._extend_mapping_fast(self._user_id_mapping, users):
                if self._user_identity_features and not self._extend_mapping_fast(
                    self._user_feature_mapping, users
                ):
                    # Feature mapping holds non-int keys: fall back for it.
                    for user_id in users:
                        self._user_feature_mapping.setdefault(
                            user_id, len(self._user_feature_mapping)
                        )
            else:
                for user_id in users:
                    self._user_id_mapping.setdefault(user_id, len(self._user_id_mapping))
                    if self._user_identity_features:
                        self._user_feature_mapping.setdefault(
                            user_id, len(self._user_feature_mapping)
                        )

        if items is not None:
            if self._extend_mapping_fast(self._item_id_mapping, items):
                if self._item_identity_features and not self._extend_mapping_fast(
                    self._item_feature_mapping, items
                ):
                    for item_id in items:
                        self._item_feature_mapping.setdefault(
                            item_id, len(self._item_feature_mapping)
                        )
            else:
                for item_id in items:
                    self._item_id_mapping.setdefault(item_id, len(self._item_id_mapping))
                    if self._item_identity_features:
                        self._item_feature_mapping.setdefault(
                            item_id, len(self._item_feature_mapping)
                        )

        if user_features is not None:
            for user_feature in user_features:
                self._user_feature_mapping.setdefault(
                    user_feature, len(self._user_feature_mapping)
                )

        if item_features is not None:
            for item_feature in item_features:
                self._item_feature_mapping.setdefault(
                    item_feature, len(self._item_feature_mapping)
                )

    def _unpack_datum(self, datum):
        if len(datum) == 3:
            (user_id, item_id, weight) = datum
        elif len(datum) == 2:
            (user_id, item_id) = datum
            weight = 1.0
        else:
            raise ValueError(
                "Expecting tuples of (user_id, item_id, weight) "
                "or (user_id, item_id). Got {}".format(datum)
            )

        user_idx = self._user_id_mapping.get(user_id)
        item_idx = self._item_id_mapping.get(item_id)

        if user_idx is None:
            raise ValueError(
                "User id {} not in user id mapping. Make sure "
                "you call the fit method.".format(user_id)
            )
        if item_idx is None:
            raise ValueError(
                "Item id {} not in item id mapping. Make sure "
                "you call the fit method.".format(item_id)
            )

        return (user_idx, item_idx, weight)

    def interactions_shape(self):
        """(num users, num items)."""
        return (len(self._user_id_mapping), len(self._item_id_mapping))

    def _mapping_keys_i64(self, mapping):
        try:
            return np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
        except (TypeError, ValueError, OverflowError):
            return None

    def _build_interactions_arrays(self, user_ids, item_ids, weights):
        """Native vectorized variant of build_interactions for numpy arrays."""
        from lightfm_tpu import native

        ukeys = self._mapping_keys_i64(self._user_id_mapping)
        ikeys = self._mapping_keys_i64(self._item_id_mapping)
        if ukeys is None or ikeys is None or not native.AVAILABLE:
            # Fall back to the tuple path.
            it = (
                zip(user_ids, item_ids)
                if weights is None
                else zip(user_ids, item_ids, weights)
            )
            return self.build_interactions(it)

        uidx = native.lookup_ids(ukeys, np.asarray(user_ids, dtype=np.int64))
        iidx = native.lookup_ids(ikeys, np.asarray(item_ids, dtype=np.int64))
        if (uidx < 0).any():
            bad = np.asarray(user_ids)[uidx < 0][0]
            raise ValueError(
                "User id {} not in user id mapping. Make sure "
                "you call the fit method.".format(bad)
            )
        if (iidx < 0).any():
            bad = np.asarray(item_ids)[iidx < 0][0]
            raise ValueError(
                "Item id {} not in item id mapping. Make sure "
                "you call the fit method.".format(bad)
            )
        w = (
            np.ones(len(uidx), dtype=np.float32)
            if weights is None
            else np.asarray(weights, dtype=np.float32)
        )
        shape = self.interactions_shape()
        interactions = sp.coo_matrix(
            (np.ones(len(uidx), dtype=np.int32), (uidx, iidx)), shape=shape
        )
        weights_mat = sp.coo_matrix((w, (uidx, iidx)), shape=shape)
        return interactions, weights_mat

    def build_interactions(self, data):
        """Build (interactions, weights) COO matrices.

        ``data`` is either the reference's iterable of (user_id, item_id)
        or (user_id, item_id, weight) tuples (`lightfm/data.py:296-330`), or
        — the TPU-native fast path — a tuple of numpy arrays
        ``(user_ids, item_ids)`` / ``(user_ids, item_ids, weights)`` which
        routes through the native C++ ingest engine.
        """
        if (
            isinstance(data, tuple)
            and len(data) in (2, 3)
            and all(isinstance(a, np.ndarray) for a in data)
        ):
            return self._build_interactions_arrays(
                data[0], data[1], data[2] if len(data) == 3 else None
            )

        interactions = _IncrementalCOOMatrix(self.interactions_shape(), np.int32)
        weights = _IncrementalCOOMatrix(self.interactions_shape(), np.float32)

        for datum in data:
            user_idx, item_idx, weight = self._unpack_datum(datum)
            interactions.append(user_idx, item_idx, 1)
            weights.append(user_idx, item_idx, weight)

        return (interactions.tocoo(), weights.tocoo())

    def user_features_shape(self):
        """(num user ids, num user features)."""
        return (len(self._user_id_mapping), len(self._user_feature_mapping))

    def build_user_features(self, data, normalize=True):
        """Build a user x feature CSR from (user id, [features]) or
        (user id, {feature: weight}) tuples."""
        builder = _FeatureBuilder(
            self._user_id_mapping,
            self._user_feature_mapping,
            self._user_identity_features,
            normalize,
            "user",
        )
        return builder.build(data)

    def item_features_shape(self):
        """(num item ids, num item features)."""
        return (len(self._item_id_mapping), len(self._item_feature_mapping))

    def build_item_features(self, data, normalize=True):
        """Build an item x feature CSR from (item id, [features]) or
        (item id, {feature: weight}) tuples."""
        builder = _FeatureBuilder(
            self._item_id_mapping,
            self._item_feature_mapping,
            self._item_identity_features,
            normalize,
            "item",
        )
        return builder.build(data)

    def model_dimensions(self):
        """(num user feature embeddings, num item feature embeddings)."""
        return (len(self._user_feature_mapping), len(self._item_feature_mapping))

    def mapping(self):
        """(user id map, user feature map, item id map, item feature map)."""
        return (
            self._user_id_mapping,
            self._user_feature_mapping,
            self._item_id_mapping,
            self._item_feature_mapping,
        )
