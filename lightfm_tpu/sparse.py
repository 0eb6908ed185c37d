"""Padded sparse row structures: the TPU-native replacement for CSR pointer-chasing.

The reference (lyst/lightfm) walks scipy CSR matrices with per-row
``indptr[row] .. indptr[row+1]`` pointer arithmetic inside a nogil C loop
(``lightfm/_lightfm_fast.pyx.template:145-182``).  XLA needs static shapes, so
we re-materialise ragged rows as dense ``[n_rows, max_nnz]`` index/weight
blocks padded with zero-weight entries.  Zero-weight padding slots are exact
no-ops in every downstream computation (weighted sums, gradients, scatter
updates), so no masking is needed on the read path.

A second structure, :class:`PaddedSortedRows`, keeps each row's column
indices *sorted* and padded with an out-of-range sentinel; it supports the
vectorised membership test that replaces the reference's libc ``bsearch``
(``template:270-284``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PaddedRows(NamedTuple):
    """Fixed-shape view of a sparse row-major matrix.

    Attributes
    ----------
    idx: int32 [n_rows, max_nnz]
        Column indices per row; padding slots hold 0.
    wts: float32 [n_rows, max_nnz]
        Values per row; padding slots hold 0.0 (making them no-ops).
    n_cols: int
        Static number of columns of the original matrix.
    """

    idx: jax.Array
    wts: jax.Array
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.idx.shape[0]

    @property
    def max_nnz(self) -> int:
        return self.idx.shape[1]


class IdentityRows(NamedTuple):
    """Marker for identity feature matrices (the default / pure-MF case).

    Row i has exactly one feature, i, with weight 1 — the reference's
    implicit-identity default (`lightfm/lightfm.py:318-326`).  Keeping this a
    distinct pytree type lets compute paths skip the feature walk at trace
    time; ``marker`` only carries the static row count in its shape.
    """

    marker: jax.Array  # int8 [n_rows]; contents unused

    @property
    def n_rows(self) -> int:
        return self.marker.shape[0]

    @property
    def n_cols(self) -> int:
        return self.marker.shape[0]

    @property
    def max_nnz(self) -> int:
        return 1


class PaddedSortedRows(NamedTuple):
    """Per-row sorted indices with an out-of-range sentinel pad.

    Used for membership testing (``in_positives`` in the reference).  Rows are
    sorted ascending and padded with ``n_cols`` (greater than any valid id).
    """

    idx: jax.Array  # int32 [n_rows, max_nnz], sorted, sentinel-padded
    lengths: jax.Array  # int32 [n_rows]
    n_cols: int

    @property
    def n_rows(self) -> int:
        return self.idx.shape[0]


def pad_csr(csr, pad_multiple: int = 1, min_width: int = 1) -> PaddedRows:
    """Convert a scipy CSR matrix to :class:`PaddedRows`.

    ``pad_multiple`` rounds the padded width up (stabilises jit cache keys
    across matrices of similar raggedness).
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    n_rows, n_cols = csr.shape
    lengths = np.diff(csr.indptr)
    width = max(int(lengths.max()) if len(lengths) and lengths.max() > 0 else 1, min_width)
    width = _round_up(width, pad_multiple)

    idx = np.zeros((n_rows, width), dtype=np.int32)
    wts = np.zeros((n_rows, width), dtype=np.float32)
    # Vectorised ragged fill: flat positions of every nnz within its row.
    if csr.nnz:
        row_of = np.repeat(np.arange(n_rows), lengths)
        pos_in_row = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], lengths)
        idx[row_of, pos_in_row] = csr.indices.astype(np.int32)
        wts[row_of, pos_in_row] = csr.data.astype(np.float32)

    return PaddedRows(jnp.asarray(idx), jnp.asarray(wts), n_cols)


def identity_rows(n: int) -> IdentityRows:
    """The identity-features fast path: row i has a single feature i, weight 1."""
    return IdentityRows(jnp.zeros((n,), dtype=jnp.int8))


def pad_csr_sorted(
    csr, pad_multiple: int = 1, max_width: int | None = None
) -> PaddedSortedRows:
    """Convert a scipy CSR to sorted, sentinel-padded rows for membership tests.

    ``max_width`` caps the padded row width: rows with more entries keep only
    their first ``max_width`` (sorted) columns.  The membership test is then
    approximate for those heavy rows — used for negative-sampling REJECTION,
    where occasionally accepting a true positive as a negative is the same
    class of statistical noise the reference's Hogwild racing tolerates,
    while an uncapped width makes the [B, K, width] rejection compare
    explode on heavy-user datasets (20k-interaction users in ML-25M).
    ``lengths`` is clipped to the kept width so samplers stay in range.
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(csr)
    if not csr.has_sorted_indices:
        csr = csr.sorted_indices()
    n_rows, n_cols = csr.shape
    lengths = np.diff(csr.indptr).astype(np.int32)
    width = max(int(lengths.max()) if len(lengths) else 1, 1)
    if max_width is not None:
        width = min(width, max_width)
    width = _round_up(width, pad_multiple)

    kept = np.minimum(lengths, width)
    idx = np.full((n_rows, width), n_cols, dtype=np.int32)
    if csr.nnz:
        row_of = np.repeat(np.arange(n_rows), kept)
        pos_in_row = np.arange(int(kept.sum())) - np.repeat(
            np.cumsum(kept) - kept, kept
        )
        flat = np.repeat(csr.indptr[:-1], kept) + pos_in_row
        idx[row_of, pos_in_row] = csr.indices[flat].astype(np.int32)

    return PaddedSortedRows(jnp.asarray(idx), jnp.asarray(kept), n_cols)


def in_positives(rows: PaddedSortedRows, row_ids: jax.Array, col_ids: jax.Array) -> jax.Array:
    """Vectorised membership test: is ``col_ids[b, ...]`` in row ``row_ids[b]``?

    TPU-native replacement for the reference's per-query libc ``bsearch``
    (``_lightfm_fast.pyx.template:270-284``).  For padded row widths the VPU
    prefers a dense broadcast-compare over a batched binary search (measured
    ~100x faster on v5e for typical widths); sentinel padding never matches a
    valid column id.

    ``row_ids`` is [B]; ``col_ids`` is [B] or [B, K].  Each row's index list
    is gathered ONCE per batch element and broadcast against all K queries —
    gathering it per query measured ~11x slower.  Returns bool of
    ``col_ids``'s shape.
    """
    table = rows.idx[row_ids]  # [B, width]
    if col_ids.ndim == row_ids.ndim:
        return (table == col_ids[..., None]).any(axis=-1)
    return (table[..., None, :] == col_ids[..., None]).any(axis=-1)


def in_positives_slots(
    rows: PaddedSortedRows, row_ids: jax.Array, col_ids: jax.Array
) -> jax.Array:
    """Slot-major variant of :func:`in_positives`: ``col_ids`` is [K, B]
    (candidate slot k of batch row b), returns bool [K, B]."""
    table = rows.idx[row_ids]  # [B, width]
    return (table[None, :, :] == col_ids[:, :, None]).any(axis=-1)
