"""Sparse-structure unit tests — the analogue of the reference's
``tests/test_fast_functions.py`` (its exported ``__test_in_positives``
bsearch helper)."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from lightfm_tpu.sparse import (
    in_positives,
    in_positives_slots,
    identity_rows,
    pad_csr,
    pad_csr_sorted,
)


def _fixture():
    mat = sp.csr_matrix(
        np.array(
            [
                [0, 1, 1, 0, 0],
                [1, 0, 0, 0, 1],
                [0, 0, 0, 0, 0],
                [1, 1, 1, 1, 1],
            ],
            dtype=np.float32,
        )
    )
    return pad_csr_sorted(mat)


def test_in_positives_matches_membership():
    rows = _fixture()
    row_ids = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    col_ids = jnp.asarray([[1, 3], [0, 1], [0, 4], [2, 4]], dtype=jnp.int32)
    got = np.asarray(in_positives(rows, row_ids, col_ids))
    want = np.array([[True, False], [True, False], [False, False], [True, True]])
    assert np.array_equal(got, want)


def test_in_positives_slots_orientation():
    rows = _fixture()
    row_ids = jnp.asarray([0, 1, 3], dtype=jnp.int32)
    # [K=2, B=3] slot-major
    col_ids = jnp.asarray([[1, 0, 2], [3, 4, 0]], dtype=jnp.int32)
    got = np.asarray(in_positives_slots(rows, row_ids, col_ids))
    want = np.array([[True, True, True], [False, True, True]])
    assert np.array_equal(got, want)


def test_in_positives_1d():
    rows = _fixture()
    got = np.asarray(
        in_positives(
            rows,
            jnp.asarray([0, 1, 2], dtype=jnp.int32),
            jnp.asarray([2, 2, 2], dtype=jnp.int32),
        )
    )
    assert got.tolist() == [True, False, False]


def test_pad_csr_roundtrip():
    rng = np.random.RandomState(0)
    mat = sp.random(13, 29, density=0.2, format="csr", dtype=np.float32, random_state=rng)
    padded = pad_csr(mat, pad_multiple=8)
    assert padded.idx.shape[1] % 8 == 0
    dense = np.zeros(mat.shape, np.float32)
    idx, wts = np.asarray(padded.idx), np.asarray(padded.wts)
    for r in range(mat.shape[0]):
        for c, w in zip(idx[r], wts[r]):
            dense[r, c] += w
    assert np.allclose(dense, mat.toarray())


def test_sentinel_padding_never_matches():
    mat = sp.csr_matrix((2, 5), dtype=np.float32)  # empty rows
    rows = pad_csr_sorted(mat)
    got = np.asarray(
        in_positives(
            rows,
            jnp.asarray([0, 1], dtype=jnp.int32),
            jnp.asarray([[0, 4], [1, 3]], dtype=jnp.int32),
        )
    )
    assert not got.any()


def test_identity_rows_shape():
    rows = identity_rows(7)
    assert rows.n_rows == 7
    assert rows.n_cols == 7
    assert rows.max_nnz == 1


def test_pad_csr_sorted_width_cap():
    rng = np.random.RandomState(0)
    # one heavy row (40 entries), others light
    rows = np.concatenate([np.zeros(40, int), [1, 2]])
    cols = np.concatenate([np.arange(40) * 2, [5, 9]])
    mat = sp.csr_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(3, 100)
    )
    capped = pad_csr_sorted(mat, pad_multiple=8, max_width=16)
    assert capped.idx.shape[1] == 16
    assert int(capped.lengths[0]) == 16  # clipped
    assert int(capped.lengths[1]) == 1
    # Kept entries are the first (sorted) 16 of the heavy row.
    assert np.asarray(capped.idx)[0, :16].tolist() == (np.arange(16) * 2).tolist()
    # Light rows keep exact membership.
    got = np.asarray(
        in_positives(
            capped,
            jnp.asarray([1, 1], dtype=jnp.int32),
            jnp.asarray([5, 6], dtype=jnp.int32),
        )
    )
    assert got.tolist() == [True, False]


class TestChunkedRows:
    """Width-capped feature padding: over-width rows spill into overflow
    chunks instead of inflating [n_rows, max_nnz] for the whole matrix."""

    def _skewed_csr(self, n_rows=64, n_cols=500, heavy_row=3, heavy_nnz=400, seed=0):
        import scipy.sparse as sp
        rng = np.random.RandomState(seed)
        rows, cols, vals = [], [], []
        for r in range(n_rows):
            nnz = heavy_nnz if r == heavy_row else rng.randint(1, 5)
            c = rng.choice(n_cols, nnz, replace=False)
            rows += [r] * nnz
            cols += list(c)
            vals += list(rng.rand(nnz).astype(np.float32) + 0.1)
        return sp.csr_matrix(
            (np.array(vals, np.float32), (rows, cols)), shape=(n_rows, n_cols)
        )

    def test_memory_stays_bounded(self):
        from lightfm_tpu.sparse import ChunkedRows, pad_csr

        csr = self._skewed_csr()
        chunked = pad_csr(csr, pad_multiple=8, width_cap=8, chunk_width=64)
        assert isinstance(chunked, ChunkedRows)
        assert chunked.base.max_nnz == 8
        # only ONE overflow record (+1 padding) regardless of n_rows
        assert chunked.over_idx.shape[1] == 2
        # and the total footprint is O(nnz), not n_rows * max_nnz
        total = chunked.base.idx.size + chunked.over_idx.shape[0] * chunked.over_idx.shape[2] * 2
        assert total < csr.shape[0] * 400 / 4

    def test_representation_matches_unchunked(self):
        import jax.numpy as jnp
        from lightfm_tpu.ops.representation import batch_representation
        from lightfm_tpu.sparse import pad_csr

        csr = self._skewed_csr()
        plain = pad_csr(csr, pad_multiple=8)
        chunked = pad_csr(csr, pad_multiple=8, width_cap=8, chunk_width=64)
        rng = np.random.RandomState(1)
        table = jnp.asarray(rng.randn(csr.shape[1], 16).astype(np.float32))
        rows = jnp.asarray(np.arange(csr.shape[0], dtype=np.int32))
        r1 = batch_representation(table, plain, rows)
        r2 = batch_representation(table, chunked, rows)
        assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)

    def test_training_matches_unchunked(self):
        # End-to-end: a fit through the chunked feature path should land at
        # the same quality as the plain padded path (overflow chunks see
        # within-batch accumulator updates, so parity is statistical).
        import scipy.sparse as sp
        from lightfm_tpu import LightFM
        from lightfm_tpu.datasets import generate_synthetic
        from lightfm_tpu.evaluation import auc_score
        from lightfm_tpu import model as model_mod
        from lightfm_tpu.sparse import pad_csr

        d = generate_synthetic(n_users=100, n_items=80, seed=5)
        train = d["train"]
        feats = self._skewed_csr(n_rows=80, n_cols=60, heavy_row=2, heavy_nnz=50)

        def fit(pad_fn):
            orig = LightFM._pad_features
            try:
                LightFM._pad_features = classmethod(
                    lambda cls, csr: pad_fn(csr)
                    if not cls._is_identity(csr)
                    else orig.__func__(cls, csr)
                )
                m = LightFM(loss="warp", no_components=8, random_state=3)
                m.fit(train, item_features=sp.csr_matrix(feats), epochs=5)
                return auc_score(m, train, item_features=sp.csr_matrix(feats)).mean()
            finally:
                LightFM._pad_features = orig

        auc_plain = fit(lambda c: pad_csr(c, pad_multiple=8))
        auc_chunk = fit(lambda c: pad_csr(c, pad_multiple=8, width_cap=8, chunk_width=16))
        # Random features cap learnability (~0.67 here for BOTH paths);
        # the contract is parity between the two paddings, plus sanity.
        assert auc_chunk > 0.6
        assert abs(auc_plain - auc_chunk) < 0.02

    def test_trim_rows(self):
        from lightfm_tpu.sparse import pad_csr, trim_rows

        csr = self._skewed_csr()
        chunked = pad_csr(csr, pad_multiple=8, width_cap=8, chunk_width=64)
        t = trim_rows(chunked, 10)
        assert t.n_rows == 10
        assert t.over_slot.shape == (10,)


def test_device_positives_match_host_padded_sorted():
    # train._positives_on_device must agree with the host pad_csr_sorted
    # path (per-row sorted unique columns, sentinel pad, clipped lengths),
    # including duplicate (row, col) entries which CSR conversion merges.
    import scipy.sparse as sp
    import jax.numpy as jnp
    from lightfm_tpu.sparse import pad_csr_sorted
    from lightfm_tpu.train import _positives_on_device

    rng = np.random.RandomState(0)
    n_users, n_items, nnz = 64, 200, 2000
    row = rng.randint(0, n_users, nnz).astype(np.int32)
    col = rng.randint(0, n_items, nnz).astype(np.int32)  # with duplicates
    csr = sp.csr_matrix(
        (np.ones(nnz, np.float32), (row, col)), shape=(n_users, n_items)
    ).sorted_indices()

    width = 8 * -(-int(np.bincount(row, minlength=n_users).max()) // 8)
    host = pad_csr_sorted(csr, pad_multiple=8)
    dev = _positives_on_device(
        jnp.asarray(row), jnp.asarray(col), n_users, n_items, width
    )
    assert np.array_equal(np.asarray(dev.lengths), np.asarray(host.lengths))
    hw = host.idx.shape[1]
    # same entries; device width may be the dup-inclusive upper bound
    assert np.array_equal(np.asarray(dev.idx)[:, :hw], np.asarray(host.idx))
    assert np.all(np.asarray(dev.idx)[:, hw:] == n_items)

    # width cap: clipped lengths and truncated rows
    capped_host = pad_csr_sorted(csr, pad_multiple=8, max_width=16)
    capped_dev = _positives_on_device(
        jnp.asarray(row), jnp.asarray(col), n_users, n_items, 16
    )
    assert np.array_equal(
        np.asarray(capped_dev.lengths), np.asarray(capped_host.lengths)
    )
    assert np.array_equal(
        np.asarray(capped_dev.idx), np.asarray(capped_host.idx)
    )
