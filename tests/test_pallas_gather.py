"""Differential tests: sorted_gather_pallas vs ``table[sidx]``.

Interpret mode off-TPU; on real hardware the same cases run compiled and
additionally assert bit-exactness at precision=HIGHEST (the one-hot MXU
contraction reproduces f32 values exactly — measured property this kernel
relies on for its "exact gather" claim).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightfm_tpu.ops.pallas_gather import sorted_gather_pallas

INTERPRET = jax.default_backend() != "tpu"


def _case(R, M, W=8, seed=0, sentinels=0):
    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.randn(R, W).astype(np.float32))
    idx = np.sort(rng.randint(0, R, (M,)).astype(np.int32))
    if sentinels:
        idx[-sentinels:] = 2**30  # sorted order preserved (max value)
    return table, jnp.asarray(idx), idx


# Regimes: single padded chunk, multi-chunk, chunk spanning blocks, ragged
# last table block, table smaller than one block.
CASES = [
    (100, 10),  # one ragged chunk, tiny table
    (5000, 3000),  # multi-chunk + ragged tail chunk
    (5000, 2048),  # exact chunks, spans blocks
    (2048, 4096),  # table exactly one block, duplicates guaranteed
    (10000, 8192),  # ragged last block reached by real touches
]


@pytest.mark.parametrize("R,M", CASES)
def test_matches_xla_gather(R, M):
    table, sidx, idx = _case(R, M)
    got = np.asarray(sorted_gather_pallas(table, sidx, interpret=INTERPRET))
    want = np.asarray(table)[idx]
    if INTERPRET or jax.default_backend() == "tpu":
        np.testing.assert_array_equal(got, want)


def test_sentinel_rows_gather_zeros():
    table, sidx, idx = _case(5000, 3000, sentinels=7)
    got = np.asarray(sorted_gather_pallas(table, sidx, interpret=INTERPRET))
    np.testing.assert_array_equal(got[-7:], np.zeros((7, 8), np.float32))
    np.testing.assert_array_equal(got[:-7], np.asarray(table)[idx[:-7]])


def test_all_sentinel_chunk_is_zero():
    table, _, _ = _case(5000, 10)
    sidx = jnp.full((3000,), 2**30, jnp.int32)
    got = np.asarray(sorted_gather_pallas(table, sidx, interpret=INTERPRET))
    np.testing.assert_array_equal(got, np.zeros((3000, 8), np.float32))


def test_default_precision_close():
    table, sidx, idx = _case(5000, 3000, seed=3)
    got = np.asarray(
        sorted_gather_pallas(
            table, sidx, interpret=INTERPRET,
            precision=jax.lax.Precision.DEFAULT,
        )
    )
    want = np.asarray(table)[idx]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_nonstandard_tiling():
    table, sidx, idx = _case(3000, 2000, seed=5)
    got = np.asarray(
        sorted_gather_pallas(
            table, sidx, interpret=INTERPRET,
            chunk=512, block_r=1024, tile_r=128,
        )
    )
    np.testing.assert_array_equal(got, np.asarray(table)[idx])
