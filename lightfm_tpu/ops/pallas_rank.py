"""Pallas TPU kernel: fused catalog scoring + rank counting.

``predict_ranks`` (the reference's native eval kernel,
`_lightfm_fast.pyx.template:1232-1323`) needs, per (user, test item), the
count of catalog items scoring ``>=`` the test item's score.  The XLA
formulation materialises a [user_block, n_items] score matrix in HBM and
re-reads it to compare — 2x the catalog-scores HBM traffic.  This kernel
fuses the MXU matmul with the comparison count so each score tile lives and
dies in VMEM:

    grid = (user_blocks, item_blocks)           # row-major: items innermost
    scores_tile = u_blk @ items_blk.T           # MXU, [UB, IB] in VMEM
    counts[u, t] += sum_i (scores_tile[u, i] >= ts[u, t])

The output block (``counts`` for one user block) is revisited across the
item-block grid dimension — TPU grid iterations are sequential, so the
accumulation is race-free.

Test-item scores ``ts`` are computed OUTSIDE with the same MXU dot shape
(contraction over the same padded width), which produces bitwise-identical
floats for the self-item, preserving the reference's exact pessimistic-tie
semantics (``counts - 1`` removes the self match).  Validated by
tests/test_pallas.py (interpret mode on CPU) and the evaluation
differential suite on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rank_count_kernel(ts_ref, u_ref, items_ref, counts_ref):
    ib = pl.program_id(1)
    # HIGHEST: f32-exact (TPU default rounds inputs to bf16), matching the
    # diag-GEMM test/excluded-score extraction bit for bit.
    scores = jnp.dot(
        u_ref[:], items_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [UB, IB]
    ts = ts_ref[:]  # [UB, T]
    c = (
        (scores[:, None, :] >= ts[:, :, None])
        .astype(jnp.float32)
        .sum(axis=-1)
    )  # [UB, T]

    @pl.when(ib == 0)
    def _():
        counts_ref[:] = c

    @pl.when(ib != 0)
    def _():
        counts_ref[:] += c


@functools.partial(jax.jit, static_argnames=("user_block", "item_block", "interpret"))
def rank_counts_fused(
    u_aug: jax.Array,  # f32 [U_pad, Wa]
    items_aug: jax.Array,  # f32 [I_pad, Wa]; I_pad % item_block == 0
    ts: jax.Array,  # f32 [U_pad, T]; pad columns +inf (count 0)
    user_block: int = 256,
    item_block: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """counts[u, t] = #{i : (u_aug[u] . items_aug[i]) >= ts[u, t]}."""
    U, Wa = u_aug.shape
    I = items_aug.shape[0]
    T = ts.shape[1]
    assert U % user_block == 0 and I % item_block == 0

    grid = (U // user_block, I // item_block)
    return pl.pallas_call(
        _rank_count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_block, T), lambda ub, ib: (ub, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((user_block, Wa), lambda ub, ib: (ub, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((item_block, Wa), lambda ub, ib: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((user_block, T), lambda ub, ib: (ub, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U, T), jnp.float32),
        interpret=interpret,
    )(ts, u_aug, items_aug)
