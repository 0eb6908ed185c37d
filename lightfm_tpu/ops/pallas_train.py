"""Pallas TPU megakernel: whole-fit WARP training for VMEM-resident models.

For small models (identity features; user+item tables + accumulators within
a few MB) the XLA training path is DISPATCH-bound: a quickstart-sized fit is
~1300 sequential fused steps of ~100µs each, dominated by per-op and loop
overheads rather than math.  This kernel runs the ENTIRE fit — every epoch,
every batch — inside one `pallas_call`:

- the four state arrays (user/item tables + adagrad accumulators) live in
  VMEM for the whole kernel (they are the grid outputs with a constant
  index map, so they persist across the sequential grid steps and are
  written back to HBM once);
- the grid iterates over pre-shuffled minibatches (shuffling for all epochs
  is done outside with the same sort-with-payload trick as train._epoch);
- gathers and scatters become ONE-HOT MATMULS on the MXU: `onehot(ids) @
  table` gathers rows, `onehot(ids).T @ grads` scatter-adds duplicate-safely
  — exact, because one-hot rows have a single 1.0;
- negative candidate ids for every step are drawn OUTSIDE with jax.random
  (rooted in the model's numpy RandomState stream, exactly like the XLA
  path) and streamed in alongside the batches.

Semantics match losses.warp_step (slot-major [K, B] candidates, first
margin violator, `log(floor((I-1)/draws))` rank weight, MAX_LOSS clip) with
adagrad's pre-batch accumulator rule.  Restrictions: WARP + adagrad +
alpha == 0 + identity features.

STATUS — experimental, NOT wired into the training path.  Compiles and
trains correctly on v5e (ML-100k quickstart: p@5 0.65-0.67, same as the XLA
path), with the whole 30-epoch fit in ONE kernel launch — but it is 2.5x
SLOWER (0.41s vs 0.17s): the one-hot formulation pays O(I_pad) work per
row lookup, ~75x the XLA path's per-example math, and measured time is
element-work-proportional (B-invariant), so eliminating dispatch overhead
cannot recover it.  A faster variant needs true in-VMEM dynamic row
gathers, which Mosaic currently only offers as serialized per-row slices.
Kept with interpret-mode tests as the starting point for that follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightfm_tpu.config import MAX_LOSS

def _pad128(x: int) -> int:
    return ((x + 127) // 128) * 128


def _train_kernel(
    batches_ref,  # VMEM [1, 8, B] int32 (this step's packed batch)
    negs_ref,  # VMEM [1, 1, K*B] int32, slot-major flat (lane-aligned)
    pos_ref,  # VMEM [U_pad, P] int32 sentinel-padded positives
    u_tab_in,  # VMEM [U_pad, W] f32 initial state (read at step 0 only)
    u_acc_in,
    i_tab_in,  # VMEM [I_pad, W]
    i_acc_in,
    u_tab,  # VMEM output refs: the LIVE state — constant index maps keep
    u_acc,  # these blocks resident in VMEM across the sequential grid, so
    i_tab,  # step s reads what step s-1 wrote; HBM write-back happens once
    i_acc,  # at the end.
    ohn_scratch,  # VMEM [B, I_pad] f32: ONE reused one-hot buffer
    *,
    n_items: int,
    max_sampled: int,
    learning_rate: float,
):
    B = batches_ref.shape[2]
    U_pad = u_tab.shape[0]
    I_pad = i_tab.shape[0]
    W = u_tab.shape[1]
    K = max_sampled

    @pl.when(pl.program_id(0) == 0)
    def _():
        u_tab[...] = u_tab_in[...]
        u_acc[...] = u_acc_in[...]
        i_tab[...] = i_tab_in[...]
        i_acc[...] = i_acc_in[...]

    uid = batches_ref[0, 0, :]  # [B] int32
    iid = batches_ref[0, 1, :]
    # bitcast needs >= 2D on TPU
    y = pltpu.bitcast(batches_ref[0, 2:3, :], jnp.float32)[0]
    weight = pltpu.bitcast(batches_ref[0, 3:4, :], jnp.float32)[0]
    valid = batches_ref[0, 4, :] > 0

    f32 = jnp.float32

    # --- gathers as one-hot matmuls (exact: single 1.0 per row) ---------
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (B, U_pad), 1)
    ohu = (iota_u == uid[:, None]).astype(f32)  # [B, U_pad]
    u_rep = jnp.dot(ohu, u_tab[...], preferred_element_type=f32)

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (B, I_pad), 1)
    ohp = (iota_i == iid[:, None]).astype(f32)  # [B, I_pad]
    p_rep = jnp.dot(ohp, i_tab[...], preferred_element_type=f32)

    # user's positives row for rejection (ids as int -> compare later)
    pos_rows = jnp.dot(
        ohu, pos_ref[...].astype(f32), preferred_element_type=f32
    ).astype(jnp.int32)  # [B, P] (ids < 2^24: exact in f32)

    # u1: bias slot = 1 so full-width dots fold the item bias in.
    col = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    u1 = jnp.where(col == W - 1, 1.0, u_rep)
    u_bias = u_rep[:, W - 1]

    pos_pred = jnp.sum(u1 * p_rep, axis=1) + u_bias  # [B]

    # --- first margin violator over the K streamed negative draws -------

    # Static unroll over K draw slots (static slices: Mosaic cannot
    # legalize dynamic lane-slices inside scf.for), with the [B, I_pad]
    # one-hot routed through ONE scratch buffer so iterations reuse it
    # instead of each claiming VMEM stack.
    found = jnp.zeros((B,), bool)
    j_sel = jnp.zeros((B,), jnp.int32)
    neg_sel = jnp.zeros((B,), jnp.int32)
    for k in range(K):
        nk = negs_ref[0, 0, k * B : (k + 1) * B]  # [B], static slice
        ohn_scratch[...] = (iota_i == nk[:, None]).astype(f32)
        n_rep = jnp.dot(
            ohn_scratch[...], i_tab[...], preferred_element_type=f32
        )
        npred = jnp.sum(u1 * n_rep, axis=1) + u_bias
        violates = npred > pos_pred - 1.0
        is_pos = (pos_rows == nk[:, None]).any(axis=1)
        hit = violates & (~is_pos) & (~found)
        j_sel = jnp.where(hit, k, j_sel)
        neg_sel = jnp.where(hit, nk, neg_sel)
        found = found | hit

    sampled = (j_sel + 1).astype(f32)
    rank_w = jnp.log(jnp.maximum(1.0, jnp.floor((n_items - 1) / sampled)))
    loss = jnp.minimum(weight * rank_w, MAX_LOSS)
    upd = valid & (y > 0.0) & found
    L = jnp.where(upd, loss, 0.0)  # [B]

    # --- gradients ------------------------------------------------------
    ohn_sel = (iota_i == neg_sel[:, None]).astype(f32)  # [B, I_pad]
    n_rep = jnp.dot(ohn_sel, i_tab[...], preferred_element_type=f32)

    lu = L[:, None] * u1  # [B, W] item-side gradient magnitude
    g_user = L[:, None] * jnp.where(col == W - 1, 1.0, n_rep - p_rep)

    # --- dense scatter-equivalents: onehot.T @ grads ---------------------
    # items: -lu at the positive, +lu at the selected negative.
    s_item = jnp.dot(
        ohp.T, -lu, preferred_element_type=f32
    ) + jnp.dot(ohn_sel.T, lu, preferred_element_type=f32)
    s_item2 = jnp.dot(
        ohp.T, lu * lu, preferred_element_type=f32
    ) + jnp.dot(ohn_sel.T, lu * lu, preferred_element_type=f32)
    s_user = jnp.dot(ohu.T, g_user, preferred_element_type=f32)
    s_user2 = jnp.dot(
        ohu.T, g_user * g_user, preferred_element_type=f32
    )

    # adagrad with the PRE-batch accumulator (ops.updates semantics).
    i_tab[...] = i_tab[...] - learning_rate * jax.lax.rsqrt(i_acc[...]) * s_item
    i_acc[...] = i_acc[...] + s_item2
    u_tab[...] = u_tab[...] - learning_rate * jax.lax.rsqrt(u_acc[...]) * s_user
    u_acc[...] = u_acc[...] + s_user2


@functools.partial(
    jax.jit,
    static_argnames=("n_items", "max_sampled", "learning_rate", "interpret"),
)
def warp_fit_fused(
    user_table: jax.Array,  # f32 [U, W]
    user_acc: jax.Array,
    item_table: jax.Array,  # f32 [I, W]
    item_acc: jax.Array,
    batches: jax.Array,  # int32 [n_steps, 8, B] pre-shuffled packed batches
    negatives: jax.Array,  # int32 [n_steps, 1, K*B] slot-major flat draws
    positives: jax.Array,  # int32 [U, P] sentinel-padded per-user positives
    *,
    n_items: int,
    max_sampled: int,
    learning_rate: float,
    interpret: bool = False,
):
    """Run the whole multi-epoch WARP fit in one kernel; returns new state."""
    U, W = user_table.shape
    I = item_table.shape[0]
    U_pad, I_pad = _pad128(U), _pad128(I)

    def pad_rows(x, n):
        return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))

    u_tab = pad_rows(user_table, U_pad)
    u_acc = pad_rows(user_acc, U_pad)
    i_tab = pad_rows(item_table, I_pad)
    i_acc = pad_rows(item_acc, I_pad)
    # Padding rows of acc must be positive for rsqrt.
    if U_pad != U:
        u_acc = u_acc.at[U:].set(1.0)
    if I_pad != I:
        i_acc = i_acc.at[I:].set(1.0)
    pos_pad = jnp.pad(
        positives, ((0, U_pad - U), (0, 0)), constant_values=jnp.int32(2**24)
    )

    n_steps = batches.shape[0]
    kern = functools.partial(
        _train_kernel,
        n_items=n_items,
        max_sampled=max_sampled,
        learning_rate=learning_rate,
    )

    def whole(shape):
        return pl.BlockSpec(shape, lambda s: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1,) + batches.shape[1:], lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, negatives.shape[2]), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            whole(pos_pad.shape),
            whole(u_tab.shape),
            whole(u_acc.shape),
            whole(i_tab.shape),
            whole(i_acc.shape),
        ],
        out_specs=[
            whole(u_tab.shape),
            whole(u_acc.shape),
            whole(i_tab.shape),
            whole(i_acc.shape),
        ],
        scratch_shapes=[
            pltpu.VMEM((batches.shape[2], _pad128(item_table.shape[0])),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        out_shape=[
            jax.ShapeDtypeStruct(u_tab.shape, jnp.float32),
            jax.ShapeDtypeStruct(u_acc.shape, jnp.float32),
            jax.ShapeDtypeStruct(i_tab.shape, jnp.float32),
            jax.ShapeDtypeStruct(i_acc.shape, jnp.float32),
        ],
        interpret=interpret,
    )(batches, negatives, pos_pad, u_tab, u_acc, i_tab, i_acc)

    u_tab, u_acc, i_tab, i_acc = out
    return u_tab[:U], u_acc[:U], i_tab[:I], i_acc[:I]
