"""Microbenchmark: the pieces of the sorted-update pipeline, isolated.

Per step at B=131072 the item table sees M=262144 touches. The sorted
Pallas update needs: (1) argsort of the touch ids, (2) payload gather of
the [M, W] gradients into sorted order, (3) the worklist construction,
(4) the pallas kernel itself. This prints each piece's steady cost so we
know what the composed path should add up to.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

M, W, R = 262144, 72, 100_000
STEPS = 39

k = jax.random.key(0)
k1, k2 = jax.random.split(k)
idx = jax.random.randint(k1, (STEPS, M), 0, R, dtype=jnp.int32)
wg = jax.random.normal(k2, (STEPS, M, W), jnp.float32) * 0.01


def timeit(f, *args, n=3):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def sort_only(idx):
    def body(c, i):
        s, o = jax.lax.sort([i, jnp.arange(M, dtype=jnp.int32)], num_keys=1)
        return c + s[0] + o[0], None
    return jax.lax.scan(body, jnp.int32(0), idx)[0]


@jax.jit
def sort_gather(idx, wg):
    def body(c, xs):
        i, g = xs
        s, o = jax.lax.sort([i, jnp.arange(M, dtype=jnp.int32)], num_keys=1)
        sg = g[o]
        return c + sg[0, 0] + s[0], None
    return jax.lax.scan(body, jnp.float32(0), (idx, wg))[0]


@jax.jit
def sort_payload(idx, wg):
    # multi-operand sort carrying the payload directly (72 f32 operands)
    def body(c, xs):
        i, g = xs
        ops = jax.lax.sort([i] + [g[:, j] for j in range(W)], num_keys=1)
        return c + ops[1][0], None
    return jax.lax.scan(body, jnp.float32(0), (idx, wg))[0]


print("sort ids+iota:  %.3fs" % timeit(sort_only, idx), flush=True)
print("sort + gather:  %.3fs" % timeit(sort_gather, idx, wg), flush=True)
try:
    print("sort w/payload: %.3fs" % timeit(sort_payload, idx, wg), flush=True)
except Exception as e:
    print("sort w/payload failed:", repr(e)[:120], flush=True)


@jax.jit
def sort_payload_stack(idx, wg):
    # payload-carrying sort + materialize the [M, W] sorted block
    def body(c, xs):
        i, g = xs
        ops = jax.lax.sort([i] + [g[:, j] for j in range(W)], num_keys=1)
        sg = jnp.stack(ops[1:], axis=1)
        return c + jnp.sum(sg[0]) + ops[0][0], None
    return jax.lax.scan(body, jnp.float32(0), (idx, wg))[0]


@jax.jit
def sort_payload_bits(idx, wg):
    # single-key sort with 72 int32 bitcast payload operands, stacked out
    def body(c, xs):
        i, g = xs
        gi = jax.lax.bitcast_convert_type(g, jnp.int32)
        ops = jax.lax.sort([i] + [gi[:, j] for j in range(W)], num_keys=1)
        sg = jax.lax.bitcast_convert_type(jnp.stack(ops[1:], axis=1), jnp.float32)
        return c + jnp.sum(sg[0]) + ops[0][0], None
    return jax.lax.scan(body, jnp.float32(0), (idx, wg))[0]


print("sort+stack:     %.3fs" % timeit(sort_payload_stack, idx, wg), flush=True)
print("sort+bits+stack:%.3fs" % timeit(sort_payload_bits, idx, wg), flush=True)
