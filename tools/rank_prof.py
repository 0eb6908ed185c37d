import time
import numpy as np
import scipy.sparse as sp
import jax, jax.numpy as jnp

from lightfm_tpu import LightFM
from lightfm_tpu.datasets import generate_synthetic

# Production-ish eval: 50k users x 100k items, 10 test items/user.
rng = np.random.RandomState(0)
n_users, n_items, T = 50_000, 100_000, 10
rows = np.repeat(np.arange(n_users), T)
cols = rng.randint(0, n_items, n_users*T)
test = sp.csr_matrix((np.ones(n_users*T, np.float32), (rows, cols)), shape=(n_users, n_items))

from lightfm_tpu.state import init_state
from lightfm_tpu.ops.ranking import predict_ranks_padded
from lightfm_tpu.sparse import identity_rows

state = init_state(64, n_items, n_users, rng, adagrad=True)
uf, itf = identity_rows(n_users), identity_rows(n_items)
train = sp.csr_matrix((n_users, n_items), dtype=np.float32)

t0 = time.perf_counter()
r = predict_ranks_padded(state, uf, itf, test, train)
print(f"compile+run: {time.perf_counter()-t0:.2f}s")
t0 = time.perf_counter()
r = predict_ranks_padded(state, uf, itf, test, train)
dt = time.perf_counter()-t0
print(f"run: {dt:.3f}s  ({n_users/dt:.0f} users/s, {n_users*n_items/dt/1e9:.1f} Gpair/s)")

# top-k retrieval QPS
from lightfm_tpu.retrieval import top_k, build_compressed_index, top_k_compressed
uid = jnp.arange(4096, dtype=jnp.int32)
s, i = top_k(state, uf, itf, uid, 100, n_items); jax.block_until_ready(i)
t0 = time.perf_counter()
for _ in range(5):
    s, i = top_k(state, uf, itf, uid, 100, n_items)
jax.block_until_ready(i); _=np.asarray(i[0,0])
dt = (time.perf_counter()-t0)/5
print(f"topk exact: {dt*1e3:.1f}ms for 4096 users -> {4096/dt:.0f} QPS")
idx = build_compressed_index(state, itf, n_items)
s, i = top_k_compressed(state, uf, idx, uid, 100); jax.block_until_ready(i)
t0 = time.perf_counter()
for _ in range(5):
    s, i = top_k_compressed(state, uf, idx, uid, 100)
jax.block_until_ready(i); _=np.asarray(i[0,0])
dt = (time.perf_counter()-t0)/5
print(f"topk compressed: {dt*1e3:.1f}ms for 4096 users -> {4096/dt:.0f} QPS")
