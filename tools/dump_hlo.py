import numpy as np
import scipy.sparse as sp
import jax, jax.numpy as jnp

from lightfm_tpu.state import init_state
from lightfm_tpu.config import Hyperparams
from lightfm_tpu.train import build_train_data, run_epoch
from lightfm_tpu.sparse import identity_rows

rng = np.random.RandomState(0)
n_users, n_items, nnz, D = 200_000, 100_000, 5_000_000, 64
rows = rng.randint(0, n_users, nnz).astype(np.int32)
cols = rng.randint(0, n_items, nnz).astype(np.int32)
coo = sp.coo_matrix((np.ones(nnz, np.float32), (rows, cols)), shape=(n_users, n_items))
coo.sum_duplicates()

hp = Hyperparams(no_components=D, loss="warp", max_sampled=10)
state0 = init_state(D, n_items, n_users, rng, adagrad=True)
B = 131072
data = build_train_data(coo, np.ones(coo.nnz, np.float32), identity_rows(n_users), identity_rows(n_items), hp, B)
key = jax.random.key(0)
txt = jax.jit(run_epoch, static_argnames=("hp","batch_size","mesh")).lower(state0, data, key, hp, B).compile().as_text()
open("/tmp/epoch_hlo.txt","w").write(txt)
print(len(txt))
