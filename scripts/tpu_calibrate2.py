import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from hrbffusion3d_tpu.utils import tpu_cache
tpu_cache.enable()
import jax, jax.numpy as jnp
N = 1 << 19
idx = jnp.asarray(np.random.default_rng(0).permutation(N).astype(np.int32))
rows = jnp.ones((N, 24))

def t(name, f, *a):
    np.asarray(jax.tree.leaves(f(*a))[0])
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); np.asarray(jax.tree.leaves(f(*a))[0]); ts.append(time.perf_counter()-t0)
    print(f"{name:34s} {min(ts)*1000:8.2f} ms", flush=True)

t("row scatter-set (512k,24)", jax.jit(lambda r,i: jnp.zeros((N,24)).at[i].set(r)), rows, idx)
t("narrow scatter-min 512k", jax.jit(lambda i: jnp.full((N,), 9, jnp.int32).at[i].min(jnp.arange(N,dtype=jnp.int32))), idx)
t("cumsum 512k", jax.jit(lambda i: jnp.cumsum(i).sum()), idx)
t("row gather (512k,24)", jax.jit(lambda r,i: r[i].sum()), rows, idx)
t("row gather (512k,108)", jax.jit(lambda i: jnp.ones((N,108))[i].sum()), idx)
t("sort 512k", jax.jit(lambda i: jnp.sort(i).sum()), idx)
