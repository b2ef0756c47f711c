import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from hrbffusion3d_tpu.utils import tpu_cache
tpu_cache.enable()
import jax, jax.numpy as jnp
f = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8,128))
np.asarray(f(x))
for _ in range(5):
    t0=time.perf_counter(); np.asarray(f(x)); print('tiny op:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
y = jnp.ones((4096, 4096))
g = jax.jit(lambda x: jnp.exp(x).sum())
np.asarray(g(y))
t0=time.perf_counter(); np.asarray(g(y)); print('16M exp:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
h = jax.jit(lambda x: (x@x).sum())
np.asarray(h(y))
t0=time.perf_counter(); np.asarray(h(y)); print('4096^3 matmul:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
def body(i, a): return a + jnp.exp(a)*1e-9
k = jax.jit(lambda x: jax.lax.fori_loop(0, 100, body, x).sum())
np.asarray(k(y))
t0=time.perf_counter(); np.asarray(k(y)); print('100x16M exp (in-jit):', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
# gather benchmark: 1M random row gathers from (1M, 24) and from separate narrow arrays
idx = jnp.asarray(np.random.default_rng(0).integers(0, 1<<20, (1<<20,), dtype=np.int32))
rows = jnp.ones((1<<20, 24))
gr = jax.jit(lambda r, i: r[i].sum())
np.asarray(gr(rows, idx))
t0=time.perf_counter(); np.asarray(gr(rows, idx)); print('1M x 24ch row gather:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
nar = jnp.ones((1<<20,))
gn = jax.jit(lambda r, i: r[i].sum())
np.asarray(gn(nar, idx))
t0=time.perf_counter(); np.asarray(gn(nar, idx)); print('1M x 1ch gather:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
sc = jax.jit(lambda r, i: jnp.zeros((1<<20,)).at[i].add(r))
np.asarray(sc(nar, idx))
t0=time.perf_counter(); np.asarray(sc(nar, idx)); print('1M scatter-add:', round((time.perf_counter()-t0)*1000,2), 'ms', flush=True)
