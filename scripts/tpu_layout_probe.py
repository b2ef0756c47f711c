"""Layout calibration: is a (N, 24) f32 array physically padded to 128
lanes on this TPU (per-tile lane padding), i.e. do full-array streaming ops
over the packed surfel map pay ~5.3x bytes?

All probes sync on a SCALAR (sum) so host-transfer bytes cannot pollute the
comparison (the ab22 probe pulled whole arrays through the ~30 MB/s tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

N = 393216
REPS = 8


def bench(name, f, *args):
    g = jax.jit(f)
    _ = np.asarray(g(*args))
    best = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = np.asarray(g(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1000:8.2f} ms", flush=True)
    return best


k = jax.random.PRNGKey(0)
a24 = jax.random.normal(k, (N, 24))
a128 = jax.random.normal(k, (N, 128))
a24T = jax.random.normal(k, (24, N))
flat = jax.random.normal(k, (N * 24,))
idx = jax.random.randint(k, (307200,), 0, N)
v = jax.random.normal(k, (N,))

# elementwise stream: out = a*c + d, consumed by a sum so the materialised
# intermediate (the write) is still forced via a second use
bench("stream (N,24)", lambda x: ((x * 1.0001 + 0.5) ** 2).sum(), a24)
bench("stream (N,128)", lambda x: ((x * 1.0001 + 0.5) ** 2).sum(), a128)
bench("stream (24,N) transposed", lambda x: ((x * 1.0001 + 0.5) ** 2).sum(), a24T)
bench("stream flat (N*24,)", lambda x: ((x * 1.0001 + 0.5) ** 2).sum(), flat)

# forced materialisation: write the full array then gather one row per 8
# (cheap consumer that can't fuse the producer away)
sub = jnp.arange(0, N, 8)
bench("materialise (N,24)",
      lambda x: (x * 1.0001 + 0.5)[sub].sum(), a24)
bench("materialise (N,128)",
      lambda x: (x * 1.0001 + 0.5)[sub].sum(), a128)
bench("materialise (24,N)",
      lambda x: (x * 1.0001 + 0.5)[:, sub].sum(), a24T)

# column update (the clean tombstone write pattern)
bench("col update (N,24).at[:,22]",
      lambda x, vv: x.at[:, 22].set(vv)[sub].sum(), a24, v)
bench("col update (24,N).at[22,:]",
      lambda x, vv: x.at[22, :].set(vv)[:, sub].sum(), a24T, v)

# row gather 307k (the attr-render pattern)
bench("gather 307k rows of (N,24)", lambda x, i: x[i].sum(), a24, idx)
bench("gather 307k cols of (24,N)", lambda x, i: x[:, i].sum(), a24T, idx)
