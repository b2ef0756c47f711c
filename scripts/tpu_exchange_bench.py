"""Exchange cost of the active/archive split at large archive sizes (the
amortized per-keyframe cost that replaces the per-frame capacity tax the
map-scale sweep measured).  Run on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax.numpy as jnp

from hrbffusion3d_tpu.config import SLAMConfig
from hrbffusion3d_tpu.map import surfel_map as sm

cfg = SLAMConfig()
CA = 524288                      # active-window capacity
rng = np.random.default_rng(0)


def filled(cap, frac, sub_lo, sub_hi):
    n = int(cap * frac)
    data = np.zeros((cap, sm.N_CHANNELS), np.float32)
    data[:n, 0:3] = rng.normal(0, 1, (n, 3))
    data[:n, sm.SUBMAP] = rng.integers(sub_lo, sub_hi, n)
    data[:n, sm.CONF] = 50.0
    data[:n, sm.STAMP] = 1.0
    data[:n, sm.VALID] = 1.0
    return sm.SurfelMap(data=jnp.asarray(data), count=jnp.int32(n))


for cap_arch in (1 << 20, 1 << 21, 22 * (1 << 17), 1 << 22, 1 << 23):
    act = filled(CA, 0.7, 0, 8)
    arch = filled(cap_arch, 0.7, 8, 64)
    mask = np.zeros(3600, bool)
    mask[0:4] = True      # half the active submaps leave
    mask[8:12] = True     # ~1/14 of the archive returns
    a2, r2, stats = sm.exchange_active(act, arch, jnp.asarray(mask),
                                         jnp.int32(100), cfg)
    _ = np.asarray(a2.count)
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        a2, r2, stats = sm.exchange_active(act, arch, jnp.asarray(mask),
                                             jnp.int32(100), cfg)
        _ = np.asarray(a2.count)
        best = min(best, time.perf_counter() - t0)
    print(f"archive {cap_arch:9d}: exchange {best*1000:7.1f} ms  "
          f"(act {int(a2.count)}, arch {int(r2.count)}, dropped {int(stats[2])})",
          flush=True)
