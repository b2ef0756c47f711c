"""Profile v2: packed-layout stages + Pallas kernels on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import dataclasses

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import pallas_kernels as pk
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 20, predict_conf_threshold=0.2)

scene = synth.default_room()
poses = synth.orbit_trajectory(3)
d0, c0 = synth.render_frame_jit(scene, jnp.asarray(poses[0]), intr)
d1, c1 = synth.render_frame_jit(scene, jnp.asarray(poses[1]), intr)
f1 = slam.FrameInput(depth=d1, rgb=c1)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(ts)*1000:9.2f} ms", flush=True)
    return out


# ---- pallas vs xla kernels ----
timeit("bilateral XLA", jax.jit(lambda d: preprocess.bilateral_filter(d, cfg)), f1.depth)
timeit("bilateral PALLAS", jax.jit(lambda d: pk.bilateral_filter(d, cfg)), f1.depth)

pre = jax.jit(lambda d, df: preprocess.vertex_normal_radius(d, df, intr, cfg))(f1.depth, f1.depth)
from hrbffusion3d_tpu.core import camera
v = camera.unproject(f1.depth, intr)
timeit("pca XLA", jax.jit(lambda x: preprocess.normal_pca(x, cfg)), v)
timeit("pca PALLAS", jax.jit(lambda x: pk.normal_pca(x, cfg)), v)

timeit("curvature XLA(full)", jax.jit(lambda p: preprocess.curvature_gradient(p, intr, cfg, chunk=cfg.curvature_chunk)), pre)
timeit("curvature PALLAS", jax.jit(lambda p: pk.curvature_gradient(p, intr, cfg)), pre)

print("kernels done", flush=True)
