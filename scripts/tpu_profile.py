"""Per-stage timing of the SLAM step on the real TPU chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 20, predict_conf_threshold=0.2)

scene = synth.default_room()
poses = synth.orbit_trajectory(3)
d0, c0 = synth.render_frame_jit(scene, jnp.asarray(poses[0]), intr)
d1, c1 = synth.render_frame_jit(scene, jnp.asarray(poses[1]), intr)
f0 = slam.FrameInput(depth=d0, rgb=c0)
f1 = slam.FrameInput(depth=d1, rgb=c1)
state = slam.bootstrap(f0, intr, cfg, init_pose=poses[0])
_ = np.asarray(state.t)
print("bootstrap done", flush=True)


def timeit(name, fn, *args, n=3, sync=lambda o: np.asarray(jax.tree.leaves(o)[0])):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} {min(ts)*1000:9.2f} ms", flush=True)
    return out


bil = jax.jit(lambda d: preprocess.bilateral_filter(d, cfg))
timeit("bilateral", bil, f1.depth)

vnr = jax.jit(lambda d, df: preprocess.vertex_normal_radius(d, df, intr, cfg))
pre = timeit("vertex_normal_radius(PCA)", vnr, f1.depth, f1.depth)

curv_fn = jax.jit(lambda p: preprocess.curvature_gradient(p, intr, cfg))
curv = timeit("curvature_gradient", curv_fn, pre)

inten = pyramid.rgb_to_intensity(f1.rgb)

build = jax.jit(lambda: odometry.build_inputs(
    f1.depth, inten, pre.vertex_filtered, pre.normal,
    state.pred_vertex, state.pred_normal, state.pred_intensity,
    state.pred_icp_weight, state.R, state.t, state.prev_intensity, cfg))
inp = timeit("build_pyramids", build)

track = jax.jit(lambda i: odometry.track(state.R, state.t, i, intr, cfg))
timeit("track (19 GN iters)", track, inp)

pose_inv = jnp.eye(4)
ridx = jax.jit(lambda m: sm.render_index(m, pose_inv, intr))
idx = timeit("render_index", ridx, state.map)

conf = preprocess.confidence_map(pre, curv, intr, cfg)
meas = sm.measurement_from_preprocess(pre, curv, f1.rgb, conf)
fuse_fn = jax.jit(lambda m, i: sm.fuse(m, meas, jnp.eye(4), i, intr, cfg, 2, 0))
m2 = timeit("fuse", fuse_fn, state.map, idx)

clean_fn = jax.jit(lambda m, i: sm.clean(m, jnp.eye(4), i, intr, cfg, 2))
timeit("clean", clean_fn, m2, idx)

pred_fn = jax.jit(lambda m, i: raycast.predict_hrbf(m, pose_inv, i, intr, cfg))
timeit("predict_hrbf", pred_fn, state.map, idx)
print("done", flush=True)
