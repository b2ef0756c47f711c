"""Profile v3: step stages with the packed surfel/model layout."""

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
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2)

scene = synth.default_room()
poses = synth.orbit_trajectory(3)
d1, c1 = synth.render_frame_jit(scene, jnp.asarray(poses[1]), intr)
f1 = slam.FrameInput(depth=d1, rgb=c1)
state = slam.bootstrap(slam.FrameInput(
    *synth.render_frame_jit(scene, jnp.asarray(poses[0]), intr)), intr, cfg,
    init_pose=poses[0])
_ = np.asarray(state.t)
print("bootstrap done", flush=True)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1000:9.2f} ms", flush=True)
    return out


pre = jax.jit(lambda d, df: preprocess.vertex_normal_radius(d, df, intr, cfg))(d1, d1)
curv = jax.jit(lambda p: preprocess.curvature_gradient(p, intr, cfg, chunk=cfg.curvature_chunk))(pre)
inten = pyramid.rgb_to_intensity(c1)

build = jax.jit(lambda: odometry.build_inputs(
    d1, inten, pre.vertex_filtered, pre.normal,
    state.pred_vertex, state.pred_normal, state.pred_intensity,
    state.pred_icp_weight, state.R, state.t, state.prev_intensity, cfg))
inp = timeit("build_pyramids", build)

track = jax.jit(lambda i: odometry.track(state.R, state.t, i, intr, cfg))
timeit("track (19 GN iters)", track, inp)

pose_inv = jnp.eye(4)
ridx = jax.jit(lambda m: sm.render_index(m, pose_inv, intr))
idx = timeit("render_index", ridx, state.map)

conf = preprocess.confidence_map(pre, curv, intr, cfg)
meas = sm.measurement_from_preprocess(pre, curv, c1, conf)
fuse_fn = jax.jit(lambda m, i: sm.fuse(m, meas, jnp.eye(4), i, intr, cfg, 2, 0))
m2 = timeit("fuse", fuse_fn, state.map, idx)

clean_fn = jax.jit(lambda m, i: sm.clean(m, jnp.eye(4), i, intr, cfg, 2))
timeit("clean", clean_fn, m2, idx)

pred_fn = jax.jit(lambda m, i: raycast.predict_hrbf(m, pose_inv, i, intr, cfg,
                                                    chunk=cfg.raycast_chunk))
timeit("predict_hrbf(full)", pred_fn, state.map, idx)

step_fn = jax.jit(lambda s, f: slam.step(s, f, intr, cfg))
timeit("FULL slam.step", step_fn, state, f1)
print("done", flush=True)
