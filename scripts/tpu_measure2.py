"""Measurement batch 2 (single process, back-to-back):
  - step_many XLA vs Pallas-raycast (early-exit ladder)
  - standalone predict XLA vs Pallas
  - track internals: so3 prealign cost, GN-iteration cost vs pyramid build
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2)
cfg_p = dataclasses.replace(cfg, use_pallas_raycast=True)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
print("bootstrap done", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]


def timed(name, fn, n=3, per_frame=False):
    t0 = time.perf_counter()
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])
    c = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / (NF if per_frame else 1)
    unit = "ms/frame" if per_frame else "ms"
    print(f"{name:34s} {ms:8.1f} {unit}  (compile {c:.0f}s)", flush=True)
    return out


# ---- 1. end-to-end, same process ----
timed("step_many XLA", lambda: slam.step_many(state0, batch, intr, cfg),
      per_frame=True)
timed("step_many PALLAS-raycast", lambda: slam.step_many(state0, batch, intr, cfg_p),
      per_frame=True)

# ---- 2. standalone predict ----
m = state0.map
pose_inv = jnp.asarray(np.linalg.inv(poses[0]).astype(np.float32))
idx = jax.jit(lambda: sm.render_index(m, pose_inv, intr))()
timed("predict XLA", jax.jit(
    lambda: raycast.predict_hrbf(m, pose_inv, idx, intr, cfg,
                                 chunk=cfg.raycast_chunk)))
timed("predict PALLAS early-exit", jax.jit(
    lambda: raycast.predict_hrbf(m, pose_inv, idx, intr, cfg_p)))

# ---- 3. track internals (scan-batched like the pipeline) ----
def make_track_probe(probe_cfg, name):
    def step1(state, frame):
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, probe_cfg)
        inp = odometry.build_inputs(
            next_depth=depth_f, next_intensity=intensity,
            next_vmap=pre.vertex_filtered, next_nmap=pre.normal,
            pred_vmap=state.pred_vertex, pred_nmap=state.pred_normal,
            pred_intensity=state.pred_intensity,
            icp_weight=state.pred_icp_weight,
            prev_R=state.R, prev_t=state.t,
            prev_intensity=state.prev_intensity, cfg=probe_cfg)
        tr = odometry.track(state.R, state.t, inp, intr, probe_cfg)
        return state._replace(R=tr.R, t=tr.t, prev_intensity=intensity,
                              time=state.time + 1), tr.t

    @jax.jit
    def many(state, fr):
        return jax.lax.scan(step1, state, fr)

    timed(name, lambda: many(state0, batch), per_frame=True)


make_track_probe(cfg, "pre+track (so3 on, 10/5/4)")
make_track_probe(dataclasses.replace(cfg, so3_prealign=False),
                 "pre+track (so3 OFF)")
make_track_probe(dataclasses.replace(cfg, pyramid_iterations=(0, 0, 0)),
                 "pre+track (0 GN iters)")
make_track_probe(dataclasses.replace(cfg, so3_prealign=False,
                                     pyramid_iterations=(0, 0, 0)),
                 "pre+build only")
print("DONE", flush=True)
