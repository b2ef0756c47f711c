"""Verify the fused Pallas raycast on the real TPU: Mosaic compile, output
parity vs the XLA path at the native 640x480 workload, standalone + in-scan
timing, and edge probes (empty map, odd image height)."""

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

from hrbffusion3d_tpu.config import TUM1, CameraIntrinsics, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import raycast
from hrbffusion3d_tpu.pipeline import slam

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

m = state0.map
pose_inv = jnp.asarray(np.linalg.inv(poses[0]).astype(np.float32))


@jax.jit
def render():
    return sm.render_index(m, pose_inv, intr)


idx = render()


def timed(name, fn, n=3):
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
    print(f"{name:28s} {min(ts)*1000:8.1f} ms  (compile {c:.0f}s)", flush=True)
    return out


pred_x = timed("predict XLA", jax.jit(
    lambda: raycast.predict_hrbf(m, pose_inv, idx, intr, cfg,
                                 chunk=cfg.raycast_chunk)))
pred_p = timed("predict PALLAS", jax.jit(
    lambda: raycast.predict_hrbf(m, pose_inv, idx, intr, cfg_p)))

fx = np.asarray(pred_x.found)
fp = np.asarray(pred_p.found)
print(f"found: xla {fx.mean():.4f} pallas {fp.mean():.4f} "
      f"agree {(fx == fp).mean():.5f}")
both = fx & fp
vx = np.asarray(pred_x.vertex)[both]
vp = np.asarray(pred_p.vertex)[both]
print(f"vertex |dz| p50 {np.median(np.abs(vx - vp)):.2e} "
      f"max {np.abs(vx - vp).max():.2e}")
dots = np.sum(np.asarray(pred_x.normal)[both] * np.asarray(pred_p.normal)[both], -1)
print(f"normal dot>0.9999 frac {(dots > 0.9999).mean():.5f}")
wx = np.asarray(pred_x.icp_weight)[both]
wp = np.asarray(pred_p.icp_weight)[both]
print(f"icp_weight rel err p99 "
      f"{np.percentile(np.abs(wx - wp) / np.maximum(np.abs(wx), 1e-9), 99):.2e}",
      flush=True)

# ---- in-scan timing: full step_many with pallas raycast ----
batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]

out_x = timed("step_many XLA (7f)", lambda: slam.step_many(state0, batch, intr, cfg))
out_p = timed("step_many PALLAS (7f)", lambda: slam.step_many(state0, batch, intr, cfg_p))
tx = np.asarray(out_x[1])
tp = np.asarray(out_p[1])
print(f"trajectory max |dt| xla-vs-pallas: {np.abs(tx - tp).max():.2e}",
      flush=True)

# ---- probes ----
# empty map: nothing rendered -> found must be all False, no NaNs
empty = sm.empty_map(cfg.map_capacity)
idx_e = sm.render_index(empty, pose_inv, intr)
pred_e = jax.jit(lambda: raycast.predict_hrbf(empty, pose_inv, idx_e, intr, cfg_p))()
fe = np.asarray(pred_e.found)
ve = np.asarray(pred_e.vertex)
print(f"probe empty map: found {fe.mean():.4f} vertex finite "
      f"{np.isfinite(ve).all()}")

# odd height (not a multiple of the 8-row block): padding path
intr_odd = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=50.0,
                            width=128, height=100)
d_o, c_o = synth.render_frame_jit(scene, jnp.eye(4), intr_odd)
st_o = slam.bootstrap(slam.FrameInput(depth=d_o, rgb=c_o), intr_odd,
                      dataclasses.replace(cfg_p, map_capacity=1 << 15))
print(f"probe odd-height 128x100: dense_frac {float(st_o.dense_frac):.3f} "
      f"pred finite {np.isfinite(np.asarray(st_o.pred_vertex)).all()}")
print("DONE", flush=True)
