"""Measurement batch 3 (healthy-service window, single process):
end-to-end step variants + refreshed stage ablation with the new code
(quartered fuse, tombstone clean option, pallas raycast w/ early exit)."""

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
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
print(f"bootstrap done, count={int(state0.map.count)}", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]


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
    print(f"{name:36s} {min(ts)*1000/NF:8.1f} ms/frame  (compile {c:.0f}s)",
          flush=True)
    return out


variants = [
    ("XLA baseline", cfg),
    ("pallas raycast", dataclasses.replace(cfg, use_pallas_raycast=True)),
    ("pallas + compact every 4", dataclasses.replace(
        cfg, use_pallas_raycast=True, clean_compact_period=4)),
    ("pallas + compact4 + pallas-pre", dataclasses.replace(
        cfg, use_pallas_raycast=True, clean_compact_period=4, use_pallas=True)),
]
outs = {}
for name, c in variants:
    outs[name] = timed("step_many " + name,
                       lambda c=c: slam.step_many(state0, batch, intr, c))

t_ref = np.asarray(outs["XLA baseline"][1])
for name, _ in variants[1:]:
    dt = np.abs(np.asarray(outs[name][1]) - t_ref).max()
    print(f"  traj max|dt| vs baseline [{name}]: {dt:.3e}", flush=True)

# ---- refreshed stage ablation (same harness as tpu_ablate, new code) ----
from tpu_ablate_lib import make_step  # noqa: E402

for name, stages in [
    ("pre", "pre"),
    ("pre+track", "pre track"),
    ("+render", "pre track render"),
    ("+fuse", "pre track render fuse"),
    ("+clean", "pre track render fuse clean"),
]:
    fn = make_step(stages, intr, cfg)
    timed("ablate " + name, lambda fn=fn: fn(state0, batch))
print("DONE", flush=True)
