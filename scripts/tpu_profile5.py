"""Capture a jax.profiler device trace of one step_many call (xplane.pb),
for op-level attribution with xprof/tensorboard_plugin_profile.
Writes to /tmp/jaxprof."""

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
from hrbffusion3d_tpu.pipeline import slam

intr = TUM1
cfg = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4,
                 raycast_block_height=16, raycast_bisection_iters=6,
                 raycast_false_position=3, clean_crowd_period=4)

# optional config overrides: field:value;field:value as argv[1]
if len(sys.argv) > 1 and sys.argv[1]:
    import ast
    import dataclasses

    over = {}
    for kv in sys.argv[1].split(";"):
        k, v = kv.split(":", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            over[k] = v
    cfg = dataclasses.replace(cfg, **over)
    print("overrides:", over, flush=True)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)

# warmup/compile
out = slam.step_many(state0, batch, intr, cfg)
_ = np.asarray(out[0].t)
print("warm", flush=True)

outdir = "/tmp/jaxprof"
t0 = time.perf_counter()
with jax.profiler.trace(outdir):
    out = slam.step_many(state0, batch, intr, cfg)
    _ = np.asarray(out[0].t)
print(f"traced ({time.perf_counter()-t0:.1f}s) -> {outdir}", flush=True)

for root, _dirs, files in os.walk(outdir):
    for f in files:
        p = os.path.join(root, f)
        print(p, os.path.getsize(p), flush=True)
