"""Attempt a jax.profiler device trace of step_many through the axon tunnel.

If the remote backend exports device traces, the perfetto dump under
/tmp/jaxtrace gives true in-scan per-op attribution (round-2 priority #1:
the stage-ablation numbers carry dispatch + no-donation copies).  If only
host events come out, fall back to the interleaved-min ablation protocol.
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

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = [slam.FrameInput(*synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr))
          for i in range(8)]
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
batch = slam.FrameInput(depth=jnp.stack([f.depth for f in frames[1:]]),
                        rgb=jnp.stack([f.rgb for f in frames[1:]]))

# warm up / compile outside the trace
out = slam.step_many(state0, batch, intr, cfg)
_ = np.asarray(out[0].t)
print("warm", flush=True)

os.makedirs("/tmp/jaxtrace", exist_ok=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    out = slam.step_many(state0, batch, intr, cfg)
    _ = np.asarray(out[0].t)
print("traced", flush=True)

# summarize what came out
for root, _, files in os.walk("/tmp/jaxtrace"):
    for f in files:
        p = os.path.join(root, f)
        print(f"{os.path.getsize(p):>12d}  {p}", flush=True)
