"""Interleaved A/B/n benchmark: round-robin the variants for many rounds and
report the MIN per variant.  The axon service throughput fluctuates 2-10x on
~minutes timescales, so consecutive one-shot timings are garbage; the min
over a long interleaved window estimates true device time (healthy moments
hit every variant)."""

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
from hrbffusion3d_tpu.pipeline import slam

ROUNDS = int(os.environ.get("AB_ROUNDS", "14"))

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
print("bootstrap done", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]

VARIANTS = {
    "xla": cfg,
    "pallas": dataclasses.replace(cfg, use_pallas_raycast=True),
    "pallas+compact4": dataclasses.replace(
        cfg, use_pallas_raycast=True, clean_compact_period=4),
}

# warmup/compile all
for name, c in VARIANTS.items():
    t0 = time.perf_counter()
    out = slam.step_many(state0, batch, intr, c)
    _ = np.asarray(out[0].t)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, c in VARIANTS.items():
        t0 = time.perf_counter()
        out = slam.step_many(state0, batch, intr, c)
        _ = np.asarray(out[0].t)
        dt = (time.perf_counter() - t0) * 1000 / NF
        best[name] = min(best[name], dt)
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL " + "  ".join(f"{n}={best[n]:.1f}ms/frame" for n in best),
      flush=True)
