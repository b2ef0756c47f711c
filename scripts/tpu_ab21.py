"""Interleaved A/B batch 21: raycast Pallas block height 16 vs 24 vs 32
(per-block fixed costs vs VMEM pressure; 480 % BH == 0 required).
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


def _tiny_leaf(out):
    return min(jax.tree.leaves(out), key=lambda l: getattr(l, "size", 1))


ROUNDS = int(os.environ.get("AB_ROUNDS", "10"))

intr = TUM1
cfg = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4,
                 raycast_block_height=16, raycast_bisection_iters=6,
                 raycast_false_position=3, clean_crowd_period=4)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
print("bootstrap done", flush=True)


import dataclasses

b7 = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:8]]),
    rgb=jnp.stack([f.rgb for f in frames[1:8]]))
cfg24 = dataclasses.replace(cfg, raycast_block_height=24)
cfg32 = dataclasses.replace(cfg, raycast_block_height=32)

key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (1 << 20, 24))
idx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
canary = jax.jit(lambda t, i: t[i].sum(0))

VARIANTS = {
    "canary gather1M": (lambda: canary(tbl, idx), 1),
    "step bh16": (lambda: slam.step_many(state0, b7, intr, cfg), 7),
    "step bh24": (lambda: slam.step_many(state0, b7, intr, cfg24), 7),
    "step bh32": (lambda: slam.step_many(state0, b7, intr, cfg32), 7),
}

for name, (fn, _d) in VARIANTS.items():
    t0 = time.perf_counter()
    out = fn()
    _ = np.asarray(_tiny_leaf(out))
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, (fn, d) in VARIANTS.items():
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(_tiny_leaf(out))
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / d)
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL", flush=True)
for n in best:
    print(f"  {n:24s} {best[n]:8.1f} ms", flush=True)
