"""Interleaved A/B batch 18: fused multi-channel pyramid construction
(one depth pass + one intensity pass + one pooled map pass per level,
was ~20 per-map ops).  Compare vs ab17's bench=77.5 @ canary 35.1.
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
from hrbffusion3d_tpu.pipeline import slam


def _tiny_leaf(out):
    return min(jax.tree.leaves(out), key=lambda l: getattr(l, "size", 1))


ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
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

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]

key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (1 << 20, 24))
idx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
canary = jax.jit(lambda t, i: t[i].sum(0))

VARIANTS = {
    "canary gather1M": lambda: canary(tbl, idx),
    "step bench": lambda: slam.step_many(state0, batch, intr, cfg),
}
DIV = {n: (1 if n.startswith("canary") else NF) for n in VARIANTS}

for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    out = fn()
    _ = np.asarray(_tiny_leaf(out))
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(_tiny_leaf(out))
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / DIV[name])
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL", flush=True)
for n in best:
    print(f"  {n:24s} {best[n]:8.1f} ms", flush=True)
