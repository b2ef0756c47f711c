"""Interleaved A/B batch 3: joint-gather tracking e2e + raycast tapstack."""

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
from hrbffusion3d_tpu.ops import pallas_kernels, raycast
from hrbffusion3d_tpu.pipeline import slam



def _tiny_leaf(out):
    """Sync target: the SMALLEST leaf. Syncing on tree.leaves(out)[0] pulls
    state.map.data (48 MB at 512k cap) through the ~30 MB/s tunnel and adds
    ~1.5 s/call — it inflated every ab3/ab4 absolute number by ~215 ms/frame."""
    import jax as _jax
    return min(_jax.tree.leaves(out), key=lambda l: getattr(l, "size", 1))

ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2)
cfg_best = dataclasses.replace(cfg, use_pallas_raycast=True,
                               clean_compact_period=4)

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

# standalone predict inputs
m = state0.map
pose_inv = jnp.asarray(np.linalg.inv(poses[0]).astype(np.float32))
idx = jax.jit(lambda: sm.render_index(m, pose_inv, intr))()
attr = jax.jit(lambda: sm.render_attr_image(m, idx, pose_inv))()
attr9 = attr[..., [0, 1, 2, 3, 4, 5, sm.A_CONF, sm.A_RADIUS, sm.A_VALID]]

core_ts = jax.jit(lambda a: pallas_kernels.raycast_core(a, intr, cfg, tapstack=True))
core_nts = jax.jit(lambda a: pallas_kernels.raycast_core(a, intr, cfg, tapstack=False))

VARIANTS = {
    "step xla+joint": lambda: slam.step_many(state0, batch, intr, cfg),
    "step best+joint": lambda: slam.step_many(state0, batch, intr, cfg_best),
    "raycast_core tapstack": lambda: core_ts(attr9),
    "raycast_core old": lambda: core_nts(attr9),
}
DIV = {"step xla+joint": NF, "step best+joint": NF,
       "raycast_core tapstack": 1, "raycast_core old": 1}

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
