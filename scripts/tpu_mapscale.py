"""Map-scale sweep (VERDICT r2 next-3): dense-step ms/frame at 384k / 768k
/ 1.5M / 3M surfel capacity with the map filled to ~70% LIVE surfels, on
the real chip.  The reference budgets 21.1M surfels (GlobalModel.cpp:21-22);
every fuse/clean/render op here costs by STATIC capacity, so this measures
how the per-frame budget degrades as the map grows — the honest
steady-state number the 384k bench cannot show.

The live fill tiles the warmed-up bench map with small world-space jitter
(distinct surfels, same spatial statistics); submap ids cycle over the
active set so render/clean masks stay representative.

Env: MS_CAPS (comma list, default "393216,786432,1572864,3145728"),
     MS_ROUNDS (default 6).
"""

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

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.pipeline import slam

CAPS = [int(c) for c in os.environ.get(
    "MS_CAPS", "393216,786432,1572864,3145728").split(",")]
ROUNDS = int(os.environ.get("MS_ROUNDS", "6"))
EXTRA = os.environ.get("MS_EXTRA", "")   # e.g. "tracking_patch_assoc:True"

intr = TUM1
BASE = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                  use_pallas_raycast=True, clean_compact_period=4,
                  raycast_block_height=16, raycast_bisection_iters=6,
                  raycast_false_position=3, clean_crowd_period=4)
if EXTRA:
    import ast

    over = {}
    for kv in EXTRA.split(";"):
        k, v = kv.split(":", 1)
        over[k] = ast.literal_eval(v)
    BASE = dataclasses.replace(BASE, **over)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]))
NF = batch.depth.shape[0]

state0 = slam.bootstrap(frames[0], intr, BASE, init_pose=poses[0])
state0, _ = slam.step_many(state0, batch, intr, BASE)
base_data = np.asarray(state0.map.data)
base_n = int(state0.map.count)
print(f"seed map: {base_n} live surfels", flush=True)
rng = np.random.default_rng(0)


def filled_state(cap: int, cfg: SLAMConfig) -> slam.SLAMState:
    """State with a cap-capacity map filled to ~70% live by jittered tiles
    of the seed map."""
    target = int(cap * 0.7)
    reps = -(-target // base_n)
    tiles = []
    for r in range(reps):
        t = base_data[:base_n].copy()
        if r:
            t[:, 0:3] += rng.normal(0, 0.02, (base_n, 3)).astype(np.float32)
            # keep them fusable/cleanable but distinct; cycle submap ids
            t[:, sm.SUBMAP] = (t[:, sm.SUBMAP] + r) % 8
        tiles.append(t)
    live = np.concatenate(tiles)[:target]
    data = np.zeros((cap, base_data.shape[1]), np.float32)
    data[:target] = live
    data[:target, sm.VALID] = 1.0
    m = sm.SurfelMap(data=jnp.asarray(data), count=jnp.int32(target))
    return state0._replace(map=m)


for cap in CAPS:
    cfg = dataclasses.replace(BASE, map_capacity=cap)
    st = filled_state(cap, cfg)
    t0 = time.perf_counter()
    out, _ = slam.step_many(st, batch, intr, cfg)
    _ = np.asarray(out.t)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out, _ = slam.step_many(st, batch, intr, cfg)
        _ = np.asarray(out.t)
        best = min(best, (time.perf_counter() - t0) * 1000 / NF)
    print(f"cap {cap:8d}  live {int(st.map.count):8d}  "
          f"{best:7.1f} ms/frame  ({1000/best:5.2f} fps)  "
          f"[compile+1st {compile_s:.0f}s]", flush=True)
