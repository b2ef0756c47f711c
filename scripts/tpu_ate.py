"""Full-resolution (640x480) ATE sensitivity on the real chip: the CPU
harness (scripts/ate_sensitivity.py) runs at 128x96 where subpixel effects
are ~5x amplified; dials that trade subpixel interpolation (e.g.
tracking_rgb_nearest) need the native-resolution number.

Runs the scan-batched pipeline over a 25-frame synthetic orbit per variant
and prints ATE RMSE vs ground truth.  Graphs are shared with tpu_ab15
(compile cache).
"""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam

intr = TUM1
# capacity matches scripts/tpu_ab.py so the step_many graphs share the
# compile cache (early rounds used 1<<19; the orbit peaks well under both)
BASE = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                  use_pallas_raycast=True, clean_compact_period=4,
                  raycast_block_height=16, raycast_bisection_iters=6,
                  raycast_false_position=3, clean_crowd_period=4)

VARIANTS = {
    "base": {},                     # == bench config (nearest+fp3 defaults)
    "bilinear": {"tracking_rgb_nearest": False},
    "window2": {"predict_window_multiplier": 2},
    "rayperiod2": {"raycast_period": 2},
    "crowd2": {"clean_crowd_period": 2},
    "crowd4": {"clean_crowd_period": 4},
    "eps1e-5": {"tracking_converge_eps": 1e-5},
    "eps3e-5": {"tracking_converge_eps": 3e-5},
    "sub2f3": {"tracking_subsample": 2},
    "sub2f2": {"tracking_subsample": 2, "tracking_subsample_full_iters": 2},
    "sub2f1": {"tracking_subsample": 2, "tracking_subsample_full_iters": 1},
    "sub3f3": {"tracking_subsample": 3},
    "crowd8": {"clean_crowd_period": 8},
    "compact8": {"clean_compact_period": 8},
    "reassoc2": {"tracking_reassoc_period": 2},
    "iters854": {"pyramid_iterations": (8, 5, 4)},
    "iters754": {"pyramid_iterations": (7, 5, 4)},
    "iters654": {"pyramid_iterations": (6, 5, 4)},
    "reassoc2+854": {"tracking_reassoc_period": 2,
                     "pyramid_iterations": (8, 5, 4)},
    # round-3 fast drivers (VERDICT r2 next-1b/1c)
    "patch": {"tracking_patch_assoc": True},
    "patch_r2": {"tracking_patch_assoc": True, "tracking_patch_radius": 2},
    "topk150": {"tracking_topk": 153600, "tracking_topk_full_iters": 2},
    "topk128": {"tracking_topk": 131072, "tracking_topk_full_iters": 2},
    "combo": {"tracking_patch_assoc": True, "tracking_topk": 153600,
              "tracking_topk_full_iters": 2},
    # chaos probes: mathematically negligible perturbations (1e-8 relative
    # weight nudge) — they measure the e2e ATE's sensitivity floor to ANY
    # fp-level change (discrete fuse winners / rounding flips compound)
    "wnudge": {"icp_weight": 10.0000002},
    "wnudge2": {"icp_weight": 10.0000004},
}
if os.environ.get("ATE_VARIANTS"):
    keep = os.environ["ATE_VARIANTS"].split(",")
    VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep or k == "base"}

N = 22  # 1 bootstrap + 3 chained 7-frame scans (the ab15-cached graphs)
B = 7
gt = synth.orbit_trajectory(N, angle_per_frame=0.01)
scene = synth.default_room()
frames = []
for i in range(N):
    d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
batches = [
    slam.FrameInput(
        depth=jnp.stack([f.depth for f in frames[1 + k * B:1 + (k + 1) * B]]),
        rgb=jnp.stack([f.rgb for f in frames[1 + k * B:1 + (k + 1) * B]]))
    for k in range((N - 1) // B)
]
print("frames rendered", flush=True)

for name, over in VARIANTS.items():
    cfg = dataclasses.replace(BASE, **over)
    state = slam.bootstrap(frames[0], intr, cfg, init_pose=gt[0])
    ts_all = []
    for b in batches:
        state, ts = slam.step_many(state, b, intr, cfg)
        ts_all.append(np.asarray(ts))
    ts = np.concatenate(ts_all)
    est = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    est[0] = gt[0]
    # translation-only ATE (rotations follow translations on this orbit)
    est[1:, :3, 3] = ts
    err = ate.ate_rmse(est, gt, align=False)
    print(f"{name:14s} ATE {err*1000:7.2f} mm   surfels {int(state.map.count)}",
          flush=True)
