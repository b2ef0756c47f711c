"""CPU ATE sensitivity of raycast cost knobs (bisection iters, prediction
window) before adopting them as perf defaults.  Synthetic 25-frame orbit,
XLA raycast path (same ladder/bisection semantics as the Pallas kernel)."""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
BASE = small_test_config(
    map_capacity=1 << 16,
    pyramid_iterations=(10, 5, 4),
    so3_iterations=10,
    predict_conf_threshold=0.2,
)

VARIANTS = {
    "default": {},
    "bisect6": {"raycast_bisection_iters": 6},
    "bisect4": {"raycast_bisection_iters": 4},
    "window2": {"predict_window_multiplier": 2},
    "window2+bisect6": {"predict_window_multiplier": 2,
                        "raycast_bisection_iters": 6},
    "rayperiod2": {"raycast_period": 2},
    "rayperiod4": {"raycast_period": 4},
    "reassoc2": {"tracking_reassoc_period": 2},
    "reassoc3": {"tracking_reassoc_period": 3},
    "reassoc2+bisect6": {"tracking_reassoc_period": 2,
                         "raycast_bisection_iters": 6},
    "rgbnearest": {"tracking_rgb_nearest": True},
    "fp3": {"raycast_false_position": 3},
    "rgbnearest+fp3": {"tracking_rgb_nearest": True,
                       "raycast_false_position": 3},
    "rgbnearest+fp3+bisect6": {"tracking_rgb_nearest": True,
                               "raycast_false_position": 3,
                               "raycast_bisection_iters": 6},
}
if os.environ.get("ATE_VARIANTS"):
    keep = os.environ["ATE_VARIANTS"].split(",")
    VARIANTS = {k: v for k, v in VARIANTS.items() if k in keep or k == "default"}


def run(cfg):
    n = 25
    gt = synth.orbit_trajectory(n, angle_per_frame=0.01)
    scene = synth.default_room()

    def frames():
        for i in range(n):
            d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
            yield slam.FrameInput(depth=d, rgb=c)

    state, est = slam.run_sequence(frames(), INTR, cfg, init_pose=gt[0])
    return ate.ate_rmse(est, gt, align=False), int(state.map.count)


for name, over in VARIANTS.items():
    cfg = dataclasses.replace(BASE, **over)
    err, cnt = run(cfg)
    print(f"{name:18s} ATE {err*1000:7.2f} mm   surfels {cnt}", flush=True)
