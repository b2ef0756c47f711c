"""Curvature-aware correspondence search (registrationICPUseCoorespondenceSearch,
reduce.cu:349-430) — config-gated off by default; verify the gated path
tracks comparably when enabled."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(
    map_capacity=1 << 16,
    pyramid_iterations=(6, 4, 3),
    predict_conf_threshold=0.2,
    icp_use_correspondence_search=True,
    icp_search_radius=1,
)


def test_correspondence_search_tracks():
    n = 8
    gt = synth.orbit_trajectory(n, angle_per_frame=0.004)
    scene = synth.default_room()

    def frames():
        for i in range(n):
            d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
            yield slam.FrameInput(depth=d, rgb=c)

    state, est = slam.run_sequence(frames(), INTR, CFG, init_pose=gt[0])
    err = ate.ate_rmse(est, gt, align=False)
    assert err < 0.03, err
    assert float(state.last_icp_count) > 2000
