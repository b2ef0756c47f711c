"""Real-drift loop-closure regression (VERDICT r3 next-3): on a Kinect-noisy
panorama the tracking drift accrues through the REAL pipeline (no injected
drift, unlike test_full_slam_loop), covisibility breaks on the heading
sweep, and at PARITY consistency=3 (mnCovisibilityConsistencyTh,
LoopClosing.cc:169) the closure must fire and the full system must beat the
dense-only twin's ATE.

Heavy e2e (~9 min CPU): the probe that tuned the protocol is
scripts/loop_drift_probe.py (same parameters).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

N = 100
NOISE_SCALE = 3.0
W, H = 128, 96
INTR = CameraIntrinsics(fx=0.8 * W, fy=0.8 * W, cx=W / 2 - 0.5,
                        cy=H / 2 - 0.5, width=W, height=H)
CFG = small_test_config(
    map_capacity=1 << 17,
    pyramid_iterations=(10, 5, 4),
    so3_iterations=10,
    predict_conf_threshold=0.2,
    keyframe_period=2,
)


def _run(use_backend: bool):
    scene = synth.complex_room()
    gt = synth.panorama_trajectory(N, n_turns=1.3)
    cfg = CFG if use_backend else dataclasses.replace(
        CFG, use_local_ba=False, use_global_ba=False)
    sys_ = FullSLAM(INTR, cfg, backend_kwargs=dict(fast_threshold=8.0),
                    loop_kwargs=dict(consistency=3),  # parity gate
                    init_pose=gt[0])
    for i in range(N):
        d, c = synth.render_frame_kinect_jit(
            scene, jnp.asarray(gt[i]), INTR, jax.random.PRNGKey(77 + i),
            NOISE_SCALE)
        sys_.process(slam.FrameInput(depth=d, rgb=c), timestamp=float(i))
    err = ate.ate_rmse(sys_.poses(), gt, align=False)
    return err, sys_


def test_real_drift_closure_improves_ate():
    err_dense, _ = _run(False)
    err_full, sys_full = _run(True)
    # drift is real and substantial on the dense-only twin
    assert err_dense > 0.03, err_dense
    # the closure fired through the parity-consistency gate
    assert len(sys_full.loop_closures) >= 1
    # and the backend cut the trajectory error (measured 0.885x under
    # pytest's conftest env, 0.73x standalone — the margin rides the
    # deterministic CPU fp schedule, so 0.95 is a stable gate)
    assert err_full < 0.95 * err_dense, (err_dense, err_full)
