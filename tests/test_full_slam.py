"""Full-system test: dense tracking + keyframes + local BA + dense-map
correction on a synthetic sequence (BASELINE config 2 protocol,
synthetic stand-in)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(
    map_capacity=1 << 16,
    pyramid_iterations=(10, 5, 4),
    so3_iterations=10,
    predict_conf_threshold=0.2,
    keyframe_period=8,
)


def _run(n_frames, cfg=CFG, **backend_kwargs):
    gt = synth.orbit_trajectory(n_frames, angle_per_frame=0.004)
    scene = synth.default_room()
    sys = FullSLAM(INTR, cfg, backend_kwargs=dict(fast_threshold=8.0, **backend_kwargs),
                   init_pose=gt[0])
    for i in range(n_frames):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=i / 30.0)
    return sys, gt


def test_full_slam_with_ba(tmp_path):
    n = 26
    sys, gt = _run(n)
    est = sys.poses()
    err = ate.ate_rmse(est, gt, align=False)
    # the e2e ATE at this toy resolution sits in a +-3 mm fp-chaos band:
    # bit-level perturbations flip discrete fuse winners and compound
    # (measured r3: a 1e-8 icp_weight nudge moves the 640x480 orbit ATE
    # 0.26 mm; the 128x96 harness amplifies subpixel effects ~5x, and the
    # same build reads 22.1 mm under 1 CPU device vs 25.7 mm under the
    # suite's 8 virtual devices).  The bound checks BA keeps the system in
    # the centimetre band, not a precision regression.
    assert err < 0.030, err
    # keyframes were created at the configured cadence
    assert len(sys.backend.keyframes) >= 3
    # artifacts export (savePly / SaveTrajectory parity)
    tum = str(tmp_path / "traj.freiburg")
    sys.save_trajectory_tum(tum)
    from hrbffusion3d_tpu.io import traj as trajio

    ts, poses = trajio.load_tum(tum)
    assert poses.shape[0] == n
    ply_path = str(tmp_path / "map.ply")
    n_pts = sys.save_map_ply(ply_path)
    assert n_pts > 3000


def test_full_slam_dense_map_follows_correction():
    """After a BA correction, surfels must stay registered to the scene:
    re-predicting from the corrected pose still matches the rendered depth."""
    sys, gt = _run(18)
    state = sys.state
    import jax

    from hrbffusion3d_tpu.core import lie
    from hrbffusion3d_tpu.map import surfel_map as sm
    from hrbffusion3d_tpu.ops import raycast

    pose = np.asarray(lie.rt_to_mat(state.R, state.t))
    scene = synth.default_room()
    d_render, _ = synth.render_frame_jit(scene, jnp.asarray(sys.poses()[-1]), INTR)
    pose_inv = jnp.asarray(np.linalg.inv(pose))
    idx = sm.render_index(state.map, pose_inv, INTR)
    pred = raycast.predict_hrbf(state.map, pose_inv, idx, INTR, CFG, chunk=4096)
    found = np.asarray(pred.found)
    d = np.asarray(d_render)
    mask = found & (d > 0.3)
    err = np.abs(np.asarray(pred.vertex[..., 2]) - d)[mask]
    assert np.median(err) < 0.02, np.median(err)


def test_full_slam_async_ba():
    """Pipeline-parallel mode: keyframe processing + BA run in a worker
    thread (the reference BLOCKS tracking on LocalMapping,
    HRBFFusion.cpp:1154-1157); corrections apply at frame boundaries and
    accuracy stays comparable to the synchronous path."""
    n = 26
    gt = synth.orbit_trajectory(n, angle_per_frame=0.004)
    scene = synth.default_room()
    sys = FullSLAM(INTR, CFG, backend_kwargs=dict(fast_threshold=8.0),
                   init_pose=gt[0], async_ba=True)
    for i in range(n):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=i / 30.0)
    sys.join_backend()

    est = sys.poses()
    err = ate.ate_rmse(est, gt, align=False)
    assert err < 0.03, err
    # the worker actually processed keyframes and produced corrections
    assert len(sys.backend.keyframes) >= 3
    assert sys.async_corrections >= 1
    assert sys._inflight == 0
