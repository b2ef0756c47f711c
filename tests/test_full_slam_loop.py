"""Full system with loop closure active: out-and-back sequence revisiting
the start must trigger a verified loop closure through the integrated
pipeline (BASELINE config 2: 'global pose graph on loop closure')."""

import dataclasses

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
    keyframe_period=2,
)


def _out_and_back(n_out=8, step=0.06):
    poses = []
    for i in list(range(n_out)) + list(range(n_out - 2, -1, -1)):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [step * i, 0.0, 0.0]
        poses.append(T)
    return np.stack(poses)


def test_loop_closure_fires_in_pipeline():
    """Replay-mode drift injection through the FULL pipeline: frames are
    rendered at GT but fused/keyframed at incrementally drifted poses
    (globalInputLoadTrajectory semantics).  The return leg revisits the
    start view while genuinely disconnected from it in the covisibility
    graph (the drift exceeds the projection gate), so the loop closer must
    fire and the correction must pull the recorded trajectory back."""
    from hrbffusion3d_tpu.core import lie

    gt = _out_and_back(n_out=6, step=0.12)
    n = gt.shape[0]
    step_xi = jnp.array([0.11, -0.05, 0.045, 0.014, -0.017, 0.022])
    D = np.eye(4, dtype=np.float32)
    drifted = []
    for k in range(n):
        if k >= n - 4:  # drift accrues on the return leg
            D = np.asarray(lie.se3_exp(step_xi), np.float32) @ D
        drifted.append((D @ gt[k]).astype(np.float32))

    scene = synth.default_room()
    sys = FullSLAM(
        INTR, CFG,
        backend_kwargs=dict(fast_threshold=8.0),
        loop_kwargs=dict(min_score=0.05, min_inliers=12, consistency=1),
        init_pose=gt[0],
    )
    for i in range(n):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=float(i),
                    fixed_pose=drifted[i])
    assert len(sys.loop_closures) >= 1, "no loop closure detected"
    err_in = ate.ate_rmse(np.stack(drifted), gt, align=False)
    err_out = ate.ate_rmse(sys.poses(), gt, align=False)
    assert err_in > 0.10, err_in
    # the pose graph cannot know WHERE along the chain the drift accrued,
    # so mid-leg keyframes keep a residual; the closure must still cut the
    # trajectory error substantially
    assert err_out < 0.7 * err_in, (err_in, err_out)


def test_no_loop_without_global_ba():
    cfg = dataclasses.replace(CFG, use_global_ba=False)
    gt = _out_and_back(4)
    scene = synth.default_room()
    sys = FullSLAM(INTR, cfg, backend_kwargs=dict(fast_threshold=8.0),
                   init_pose=gt[0])
    for i in range(gt.shape[0]):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c))
    assert sys.loop_closer is None
    assert len(sys.loop_closures) == 0


def test_process_batch_matches_per_frame():
    """The scan-batched FullSLAM path (process_batch) must produce the same
    trajectory and keyframe set as per-frame process() — batching is a
    dispatch-amortisation detail, not a semantic change."""
    gt = _out_and_back(n_out=4, step=0.08)
    n = gt.shape[0]
    scene = synth.default_room()
    depths, rgbs = [], []
    for i in range(n):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        depths.append(d)
        rgbs.append(c)

    sys_a = FullSLAM(INTR, CFG, backend_kwargs=dict(fast_threshold=8.0),
                     loop_kwargs=dict(min_score=0.05, min_inliers=12, consistency=1),
                     init_pose=gt[0])
    for i in range(n):
        sys_a.process(slam.FrameInput(depth=depths[i], rgb=rgbs[i]),
                      timestamp=float(i))

    sys_b = FullSLAM(INTR, CFG, backend_kwargs=dict(fast_threshold=8.0),
                     loop_kwargs=dict(min_score=0.05, min_inliers=12, consistency=1),
                     init_pose=gt[0])
    batch = slam.FrameInput(depth=jnp.stack(depths), rgb=jnp.stack(rgbs))
    sys_b.process_batch(batch, timestamps=[float(i) for i in range(n)])

    assert len(sys_b.trajectory) == len(sys_a.trajectory)
    assert len(sys_b.backend.keyframes) == len(sys_a.backend.keyframes)
    assert ([k.frame_time for k in sys_b.backend.keyframes]
            == [k.frame_time for k in sys_a.backend.keyframes])
    assert sys_b.kf_of_frame == sys_a.kf_of_frame
    # poses agree only approximately: scan-vs-single XLA fusion roundoff
    # flips discrete fuse winners (NOTES_R1), which perturbs tracking at
    # the mm-cm level; cadence/tagging above must be EXACT
    np.testing.assert_allclose(sys_b.poses(), sys_a.poses(), atol=0.03)
