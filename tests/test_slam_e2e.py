"""End-to-end frame-to-model SLAM on a synthetic sequence — the minimum
viable slice of SURVEY §7.2 (M0-M4): tracking + fusion + HRBF prediction,
ATE asserted against ground truth (BASELINE config 1 protocol, synthetic
stand-in for TUM fr1/desk)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(
    map_capacity=1 << 16,
    pyramid_iterations=(10, 5, 4),
    so3_iterations=10,
    predict_conf_threshold=0.2,
)


def _frames(poses):
    scene = synth.default_room()
    for i in range(poses.shape[0]):
        d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), INTR)
        yield slam.FrameInput(depth=d, rgb=c)


def test_short_sequence_ate():
    n = 25
    gt = synth.orbit_trajectory(n, angle_per_frame=0.004)
    state, est = slam.run_sequence(_frames(gt), INTR, CFG, init_pose=gt[0])
    err = ate.ate_rmse(est, gt, align=False)
    # frame-to-model tracking at 128x96 with the reference's curvature-
    # weighted ICP: ~1.5 cm jitter, no systematic drift (unweighted ICP
    # gives ~0.6 cm; the weighting emphasises high-curvature silhouettes).
    # Bound includes the measured fp-chaos band (bit-level perturbations
    # move this harness's ATE by +-2 mm, see NOTES_R3): 0.021 observed on
    # this host at r2 HEAD and r3 alike.
    assert err < 0.025, err
    # map grew and stays bounded
    cnt = int(state.map.count)
    assert 3000 < cnt < CFG.map_capacity
    # prediction covers most of the image by the end
    assert float(state.dense_frac) > 0.5
    # tracking found plenty of inliers at the last frame
    assert float(state.last_icp_count) > 2000


def test_static_camera_sequence():
    """Static camera: pose must stay put and confidence must grow."""
    gt = np.tile(np.eye(4, dtype=np.float32)[None], (6, 1, 1))
    state, est = slam.run_sequence(_frames(gt), INTR, CFG, init_pose=gt[0])
    err = ate.ate_rmse(est, gt, align=False)
    # nearest-pixel photometric (the reference-parity default) quantises
    # the residual per pixel: a few-mm wobble at this 5x-coarse 128x96
    # fixture (sub-0.1 px); bilinear mode holds < 1 mm here but measured
    # 5x worse ATE at native 640x480 (scripts/tpu_ate.py)
    assert err < 4e-3, err
    conf_mean = float(jnp.sum(state.map.conf * state.map.valid) / state.map.count)
    assert conf_mean > 0.5


def test_step_many_matches_sequential():
    """The scan-batched stepping path (used by bench.py) must match
    sequential slam.step frame for frame."""
    n = 4
    gt = synth.orbit_trajectory(n)
    scene = synth.default_room()
    frames = []
    for i in range(n):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        frames.append(slam.FrameInput(depth=d, rgb=c))
    state0 = slam.bootstrap(frames[0], INTR, CFG, init_pose=gt[0])

    seq = state0
    for f in frames[1:]:
        seq = slam.step(seq, f, INTR, CFG)

    batch = slam.FrameInput(
        depth=jnp.stack([f.depth for f in frames[1:]]),
        rgb=jnp.stack([f.rgb for f in frames[1:]]),
    )
    scanned, ts = slam.step_many(state0, batch, INTR, CFG)

    # scan and sequential stepping are the same MATH but not the same fp
    # schedule: XLA fuses/reorders differently inside the scan body, one
    # flipped fuse winner reorders later associations, and the difference
    # compounds (NOTES_R2 measured "poses to 3 cm" over longer chunks;
    # observed here ~1.7 mm over 3 frames, environment-dependent).  The
    # assertion checks behavioral equivalence at the few-mm level.
    np.testing.assert_allclose(np.asarray(scanned.t), np.asarray(seq.t), atol=5e-3)
    np.testing.assert_allclose(np.asarray(scanned.R), np.asarray(seq.R), atol=5e-3)
    assert abs(int(scanned.map.count) - int(seq.map.count)) < 100
    assert ts.shape == (n - 1, 3)


def test_raycast_period_tracks():
    # HRBF raycast every 2nd frame, splat prediction in between
    # (raycast_period; combinedPredict alternative path on off-frames)
    import dataclasses

    cfg = dataclasses.replace(CFG, raycast_period=2)
    n = 8
    gt = synth.orbit_trajectory(n, angle_per_frame=0.01)
    state, est = slam.run_sequence(_frames(gt), INTR, cfg, init_pose=gt[0])
    err = ate.ate_rmse(est, gt, align=False)
    assert err < 0.03, err
    assert float(state.dense_frac) > 0.5


def test_capacity_invariance():
    """Trajectories are independent of the map-capacity bucket (dead rows
    never influence live outputs — grow()'s invariant; the bench uses a
    non-power-of-2 1.5x bucket)."""
    import dataclasses

    gt = synth.orbit_trajectory(5, angle_per_frame=0.004)
    # both buckets must exceed the live count (~10k) — a saturated bucket
    # legitimately drops appends, like the reference's full VBO
    cfg_a = dataclasses.replace(CFG, map_capacity=1 << 15)
    cfg_b = dataclasses.replace(CFG, map_capacity=3 * (1 << 13))  # 24576
    _, est_a = slam.run_sequence(_frames(gt), INTR, cfg_a, init_pose=gt[0],
                                 grow=False)
    _, est_b = slam.run_sequence(_frames(gt), INTR, cfg_b, init_pose=gt[0],
                                 grow=False)
    np.testing.assert_allclose(est_a, est_b, atol=1e-7)
