"""Loop-closure tests: BoW retrieval, geometric verification, pose-graph +
global-BA correction (LoopClosing::DetectLoop/ComputeSim3/CorrectLoop
semantics)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.backend import bow
from hrbffusion3d_tpu.backend.keyframes import SparseBackend
from hrbffusion3d_tpu.backend.loop import LoopCloser
from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import pyramid

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config()


def _frame(pose):
    scene = synth.default_room()
    d, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    return d, pyramid.rgb_to_intensity(rgb)


def _out_and_back_poses(n_out=4):
    """Poses that walk sideways and come back: last pose == first pose."""
    poses = []
    for i in list(range(n_out)) + list(range(n_out - 2, -1, -1)):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.25 * i, 0.0, 0.0]
        poses.append(T)
    return poses


def test_bow_self_similarity():
    d0, i0 = _frame(np.eye(4, dtype=np.float32))
    from hrbffusion3d_tpu.backend import features

    kp = features.detect_and_describe(i0, threshold=8.0)
    v = bow.bow_vector(kp.desc, kp.valid)
    s = bow.l1_score(v, v[None, :])
    np.testing.assert_allclose(float(s[0]), 1.0, atol=1e-5)


def test_bow_discriminates_views():
    pose_far = np.eye(4, dtype=np.float32)
    pose_far[:3, 3] = [1.2, 0.0, -0.5]
    from hrbffusion3d_tpu.backend import features

    _, i0 = _frame(np.eye(4, dtype=np.float32))
    _, i0b = _frame(np.eye(4, dtype=np.float32) + np.diag([0, 0, 0, 0]).astype(np.float32))
    _, ifar = _frame(pose_far)
    k0 = features.detect_and_describe(i0, threshold=8.0)
    k0b = features.detect_and_describe(i0b, threshold=8.0)
    kfar = features.detect_and_describe(ifar, threshold=8.0)
    v0 = bow.bow_vector(k0.desc, k0.valid)
    v0b = bow.bow_vector(k0b.desc, k0b.valid)
    vfar = bow.bow_vector(kfar.desc, kfar.valid)
    same = float(bow.l1_score(v0, v0b[None, :])[0])
    diff = float(bow.l1_score(v0, vfar[None, :])[0])
    assert same > diff + 0.1, (same, diff)


def test_loop_detect_and_correct():
    """Out-and-back walk with drift injected on the return leg: the loop
    closure against the (identical-view) first keyframe must cut the final
    keyframe's error substantially."""
    be = SparseBackend(INTR, CFG, fast_threshold=8.0)
    lc = LoopCloser(be, min_score=0.05, min_inliers=15, consistency=1)
    gt = _out_and_back_poses()
    # drift large enough that projection-gated association cannot silently
    # re-absorb it (0.25 m ~ 13 px at this toy focal length; the realistic
    # 640x480 equivalent of ~0.05 m)
    drift = np.asarray(
        lie.se3_exp(jnp.array([0.25, -0.12, 0.10, 0.03, -0.04, 0.05])),
        np.float32,
    )
    cands = []
    for k, gt_pose in enumerate(gt):
        est = gt_pose if k < len(gt) - 2 else (drift @ gt_pose).astype(np.float32)
        d, i = _frame(gt_pose)
        kf_id = be.insert_keyframe(i, d, est, time=k * 10 + 1)
        cands.append(lc.add_keyframe(kf_id))

    last = len(gt) - 1
    cand = cands[-1]
    assert cand is not None, "loop not detected"
    assert cand.match_kf == 0
    assert cand.n_inliers >= 15

    before = np.linalg.norm(be.keyframes[last].pose[:3, 3] - gt[last][:3, 3])
    deltas = lc.correct(cand)
    after = np.linalg.norm(be.keyframes[last].pose[:3, 3] - gt[last][:3, 3])
    assert before > 0.08
    assert after < 0.5 * before, (before, after)
    assert deltas.shape[0] == len(be.keyframes)
    # early keyframes essentially untouched
    assert np.linalg.norm(deltas[0][:3, 3]) < 0.02


def test_loop_edge_convention():
    """robust_se3_3d3d(p_query, p_match) must return exactly
    Z = pose_match^-1 @ pose_query (the essential-graph measurement)."""
    from hrbffusion3d_tpu.backend.loop import robust_se3_3d3d

    rng = np.random.default_rng(1)
    pose_q = np.asarray(lie.se3_exp(jnp.array([0.3, -0.1, 0.2, 0.1, 0.2, -0.05])))
    pose_m = np.asarray(lie.se3_exp(jnp.array([-0.2, 0.4, 0.0, -0.1, 0.05, 0.1])))
    X = rng.uniform(-1, 1, (50, 3)).astype(np.float64)
    X[:, 2] += 3
    p_q = (X - pose_q[:3, 3]) @ pose_q[:3, :3]
    p_m = (X - pose_m[:3, 3]) @ pose_m[:3, :3]
    T, n = robust_se3_3d3d(p_q, p_m)
    assert n == 50
    np.testing.assert_allclose(T, np.linalg.inv(pose_m) @ pose_q, atol=1e-5)


def _run_sequence(consistency, n_out=5):
    """Out-and-back with a drifted return leg; returns keyframe indices at
    which a loop candidate fired."""
    be = SparseBackend(INTR, CFG, fast_threshold=8.0)
    lc = LoopCloser(be, min_score=0.05, min_inliers=15,
                    consistency=consistency)
    gt = _out_and_back_poses(n_out=n_out)
    drift = np.asarray(
        lie.se3_exp(jnp.array([0.25, -0.12, 0.10, 0.03, -0.04, 0.05])),
        np.float32,
    )
    fired = []
    for k, gt_pose in enumerate(gt):
        est = gt_pose if k < n_out else (drift @ gt_pose).astype(np.float32)
        d, i = _frame(gt_pose)
        kf_id = be.insert_keyframe(i, d, est, time=k * 10 + 1)
        if lc.add_keyframe(kf_id) is not None:
            fired.append(k)
    return fired


def test_consistency_gate_delays_detection():
    """With consistency=2 a loop must NOT fire on the first re-visit
    detection, only once the candidate group has been re-detected on a
    second consecutive keyframe (LoopClosing.cc:169-234)."""
    fired1 = _run_sequence(consistency=1)
    fired2 = _run_sequence(consistency=2)
    assert fired1, "loop never fired even with repeated revisits"
    assert fired2, "consistency=2 suppressed the loop entirely"
    assert fired2[0] > fired1[0], (fired1, fired2)


def test_two_loops_sequential_correction():
    """Two out-and-back excursions with drift injected on each return leg:
    each closure must reduce the revisiting keyframe's position error, and
    the second correction must not undo the first (the essential graph keeps
    the first loop's edge)."""
    be = SparseBackend(INTR, CFG, fast_threshold=8.0)
    lc = LoopCloser(be, min_score=0.05, min_inliers=15, consistency=1)
    # walk out +x and back, then out +x again and back (revisits origin twice)
    steps = [0, 1, 2, 3, 2, 1, 0, 1, 2, 3, 2, 1, 0]
    gt = []
    for s in steps:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.25 * s, 0.0, 0.0]
        gt.append(T)
    # incremental drift accumulating along each return leg (real tracking
    # drift grows per frame; a step jump would be unattributable for ANY
    # pose-graph optimiser)
    # ~0.18 m per keyframe: large enough that projection-gated association
    # breaks (drift below the gate is silently absorbed by re-association,
    # which is correct behaviour — no loop closure is needed then)
    step1 = jnp.array([0.15, -0.07, 0.06, 0.018, -0.022, 0.028])
    step2 = jnp.array([-0.13, 0.09, -0.07, -0.020, 0.018, -0.026])
    D = np.eye(4, dtype=np.float32)

    errs_after = []
    for k, gt_pose in enumerate(gt):
        if 4 <= k <= 5:
            D = np.asarray(lie.se3_exp(step1), np.float32) @ D
        elif 10 <= k <= 11:
            D = np.asarray(lie.se3_exp(step2), np.float32) @ D
        est = (D @ gt_pose).astype(np.float32)
        d, i = _frame(gt_pose)
        kf_id = be.insert_keyframe(i, d, est, time=k * 10 + 1)
        cand = lc.add_keyframe(kf_id)
        if cand is not None:
            before = np.linalg.norm(be.keyframes[kf_id].pose[:3, 3] - gt_pose[:3, 3])
            lc.correct(cand, run_global_ba=False)
            after = np.linalg.norm(be.keyframes[kf_id].pose[:3, 3] - gt_pose[:3, 3])
            if before > 0.02:
                assert after < before, (k, before, after)
            errs_after.append(after)
            # the tracker continues from the corrected pose
            D = (be.keyframes[kf_id].pose @ np.linalg.inv(gt_pose)).astype(np.float32)
    assert len(lc.loop_edges) >= 2, "second loop closure never fired"
    # after the final correction the whole trajectory should be near GT
    # (well below the ~0.35 m accumulated drift of each excursion)
    final_err = max(
        np.linalg.norm(be.keyframes[k].pose[:3, 3] - gt[k][:3, 3])
        for k in range(len(gt)))
    assert final_err < 0.15, final_err
