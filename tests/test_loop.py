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
    lc = LoopCloser(be, min_score=0.05, min_inliers=15)
    gt = _out_and_back_poses()
    drift = np.asarray(
        lie.se3_exp(jnp.array([0.10, -0.06, 0.05, 0.015, -0.02, 0.025])),
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
