"""Equivalence + convergence tests for the finest-level fast tracking
drivers: bounded-displacement patch association (cfg.tracking_patch_assoc)
and saliency top-k pixel selection (cfg.tracking_topk).

The patch path must reproduce the re-gathered association exactly wherever
the rounded warp stays inside the anchor window (ops/icp.joint_step_patch);
with the small inter-frame motions of the two-frame fixture every pixel
stays in-window, so the estimated poses must agree to f32 wobble.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import icp as icp_ops
from hrbffusion3d_tpu.ops import preprocess, pyramid
from hrbffusion3d_tpu.tracking import odometry

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                        width=128, height=96)
CFG = small_test_config(pyramid_iterations=(10, 5, 4), so3_iterations=10)


def _make_frame(pose, cfg):
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, cfg)
    intensity = pyramid.rgb_to_intensity(rgb)
    curv = None
    if cfg.tracking_topk > 0:
        curv = preprocess.curvature_gradient(pre, INTR, cfg,
                                             chunk=cfg.curvature_chunk)
    return depth, intensity, pre, curv


def _track_pair(pose0, pose1, cfg):
    d0, i0, pre0, _ = _make_frame(pose0, cfg)
    d1, i1, pre1, curv1 = _make_frame(pose1, cfg)
    R0 = jnp.asarray(pose0[:3, :3], jnp.float32)
    t0 = jnp.asarray(pose0[:3, 3], jnp.float32)
    inp = odometry.build_inputs(
        next_depth=d1, next_intensity=i1,
        next_vmap=pre1.vertex_filtered, next_nmap=pre1.normal,
        pred_vmap=pre0.vertex_filtered, pred_nmap=pre0.normal,
        pred_intensity=i0, icp_weight=jnp.ones_like(d0),
        prev_R=R0, prev_t=t0, prev_intensity=i0, cfg=cfg,
        **({"sal_k1": curv1.k1, "sal_k2": curv1.k2}
           if curv1 is not None else {}),
    )
    res = odometry.track(R0, t0, inp, INTR, cfg)
    est = np.eye(4, dtype=np.float32)
    est[:3, :3] = np.asarray(res.R)
    est[:3, 3] = np.asarray(res.t)
    return est, res


def _pose_err(est, gt):
    e = np.linalg.inv(gt) @ est
    terr = np.linalg.norm(e[:3, 3])
    rerr = np.degrees(np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)))
    return terr, rerr


def _pair():
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.012, -0.006, 0.008]
    th = 0.006
    c, s = np.cos(th), np.sin(th)
    pose1[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                             np.float32) @ pose1[:3, :3]
    return pose0, pose1


def test_patch_assoc_matches_regather():
    pose0, pose1 = _pair()
    est_base, _ = _track_pair(pose0, pose1, CFG)
    cfg_p = dataclasses.replace(CFG, tracking_patch_assoc=True)
    est_patch, _ = _track_pair(pose0, pose1, cfg_p)
    dt = np.linalg.norm(est_base[:3, 3] - est_patch[:3, 3])
    dr = np.linalg.norm(est_base[:3, :3] - est_patch[:3, :3])
    assert dt < 3e-4, dt
    assert dr < 3e-4, dr


def test_patch_assoc_accuracy_vs_gt():
    pose0, pose1 = _pair()
    cfg_p = dataclasses.replace(CFG, tracking_patch_assoc=True)
    est, res = _track_pair(pose0, pose1, cfg_p)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.004, terr
    assert rerr < 0.3, rerr
    assert float(res.icp_count) > 2000


def test_topk_all_pixels_matches_baseline():
    pose0, pose1 = _pair()
    est_base, _ = _track_pair(pose0, pose1, CFG)
    k_all = INTR.width * INTR.height
    cfg_k = dataclasses.replace(CFG, tracking_topk=k_all)
    est_k, _ = _track_pair(pose0, pose1, cfg_k)
    dt = np.linalg.norm(est_base[:3, 3] - est_k[:3, 3])
    assert dt < 3e-4, dt


def test_topk_half_accuracy_vs_gt():
    pose0, pose1 = _pair()
    cfg_k = dataclasses.replace(
        CFG, tracking_topk=(INTR.width * INTR.height) // 2,
        tracking_topk_full_iters=2)
    est, _ = _track_pair(pose0, pose1, cfg_k)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.004, terr
    assert rerr < 0.3, rerr


def test_topk_patch_combined():
    pose0, pose1 = _pair()
    cfg_c = dataclasses.replace(
        CFG, tracking_topk=(INTR.width * INTR.height) // 2,
        tracking_topk_full_iters=2, tracking_patch_assoc=True)
    est, _ = _track_pair(pose0, pose1, cfg_c)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.004, terr
    assert rerr < 0.3, rerr


def test_saliency_ids_sorted_unique():
    pose0, pose1 = _pair()
    d1, i1, pre1, _ = _make_frame(pose1, CFG)
    from hrbffusion3d_tpu.ops import pyramid as pyr_ops

    d_idx, d_idy = pyr_ops.sobel_derivatives(i1)
    sv = icp_ops.rgb_static_valid(i1, d_idx, d_idy, d1,
                                  (5.0 ** 2) / (CFG.sobel_scale ** 2))
    k = 2048
    ids = np.asarray(icp_ops.saliency_ids(
        k, pre1.vertex_filtered, pre1.normal, i1, sv, d_idx, d_idy, INTR))
    assert ids.shape == ((k // INTR.height) * INTR.height,)
    assert np.all(np.diff(ids) > 0)  # sorted strictly ascending => unique
