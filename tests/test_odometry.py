"""Two-frame tracking fixture tests (the TPU analogue of GPUTest's 2-frame
protocol, GPUTest/src/GPUTest.cpp:146-333, but with accuracy assertions)."""

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.core import camera, lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import icp as icp_ops
from hrbffusion3d_tpu.ops import preprocess, pyramid
from hrbffusion3d_tpu.tracking import odometry

# TUM-like FOV (640/517 aspect) at 128x96 test resolution
INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(pyramid_iterations=(10, 5, 4), so3_iterations=10)


def _make_frame(pose):
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    intensity = pyramid.rgb_to_intensity(rgb)
    return depth, intensity, pre


def _track_pair(pose0, pose1, cfg=CFG):
    d0, i0, pre0 = _make_frame(pose0)
    d1, i1, pre1 = _make_frame(pose1)
    R0 = jnp.asarray(pose0[:3, :3], jnp.float32)
    t0 = jnp.asarray(pose0[:3, 3], jnp.float32)
    inp = odometry.build_inputs(
        next_depth=d1,
        next_intensity=i1,
        next_vmap=pre1.vertex_filtered,
        next_nmap=pre1.normal,
        pred_vmap=pre0.vertex_filtered,   # frame-to-frame: model = frame 0
        pred_nmap=pre0.normal,
        pred_intensity=i0,
        icp_weight=jnp.ones_like(d0),
        prev_R=R0, prev_t=t0,
        prev_intensity=i0,
        cfg=cfg,
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


def test_identity_motion():
    pose = np.eye(4, dtype=np.float32)
    est, res = _track_pair(pose, pose)
    terr, rerr = _pose_err(est, pose)
    assert terr < 1e-3
    assert rerr < 0.1
    assert float(res.icp_count) > 2000


def test_small_translation():
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.01, -0.005, 0.008]
    est, res = _track_pair(pose0, pose1)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.006, terr
    assert rerr < 0.3, rerr


def test_small_rotation_translation():
    pose0 = np.eye(4, dtype=np.float32)
    xi = jnp.array([0.008, 0.004, -0.006, 0.01, -0.008, 0.012])
    pose1 = np.asarray(lie.se3_exp(xi)) @ pose0
    est, res = _track_pair(pose0, pose1)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.007, terr
    assert rerr < 0.5, rerr


def test_moderate_motion_orbit():
    poses = synth.orbit_trajectory(8)
    est, _ = _track_pair(poses[0], poses[4])
    terr, rerr = _pose_err(est, poses[4])
    # inter-frame motion of the orbit x4; still tracked well
    assert terr < 0.012, terr
    assert rerr < 1.0, rerr


def test_divergence_guard():
    """The estimate never moves more than 0.3 m from the previous pose —
    the revert guard's invariant (RGBDOdometry.cpp:1232-1236)."""
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [1.5, 0.0, 0.0]  # hopeless input
    est, _ = _track_pair(pose0, pose1)
    assert np.linalg.norm(est[:3, 3] - pose0[:3, 3]) <= 0.3 + 1e-6


def test_icp_step_zero_at_ground_truth():
    """At the true pose the ICP system's gradient b ~ 0."""
    pose = np.eye(4, dtype=np.float32)
    d, inten, pre = _make_frame(pose)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    model_rows = icp_ops.pack_model(pre.vertex_filtered, pre.normal,
                                    jnp.ones_like(d))
    res = icp_ops.icp_step(
        R, t, R, t,
        pre.vertex_filtered, pre.normal,
        model_rows, INTR, CFG,
    )
    assert float(res.count) > 5000
    nb = np.asarray(res.b)
    nA = np.asarray(res.A)
    # relative gradient magnitude tiny
    assert np.abs(nb).max() < 1e-3 * np.abs(nA).max()


def test_sobel_derivatives():
    img = jnp.tile(jnp.arange(32, dtype=jnp.float32)[None, :] * 2.0, (24, 1))
    dx, dy = pyramid.sobel_derivatives(img)
    # reference kernel is left-minus-right: ramp of +2/px -> dIdx = -16
    interior = np.asarray(dx)[2:-2, 2:-2]
    np.testing.assert_allclose(interior, -16.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dy)[2:-2, 2:-2], 0.0, atol=1e-4)


def test_pyr_down_depth_preserves_planes():
    d = jnp.full((64, 64), 2.0)
    down = pyramid.pyr_down_depth(d)
    assert down.shape == (32, 32)
    np.testing.assert_allclose(np.asarray(down), 2.0, atol=1e-5)


def test_resize_map_normalize():
    key = jax.random.PRNGKey(0)
    n = jax.random.normal(key, (16, 16, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    down = pyramid.resize_map(n, normalize=True)
    norms = np.linalg.norm(np.asarray(down), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_lp_shrink_reference_formula():
    """lp_shrink matches the reference 'thrink' operator (reduce.cu:301-315)
    evaluated independently in numpy."""
    mu, p, iters = 10.0, 0.5, 3
    rng = np.random.RandomState(0)
    h = rng.randn(64, 3).astype(np.float32) * 0.5

    alpha_a = ((2.0 / mu) * (1.0 - p)) ** (1.0 / (2.0 - p))
    h_tilde = alpha_a + (p / mu) * alpha_a ** (p - 1.0)
    out_ref = np.zeros_like(h)
    for i in range(h.shape[0]):
        hn = np.linalg.norm(h[i])
        if hn <= h_tilde:
            continue
        beta = (alpha_a / hn + 1.0) / 2.0
        for _ in range(iters):
            beta = 1.0 - (p / mu) * hn ** (p - 2.0) * beta ** (p - 1.0)
        out_ref[i] = beta * h[i]

    out = np.asarray(icp_ops.lp_shrink(jnp.asarray(h), mu, p, iters))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)
    # inside the threshold -> exactly zero
    assert (np.linalg.norm(out, axis=-1)[np.linalg.norm(h, axis=-1) <= h_tilde]
            == 0).all()


def test_sparse_icp_tracks():
    """Sparse-ICP mode (registrationICPUseSparseICP) still converges on the
    standard two-frame fixture."""
    import dataclasses

    cfg = dataclasses.replace(CFG, icp_use_sparse=True)
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.01, -0.008, 0.012]
    est, res = _track_pair(pose0, pose1, cfg=cfg)
    err = np.linalg.norm(est[:3, 3] - pose1[:3, 3])
    assert np.isfinite(est).all()
    assert err < 0.004, err


def test_joint_fast_path_matches_separate():
    """The fused one-gather ICP+RGB pass must produce the same normal
    equations as the separate formulations on identical inputs (the strong
    invariant — fp noise compounds through 19 GN iterations on this weakly
    constrained synthetic fixture, so end poses are only compared
    loosely)."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.012, -0.006, 0.01]
    # the 36-ch joint table and pack_last footprint implement the BILINEAR
    # photometric mode; pin it (the default is nearest, reference parity)
    CFGB = dataclasses.replace(CFG, tracking_rgb_nearest=False,
                               tracking_joint_gather=True)

    d0, i0, pre0 = _make_frame(pose0)
    d1, i1, pre1 = _make_frame(pose1)
    vg = jnp.where(pre0.vertex_filtered[..., 2:3] > 0, pre0.vertex_filtered, 0.0)
    ng = jnp.where(pre0.vertex_filtered[..., 2:3] > 0, pre0.normal, 0.0)
    wmap = jnp.ones_like(d0)
    ldep = jnp.where(pre0.vertex_filtered[..., 2] > 0,
                     pre0.vertex_filtered[..., 2], 0.0)
    model_rows = icp_ops.pack_model(vg, ng, wmap)
    last_rows = icp_ops.pack_last(ldep, i0)
    joint_rows = icp_ops.pack_joint(vg, ng, wmap, ldep, i0)
    d_idx, d_idy = pyramid.sobel_derivatives(i1)
    min_scale = (CFG.min_gradient_magnitudes[0] ** 2) / (CFG.sobel_scale ** 2)
    sv = icp_ops.rgb_static_valid(i1, d_idx, d_idy, d1, min_scale)
    eye3, zero3 = jnp.eye(3), jnp.zeros(3)

    res_sep = icp_ops.icp_step(eye3, zero3, eye3, zero3,
                               pre1.vertex_filtered, pre1.normal,
                               model_rows, INTR, CFG)
    K = np.array([[INTR.fx, 0, INTR.cx], [0, INTR.fy, INTR.cy], [0, 0, 1]],
                 np.float32)
    krkinv = jnp.asarray(K @ np.linalg.inv(K))
    corres_sep = icp_ops.rgb_residual(krkinv, zero3, d1, i1, last_rows, sv, CFGB)
    res_j, corres_j, _assoc = icp_ops.joint_step(
        eye3, zero3, eye3, zero3, pre1.vertex_filtered, pre1.normal,
        d1, joint_rows, i1, sv, INTR, CFGB)

    np.testing.assert_allclose(np.asarray(res_j.A), np.asarray(res_sep.A),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_j.b), np.asarray(res_sep.b),
                               rtol=1e-5, atol=1e-5)
    assert float(res_j.count) == float(res_sep.count)
    assert float(corres_j.count) == float(corres_sep.count)
    assert int(np.sum(np.asarray(corres_j.valid) != np.asarray(corres_sep.valid))) == 0
    both = np.asarray(corres_j.valid)
    np.testing.assert_allclose(np.asarray(corres_j.u0f)[both],
                               np.asarray(corres_sep.u0f)[both], atol=1e-4)
    np.testing.assert_allclose(np.asarray(corres_j.diff)[both],
                               np.asarray(corres_sep.diff)[both], atol=5e-3)

    # end-to-end: same solution basin
    est_joint, _ = _track_pair(pose0, pose1, cfg=CFGB)
    cfg_sep = dataclasses.replace(CFGB, icp_use_correspondence_search=True,
                                  icp_search_radius=0)
    est_sep, _ = _track_pair(pose0, pose1, cfg=cfg_sep)
    np.testing.assert_allclose(est_joint[:3, 3], est_sep[:3, 3], atol=3e-3)


def test_pyramid_gather_matches_slice():
    # gather/pool decimation must match the stride-2 slice formulation
    rng = np.random.RandomState(0)
    d = jnp.asarray(np.abs(rng.randn(48, 64)).astype(np.float32)) + 0.5
    v = jnp.asarray(rng.randn(48, 64, 3).astype(np.float32))
    v = v.at[..., 2].set(jnp.abs(v[..., 2]))          # valid z > 0
    v = v.at[5:9, 7:11, 2].set(0.0)                   # an invalid patch
    s = jnp.asarray(rng.randn(48, 64).astype(np.float32))

    np.testing.assert_allclose(
        pyramid.pyr_down_depth(d, gather=True),
        pyramid.pyr_down_depth(d, gather=False), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        pyramid.pyr_down_intensity(d, gather=True),
        pyramid.pyr_down_intensity(d, gather=False), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        pyramid.resize_map(v, gather=True),
        pyramid.resize_map(v, gather=False), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        pyramid.resize_map(v, normalize=True, gather=True),
        pyramid.resize_map(v, normalize=True, gather=False),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        pyramid.resize_scalar_map(s, gather=True),
        pyramid.resize_scalar_map(s, gather=False), rtol=1e-6, atol=1e-6)


def test_reassoc_period_tracks():
    """Fixed-correspondence iterations (tracking_reassoc_period > 1) still
    converge: the association gather is skipped on off-iterations while
    residuals/gates re-evaluate under the updated pose."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    xi = jnp.array([0.008, 0.004, -0.006, 0.01, -0.008, 0.012])
    pose1 = np.asarray(lie.se3_exp(xi)) @ pose0
    for period in (2, 3):
        cfg = dataclasses.replace(CFG, tracking_reassoc_period=period)
        est, _ = _track_pair(pose0, pose1, cfg=cfg)
        terr, rerr = _pose_err(est, pose1)
        assert terr < 0.007, (period, terr)
        assert rerr < 0.5, (period, rerr)


def test_reassoc_period_matches_parity_near_convergence():
    """With a tiny motion the frozen-association path lands on (nearly) the
    same pose as the every-iteration re-association parity path."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.004, -0.002, 0.003]
    est1, _ = _track_pair(pose0, pose1, cfg=CFG)
    est2, _ = _track_pair(
        pose0, pose1, cfg=dataclasses.replace(CFG, tracking_reassoc_period=2))
    # nearest-pixel photometric (the default) makes the residual landscape
    # piecewise-constant per pixel, so frozen associations land a little
    # further away than under bilinear; both are well inside the fixture's
    # ~5 mm convergence error
    assert np.linalg.norm(est1[:3, 3] - est2[:3, 3]) < 2e-3


def test_rgb_nearest_tracks():
    """Nearest-pixel photometric (the reference's semantics; one 9-ch joint
    gather) converges like the bilinear default."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    xi = jnp.array([0.008, 0.004, -0.006, 0.01, -0.008, 0.012])
    pose1 = np.asarray(lie.se3_exp(xi)) @ pose0
    cfg = dataclasses.replace(CFG, tracking_rgb_nearest=True)
    est, _ = _track_pair(pose0, pose1, cfg=cfg)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.007, terr
    assert rerr < 0.5, rerr
    # and with frozen-correspondence iterations on top
    cfg2 = dataclasses.replace(cfg, tracking_reassoc_period=2)
    est2, _ = _track_pair(pose0, pose1, cfg=cfg2)
    terr2, _ = _pose_err(est2, pose1)
    assert terr2 < 0.007, terr2


def test_fused_pyramids_match_per_map():
    """The fused multi-channel pyramid construction (one depth pass, one
    intensity pass, one pooled map pass per level) equals the per-map
    slice-path construction value-for-value."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.01, -0.005, 0.008]
    d0, i0, pre0 = _make_frame(pose0)
    d1, i1, pre1 = _make_frame(pose1)
    kw = dict(
        next_depth=d1, next_intensity=i1, next_vmap=pre1.vertex_filtered,
        next_nmap=pre1.normal, pred_vmap=pre0.vertex_filtered,
        pred_nmap=pre0.normal, pred_intensity=i0,
        icp_weight=jnp.ones_like(d0),
        prev_R=jnp.eye(3), prev_t=jnp.zeros(3), prev_intensity=i0,
    )
    a = odometry.build_inputs(cfg=CFG, **kw)
    b = odometry.build_inputs(
        cfg=dataclasses.replace(CFG, pyramid_gather_decimate=False), **kw)
    for fa, fb, name in zip(a, b, a._fields):
        for lvl, (xa, xb) in enumerate(zip(fa, fb)):
            np.testing.assert_allclose(
                np.asarray(xa), np.asarray(xb), atol=2e-5,
                err_msg=f"{name} level {lvl}")


def test_subsample_stride1_is_identity():
    """tracking_subsample=1 grid == full pixel set: the sub path with
    stride 1 must produce the bit-identical joint system (pack_sub_pixels
    at stride 1 gathers every pixel in order)."""
    import dataclasses

    pose0 = np.eye(4, dtype=np.float32)
    d1, i1, pre1 = _make_frame(pose0)
    vg = jnp.where(pre1.vertex_filtered[..., 2:3] > 0, pre1.vertex_filtered, 0.0)
    ng = jnp.where(pre1.vertex_filtered[..., 2:3] > 0, pre1.normal, 0.0)
    wmap = jnp.ones_like(d1)
    ldep = jnp.where(pre1.vertex_filtered[..., 2] > 0,
                     pre1.vertex_filtered[..., 2], 0.0)
    joint_rows = icp_ops.pack_joint_nearest(vg, ng, wmap, ldep, i1)
    d_idx, d_idy = pyramid.sobel_derivatives(i1)
    min_scale = (CFG.min_gradient_magnitudes[0] ** 2) / (CFG.sobel_scale ** 2)
    sv = icp_ops.rgb_static_valid(i1, d_idx, d_idy, d1, min_scale)
    eye3, zero3 = jnp.eye(3), jnp.zeros(3)

    icp_f, cor_f, _ = icp_ops.joint_step(
        eye3, zero3, eye3, zero3, pre1.vertex_filtered, pre1.normal, d1,
        joint_rows, i1, sv, INTR, CFG, nearest=True)
    sub = icp_ops.pack_sub_pixels(1, pre1.vertex_filtered, pre1.normal, d1,
                                  i1, sv, d_idx, d_idy, INTR)
    icp_s, cor_s, _ = icp_ops.joint_step(
        eye3, zero3, eye3, zero3, None, None, None,
        joint_rows, None, None, INTR, CFG, nearest=True, sub=sub)
    np.testing.assert_array_equal(np.asarray(icp_f.A), np.asarray(icp_s.A))
    np.testing.assert_array_equal(np.asarray(icp_f.b), np.asarray(icp_s.b))
    np.testing.assert_array_equal(np.asarray(cor_f.diff), np.asarray(cor_s.diff))
    rgb_f = icp_ops.rgb_step(cor_f, jnp.sqrt(jnp.maximum(cor_f.count, 1.0)),
                             d_idx, d_idy, INTR, CFG)
    rgb_s = icp_ops.rgb_step(cor_s, jnp.sqrt(jnp.maximum(cor_s.count, 1.0)),
                             sub.gx, sub.gy, INTR, CFG)
    np.testing.assert_array_equal(np.asarray(rgb_f.A), np.asarray(rgb_s.A))


def test_subsample_tracks():
    """Stride-2 finest-level subsampling still recovers the pose of a
    moderate motion (the decimated normal equations estimate the same 6
    DoF; the last full-res iterations polish)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, tracking_rgb_nearest=True, tracking_subsample=2,
        tracking_subsample_full_iters=3, pyramid_iterations=(10, 5, 4),
    )
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.008, -0.012, 0.006])))
    pose1[:3, 3] = [0.015, -0.008, 0.012]
    est, _ = _track_pair(pose0, pose1, cfg)
    terr, rerr = _pose_err(est, pose1)
    assert terr < 0.004, terr
    assert rerr < 0.25, rerr
