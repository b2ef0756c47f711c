import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, raycast

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(map_capacity=1 << 15, predict_conf_threshold=0.2)


def _map_from_frame(pose):
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    curv = preprocess.curvature_gradient(pre, INTR, CFG, chunk=4096)
    pre = preprocess.update_normal_rad(pre, curv, CFG)
    conf = preprocess.confidence_map(pre, curv, INTR, CFG)
    meas = sm.measurement_from_preprocess(pre, curv, rgb, conf)
    m = sm.initialise(CFG.map_capacity, meas, jnp.asarray(pose), CFG)
    return m, depth, rgb


def test_predict_matches_depth_same_view():
    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    pred = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    found = np.asarray(pred.found)
    assert found.mean() > 0.5, found.mean()
    d = np.asarray(depth)
    pz = np.asarray(pred.vertex[..., 2])
    err = np.abs(pz - d)[found & (d > 0)]
    # HRBF surface interpolates the surfels; millimetre-level agreement
    assert np.median(err) < 0.004, np.median(err)
    assert (err < 0.02).mean() > 0.9


def test_geometric_ladder_matches_uniform():
    """The geometric ladder (sparse far taps + 3 extra bisections) finds
    the same surface as the reference's uniform 4 mm march: same found set
    (up to rare grazing pixels) and sub-millimetre vertex agreement."""
    import dataclasses

    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_u = dataclasses.replace(CFG, raycast_geometric_ladder=False)
    pred_g = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    pred_u = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_u, chunk=4096)
    fg = np.asarray(pred_g.found)
    fu = np.asarray(pred_u.found)
    assert (fg == fu).mean() > 0.995, (fg.mean(), fu.mean())
    both = fg & fu
    dv = np.linalg.norm(
        np.asarray(pred_g.vertex) - np.asarray(pred_u.vertex), axis=-1)[both]
    assert np.median(dv) < 5e-4, np.median(dv)
    assert (dv < 0.004).mean() > 0.99, (dv < 0.004).mean()


def test_predict_normals_reasonable():
    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    scene_pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    pred = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    found = np.asarray(pred.found) & np.asarray(scene_pre.valid)
    dots = np.sum(np.asarray(pred.normal) * np.asarray(scene_pre.normal), axis=-1)[found]
    assert (dots > 0.9).mean() > 0.9, (dots > 0.9).mean()


def test_predict_novel_view():
    """Build map from pose0, predict from a shifted pose: predicted depth
    must match the scene rendered at the new pose."""
    pose0 = np.eye(4, dtype=np.float32)
    m, _, _ = _map_from_frame(pose0)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.03, -0.02, 0.04]
    scene = synth.default_room()
    depth1, _ = synth.render_frame(scene, jnp.asarray(pose1), INTR)
    pose1_inv = jnp.asarray(np.linalg.inv(pose1))
    idx = sm.render_index(m, pose1_inv, INTR)
    pred = raycast.predict_hrbf(m, pose1_inv, idx, INTR, CFG, chunk=4096)
    found = np.asarray(pred.found)
    d = np.asarray(depth1)
    mask = found & (d > 0.3) & (d < 3.2)
    assert mask.mean() > 0.4
    err = np.abs(np.asarray(pred.vertex[..., 2]) - d)[mask]
    assert np.median(err) < 0.006, np.median(err)


def test_predict_icp_weight_positive_where_found():
    pose = np.eye(4, dtype=np.float32)
    m, depth, _ = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    pred = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    w = np.asarray(pred.icp_weight)
    found = np.asarray(pred.found)
    assert (w[found] > 0).all()
    assert (w[~found] == 0).all()


def test_fill_in_composites_holes():
    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    curv = preprocess.curvature_gradient(pre, INTR, CFG, chunk=4096)
    conf = preprocess.confidence_map(pre, curv, INTR, CFG)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    pred = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    filled = raycast.fill_in(pred, pre.vertex_filtered, pre.normal, pre.radius,
                             rgb, conf, curv.k1, curv.k2, CFG)
    # after fill-in, coverage >= prediction coverage and close to frame validity
    cov = (np.asarray(filled.vertex[..., 2]) > 0).mean()
    pcov = np.asarray(pred.found).mean()
    assert cov >= pcov
    assert cov > 0.8


def test_ksection_matches_bisection():
    """The batched k-section refinement (raycast_bisection_batch) reaches at
    least the sequential bisection's bracket width: same found set, and
    sub-half-millimetre vertex agreement on the shared pixels."""
    import dataclasses

    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_k = dataclasses.replace(CFG, raycast_bisection_batch=7)
    pred_s = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    pred_k = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_k, chunk=4096)
    fs = np.asarray(pred_s.found)
    fk = np.asarray(pred_k.found)
    # found depends only on the ladder bracket, not the refinement
    assert (fs == fk).all()
    both = fs & fk
    dv = np.linalg.norm(
        np.asarray(pred_s.vertex) - np.asarray(pred_k.vertex), axis=-1)[both]
    # bracket widths: ladder step 4mm / 2^9 vs / 8^3 — both < 8 um; the
    # midpoints differ by at most the wider bracket
    assert np.max(dv) < 5e-4, np.max(dv)


def test_ksection_pallas_matches_xla():
    """Pallas kernel with k-section == XLA path with k-section (interpret)."""
    import dataclasses

    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_k = dataclasses.replace(CFG, raycast_bisection_batch=7)
    ref = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_k, chunk=4096)
    out = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_k,
                               pallas_interpret=True)
    rf = np.asarray(ref.found)
    of = np.asarray(out.found)
    assert (rf == of).mean() > 0.995, (rf != of).mean()
    both = rf & of
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(out.vertex)[both],
                               np.asarray(ref.vertex)[both], atol=1e-4)


def test_false_position_matches_bisection():
    """False-position refinement (raycast_false_position=3) lands on the
    same surface as the reference bisection (superlinear on the smooth
    field): same found set, tighter-than-bracket vertex agreement."""
    import dataclasses

    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_f = dataclasses.replace(CFG, raycast_false_position=3)
    pred_s = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, CFG, chunk=4096)
    pred_f = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_f, chunk=4096)
    fs = np.asarray(pred_s.found)
    ff = np.asarray(pred_f.found)
    assert (fs == ff).all()
    both = fs & ff
    dv = np.linalg.norm(
        np.asarray(pred_s.vertex) - np.asarray(pred_f.vertex), axis=-1)[both]
    # bisection bracket after 9 halvings of a <=28 mm bracket is <= 55 um;
    # false position should agree within that bracket scale
    assert np.median(dv) < 3e-5, np.median(dv)
    assert np.max(dv) < 1e-3, np.max(dv)


def test_false_position_pallas_matches_xla():
    import dataclasses

    pose = np.eye(4, dtype=np.float32)
    m, depth, rgb = _map_from_frame(pose)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_f = dataclasses.replace(CFG, raycast_false_position=3)
    ref = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_f, chunk=4096)
    out = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg_f,
                               pallas_interpret=True)
    rf = np.asarray(ref.found)
    of = np.asarray(out.found)
    assert (rf == of).mean() > 0.995, (rf != of).mean()
    both = rf & of
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(out.vertex)[both],
                               np.asarray(ref.vertex)[both], atol=1e-4)
