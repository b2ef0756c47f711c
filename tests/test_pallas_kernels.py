"""Pallas preprocessing kernels vs the XLA reference implementations
(interpret mode on CPU; the compiled path runs on TPU)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import pallas_kernels as pk
from hrbffusion3d_tpu.ops import preprocess

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config()


def _depth():
    scene = synth.default_room()
    depth, _ = synth.render_frame(scene, jnp.eye(4), INTR)
    return depth


def test_bilateral_matches_xla():
    depth = _depth()
    ref = preprocess.bilateral_filter(depth, CFG)
    out = pk.bilateral_filter(depth, CFG, interpret=True)
    # (invalid-neighbor denominator handling differs; weights there are
    # ~exp(-50) so the numeric difference is negligible)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pca_normals_match_xla():
    depth = _depth()
    from hrbffusion3d_tpu.core import camera

    v = camera.unproject(depth, INTR)
    ref = preprocess.normal_pca(v, CFG)
    out = pk.normal_pca(v, CFG, interpret=True)
    r = np.asarray(ref)
    o = np.asarray(out)
    both = (np.linalg.norm(r, axis=-1) > 0.5) & (np.linalg.norm(o, axis=-1) > 0.5)
    assert both.mean() > 0.9
    dots = np.sum(r[both] * o[both], axis=-1)
    assert (dots > 0.999).mean() > 0.99


def test_curvature_matches_xla():
    depth = _depth()
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    ref = preprocess.curvature_gradient(pre, INTR, CFG, chunk=4096)
    out = pk.curvature_gradient(pre, INTR, CFG, interpret=True)
    rv = np.asarray(ref.valid)
    ov = np.asarray(out.valid)
    assert (rv == ov).mean() > 0.999
    both = rv & ov
    np.testing.assert_allclose(np.asarray(out.k1)[both], np.asarray(ref.k1)[both],
                               atol=5e-2, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out.k2)[both], np.asarray(ref.k2)[both],
                               atol=5e-2, rtol=1e-3)
    dots = np.sum(np.asarray(out.normal_opt)[both] * np.asarray(ref.normal_opt)[both],
                  axis=-1)
    assert (dots > 0.9999).mean() > 0.99
    np.testing.assert_allclose(np.asarray(out.gradient_mag)[both],
                               np.asarray(ref.gradient_mag)[both], rtol=1e-3, atol=1e-3)


def test_raycast_matches_xla():
    from hrbffusion3d_tpu.map import surfel_map as sm
    from hrbffusion3d_tpu.ops import raycast

    cfg = small_test_config(map_capacity=1 << 15, predict_conf_threshold=0.2)
    depth = _depth()
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, cfg)
    curv = preprocess.curvature_gradient(pre, INTR, cfg, chunk=4096)
    pre = preprocess.update_normal_rad(pre, curv, cfg)
    conf = preprocess.confidence_map(pre, curv, INTR, cfg)
    meas = sm.measurement_from_preprocess(pre, curv, jnp.zeros(depth.shape + (3,)), conf)
    m = sm.initialise(cfg.map_capacity, meas, jnp.eye(4), cfg)
    idx = sm.render_index(m, jnp.eye(4), INTR)

    ref = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg, chunk=4096)
    out = raycast.predict_hrbf(m, jnp.eye(4), idx, INTR, cfg,
                               pallas_interpret=True)

    rf = np.asarray(ref.found)
    of = np.asarray(out.found)
    assert (rf == of).mean() > 0.995, (rf != of).mean()
    both = rf & of
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(out.vertex)[both],
                               np.asarray(ref.vertex)[both], atol=1e-4)
    dots = np.sum(np.asarray(out.normal)[both] * np.asarray(ref.normal)[both],
                  axis=-1)
    assert (dots > 0.9999).mean() > 0.99
    # nearest-surfel attributes: fp ties in the distance argmin may pick a
    # different (equidistant) tap on a handful of pixels
    conf_same = np.abs(np.asarray(out.conf) - np.asarray(ref.conf))[both] < 1e-5
    assert conf_same.mean() > 0.99, conf_same.mean()
    np.testing.assert_allclose(np.asarray(out.icp_weight)[both],
                               np.asarray(ref.icp_weight)[both],
                               rtol=1e-3, atol=1e-3)
