import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import TUM1, CameraIntrinsics
from hrbffusion3d_tpu.core import camera, lie
from hrbffusion3d_tpu.eval import ate, synth

SMALL = CameraIntrinsics(fx=80.0, fy=80.0, cx=40.0, cy=30.0, width=80, height=60)


def test_render_depth_sane():
    scene = synth.default_room()
    pose = jnp.eye(4)
    depth, rgb = synth.render_frame(scene, pose, SMALL)
    assert depth.shape == (60, 80)
    d = np.asarray(depth)
    assert (d > 0).all()  # closed room: every ray hits
    assert d.max() < 8.0
    assert 0.0 <= float(rgb.min()) and float(rgb.max()) <= 1.0


def test_render_sphere_depth_exact():
    # camera at origin looking straight at sphere centred (0,0,2) r=0.5
    scene = synth.Scene(
        spheres=jnp.array([[0.0, 0.0, 2.0, 0.5]]),
        planes=jnp.array([[0.0, 0.0, -1.0, -10.0]]),
    )
    depth, _ = synth.render_frame(scene, jnp.eye(4), SMALL)
    # central pixel: depth = 2 - 0.5
    np.testing.assert_allclose(float(depth[30, 40]), 1.5, atol=1e-3)


def test_unproject_project_roundtrip():
    scene = synth.default_room()
    depth, _ = synth.render_frame(scene, jnp.eye(4), SMALL)
    verts = camera.unproject(depth, SMALL)
    u, v, z = camera.project(verts, SMALL)
    yy, xx = camera.pixel_grid(60, 80)
    np.testing.assert_allclose(np.asarray(u), np.asarray(xx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(yy), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-5)


def test_rendered_depth_consistent_across_poses():
    """A world point seen from two poses must unproject consistently."""
    scene = synth.default_room()
    poses = synth.orbit_trajectory(5)
    d0, _ = synth.render_frame(scene, jnp.asarray(poses[0]), SMALL)
    v0 = camera.unproject(d0, SMALL)
    w0 = lie.transform_points(jnp.asarray(poses[0]), v0.reshape(-1, 3))
    # re-render from pose 0 transformed into pose 3's frame, project and
    # compare depth where visible
    d3, _ = synth.render_frame(scene, jnp.asarray(poses[3]), SMALL)
    T = lie.se3_inverse(jnp.asarray(poses[3]))
    c3 = lie.transform_points(T, w0)
    u, v, z = camera.project(c3, SMALL)
    ui, vi, ok = camera.in_bounds(u, v, SMALL)
    zs = np.asarray(d3)[np.asarray(vi)[np.asarray(ok)], np.asarray(ui)[np.asarray(ok)]]
    zc = np.asarray(z)[np.asarray(ok)]
    frac_close = (np.abs(zs - zc) < 0.02).mean()
    assert frac_close > 0.9  # occlusion boundaries cause a few mismatches


def test_ate_zero_for_identical():
    poses = synth.orbit_trajectory(20)
    assert ate.ate_rmse(poses, poses) < 1e-6


def test_ate_alignment_invariance():
    poses = synth.orbit_trajectory(30)
    offset = np.asarray(lie.se3_exp(jnp.array([0.5, -0.2, 0.1, 0.2, 0.1, -0.3])))
    moved = np.einsum("ij,njk->nik", offset, poses)
    assert ate.ate_rmse(moved, poses) < 1e-5


def test_rpe():
    poses = synth.orbit_trajectory(10)
    t, r = ate.rpe_rmse(poses, poses)
    assert t < 1e-6 and r < 1e-3
