"""Mesh-based reconstruction eval (eval/mesh.py): PLY round-trip, analytic
tessellation, and exact point-to-triangle distance vs the closed-form
scene distance."""

import numpy as np

import jax.numpy as jnp

from hrbffusion3d_tpu.eval import mesh, recon, synth


def test_point_to_triangle_exact_cases():
    tri = mesh.TriMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32))
    pts = np.array([
        [0.25, 0.25, 0.5],    # above interior -> 0.5
        [2.0, 0.0, 0.0],      # beyond vertex B -> 1.0
        [0.5, -1.0, 0.0],     # below edge AB -> 1.0
        [0.25, 0.25, 0.0],    # on the triangle -> 0
    ], np.float32)
    d = mesh.point_to_mesh_distance(pts, tri)
    np.testing.assert_allclose(d, [0.5, 1.0, 1.0, 0.0], atol=1e-6)


def test_mesh_distance_matches_analytic_scene():
    """Tessellated default_room distances must agree with the closed-form
    point-to-scene distance (within sphere chord error)."""
    scene = synth.default_room()
    m = mesh.scene_to_mesh(scene, sphere_res=96)
    rng = np.random.default_rng(0)
    # points near the surfaces: on-surface +- noise
    pts = rng.uniform([-2.0, -1.8, -1.8], [2.0, 1.3, 3.0], (500, 3)).astype(np.float32)
    d_mesh = mesh.point_to_mesh_distance(pts, m)
    d_true = np.asarray(recon.point_to_scene_distance(jnp.asarray(pts), scene))
    np.testing.assert_allclose(d_mesh, d_true, atol=2e-3)


def test_ply_mesh_roundtrip(tmp_path):
    scene = synth.complex_room()
    m = mesh.scene_to_mesh(scene, sphere_res=16)
    p = str(tmp_path / "scene.ply")
    mesh.save_ply_mesh(p, m)
    m2 = mesh.load_ply_mesh(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, rtol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_map_accuracy_mesh_on_fused_map():
    """A short fused map measured against the tessellated GT mesh lands in
    the expected accuracy range (same stats contract as recon.map_accuracy)."""
    from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
    from hrbffusion3d_tpu.pipeline import slam

    INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                            width=128, height=96)
    cfg = small_test_config(map_capacity=1 << 15, predict_conf_threshold=0.2)
    scene = synth.default_room()
    gt = synth.orbit_trajectory(4, angle_per_frame=0.01)
    d, c = synth.render_frame_jit(scene, jnp.asarray(gt[0]), INTR)
    state = slam.bootstrap(slam.FrameInput(depth=d, rgb=c), INTR, cfg,
                           init_pose=gt[0])
    for i in range(1, 4):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        state = slam.step(state, slam.FrameInput(depth=d, rgb=c), INTR, cfg)
    gt_mesh = mesh.scene_to_mesh(scene, sphere_res=96)
    stats = mesh.map_accuracy_mesh(state.map, gt_mesh)
    ref = recon.map_accuracy(state.map, scene)
    assert stats["n"] == ref["n"] > 1000
    assert abs(stats["rmse"] - ref["rmse"]) < 3e-3, (stats, ref)
    assert stats["rmse"] < 0.02
