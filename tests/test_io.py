import os

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.io import klg, ply, traj
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess


def test_traj_tum_roundtrip(tmp_path):
    poses = synth.orbit_trajectory(10).astype(np.float64)
    ts = np.arange(10) * 0.033
    p = str(tmp_path / "traj.freiburg")
    traj.save_tum(p, ts, poses)
    ts2, poses2 = traj.load_tum(p)
    np.testing.assert_allclose(ts, ts2, atol=1e-5)
    np.testing.assert_allclose(poses, poses2, atol=1e-5)


def test_traj_zhou_roundtrip(tmp_path):
    poses = synth.orbit_trajectory(5).astype(np.float64)
    p = str(tmp_path / "traj.log")
    traj.save_zhou(p, poses)
    poses2 = traj.load_zhou(p)
    np.testing.assert_allclose(poses, poses2, atol=1e-6)


def test_quat_mat_roundtrip():
    from hrbffusion3d_tpu.core import lie

    R = np.asarray(lie.so3_exp(jnp.array([0.3, -0.5, 0.2])))
    q = traj.mat_to_quat(R)
    R2 = traj.quat_to_mat(q)
    np.testing.assert_allclose(R, R2, atol=1e-6)


def test_klg_roundtrip(tmp_path):
    intr = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0, width=64, height=48)
    scene = synth.default_room()
    poses = synth.orbit_trajectory(3)
    ds, cs = [], []
    for i in range(3):
        d, c = synth.render_frame(scene, jnp.asarray(poses[i]), intr)
        ds.append(np.asarray(d))
        cs.append(np.asarray(c))
    ds = np.stack(ds)
    cs = np.stack(cs)
    p = str(tmp_path / "seq.klg")
    klg.write(p, ds, cs, depth_scale=1.0 / 5000.0)
    frames = list(klg.frames(p, width=64, height=48, depth_scale=1.0 / 5000.0))
    assert len(frames) == 3
    np.testing.assert_allclose(frames[1].depth, ds[1], atol=1e-3)
    np.testing.assert_allclose(frames[1].rgb, cs[1], atol=2 / 255)


def test_ply_export(tmp_path):
    intr = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0, width=64, height=48)
    cfg = small_test_config(map_capacity=1 << 13)
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.eye(4), intr)
    pre = preprocess.vertex_normal_radius(depth, depth, intr, cfg)
    curv = preprocess.curvature_gradient(pre, intr, cfg, chunk=1024)
    conf = preprocess.confidence_map(pre, curv, intr, cfg)
    meas = sm.measurement_from_preprocess(pre, curv, rgb, conf)
    m = sm.initialise(cfg.map_capacity, meas, jnp.eye(4), cfg)
    p = str(tmp_path / "map.ply")
    n = ply.save_ply(p, m)
    assert n == int(m.count)
    pos = ply.load_ply_positions(p)
    np.testing.assert_allclose(pos, np.asarray(m.pos[:n]), atol=1e-5)


def test_icl_nuim_rt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    from hrbffusion3d_tpu.core import lie

    gt = [np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 0.2, 6), jnp.float32)))
          for _ in range(4)]
    p = str(tmp_path / "traj_rt.txt")
    t1 = np.diag([-1.0, 1.0, 1.0, 1.0])
    tr = np.diag([1.0, -1.0, 1.0, 1.0])
    with open(p, "w") as f:
        for T in gt:
            # file stores the raw matrix; loader applies t1 @ T @ tr
            raw = np.linalg.inv(t1) @ T @ np.linalg.inv(tr)
            for r in range(3):
                f.write(" ".join(f"{raw[r, c]:.8f}" for c in range(4)) + "\n")
    poses = traj.load_icl_nuim_rt(p)
    np.testing.assert_allclose(poses, np.stack(gt), atol=1e-5)


def test_lefloch_format(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [0.1, 0.2, 0.3]
    p = str(tmp_path / "traj_lefloch.txt")
    with open(p, "w") as f:
        vals = " ".join(f"{v:.8f}" for v in T.flatten(order="F"))
        f.write(f"0 {vals}\n")
    poses = traj.load_lefloch(p)
    assert poses.shape == (1, 4, 4)
    # loader right-multiplies by the dataset calibration pose_init
    pose_init = np.array([
        [1.000000, -0.000228, 0.000007, 0.023992],
        [-0.000228, -0.999970, 0.007753, 0.003886],
        [0.000005, -0.007753, -0.999970, -0.001633],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(poses[0], T @ pose_init, atol=1e-6)


def test_hrbf_projection_onto_plane():
    from hrbffusion3d_tpu.ops import hrbf

    xs, ys = jnp.meshgrid(jnp.linspace(-0.3, 0.3, 7), jnp.linspace(-0.3, 0.3, 7))
    pos = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(49)], axis=-1)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (49, 1))
    sup = jnp.full((49,), 0.3)
    mask = jnp.ones((49,), bool)
    x = jnp.array([0.02, -0.01, 1.04])
    proj = hrbf.hrbf_projection(x, pos, n, sup, mask)
    np.testing.assert_allclose(float(proj[2]), 1.0, atol=5e-3)


def test_tum_prefetched_matches_sequential(tmp_path):
    """frames_prefetched yields the exact same frames in the same order."""
    import numpy as np
    from PIL import Image

    from hrbffusion3d_tpu.io import tum

    root = tmp_path
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(7):
        rgb = rng.randint(0, 255, (12, 16, 3), np.uint8)
        depth = rng.randint(0, 10000, (12, 16)).astype(np.uint16)
        Image.fromarray(rgb).save(root / "rgb" / f"{i}.png")
        Image.fromarray(depth).save(root / "depth" / f"{i}.png")
        lines.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    (root / "associations.txt").write_text("\n".join(lines))

    seq = list(tum.frames(str(root)))
    pre = list(tum.frames_prefetched(str(root), workers=2, depth_ahead=3))
    assert len(seq) == len(pre) == 7
    for a, b in zip(seq, pre):
        assert a.timestamp == b.timestamp
        np.testing.assert_array_equal(a.depth, b.depth)
        np.testing.assert_array_equal(a.rgb, b.rgb)
