import time

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import recon, synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess
from hrbffusion3d_tpu.utils.timing import Stopwatch


def test_stopwatch(tmp_path):
    sw = Stopwatch()
    with sw.time("stage_a"):
        time.sleep(0.01)
    sw.tick("stage_b")
    time.sleep(0.005)
    sw.tock("stage_b")
    s = sw.summary()
    assert s["stage_a"]["mean_ms"] >= 9
    assert s["stage_b"]["count"] == 1
    p = str(tmp_path / "timings.txt")
    sw.dump(p)
    assert "stage_a" in open(p).read()


def test_point_to_scene_distance():
    scene = synth.default_room()
    # points exactly on surfaces
    on_wall = jnp.array([[0.0, 0.0, 3.2], [1.0, 0.5, 3.2]])
    d = np.asarray(recon.point_to_scene_distance(on_wall, scene))
    assert (d < 1e-6).all()
    off = jnp.array([[0.0, 0.0, 3.0]])
    d2 = np.asarray(recon.point_to_scene_distance(off, scene))
    # 0.2 from back wall but sphere at (0, .9, 2.2) r=.6: dist to sphere
    # surface = |p-c| - r = sqrt(0+0.81+0.64)-0.6 ~ 0.604; wall wins
    np.testing.assert_allclose(d2[0], 0.2, atol=1e-6)


def test_map_accuracy_of_clean_frame():
    intr = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
    cfg = small_test_config(map_capacity=1 << 15)
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.eye(4), intr)
    pre = preprocess.vertex_normal_radius(depth, depth, intr, cfg)
    curv = preprocess.curvature_gradient(pre, intr, cfg, chunk=4096)
    conf = preprocess.confidence_map(pre, curv, intr, cfg)
    meas = sm.measurement_from_preprocess(pre, curv, rgb, conf)
    m = sm.initialise(cfg.map_capacity, meas, jnp.eye(4), cfg)
    stats = recon.map_accuracy(m, scene)
    # exact depth -> surfels sit on the surface
    assert stats["median"] < 1e-3, stats
    assert stats["rmse"] < 0.01, stats
