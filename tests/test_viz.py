"""Headless viewer + stats/telemetry tests (GUI/Stopviz analogues)."""

import json
import os
import socket

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess
from hrbffusion3d_tpu.utils.timing import Stopwatch
from hrbffusion3d_tpu.viz import viewer
from hrbffusion3d_tpu.viz.stats import StatsLogger

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                        width=128, height=96)
CFG = small_test_config(map_capacity=1 << 15)


def _make_map():
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.eye(4), INTR)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    curv = preprocess.curvature_gradient(pre, INTR, CFG, chunk=4096)
    pre = preprocess.update_normal_rad(pre, curv, CFG)
    conf = preprocess.confidence_map(pre, curv, INTR, CFG)
    meas = sm.measurement_from_preprocess(pre, curv, rgb, conf)
    return sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG)


def test_render_view_modes():
    m = _make_map()
    for mode in ("color", "normal", "phong", "conf"):
        img = viewer.render_view(m, np.eye(4, dtype=np.float32), INTR,
                                 mode=mode)
        assert img.shape == (96, 128, 3) and img.dtype == np.uint8
        # the map fills most of the original viewpoint: plenty of non-
        # background pixels, and shading varies across the scene
        bg = np.asarray([int(0.12 * 255)] * 3)
        hit_frac = (np.abs(img.astype(int) - bg).sum(-1) > 10).mean()
        assert hit_frac > 0.4, (mode, hit_frac)
        assert img.std() > 5.0


def test_turntable_writes_pngs(tmp_path):
    m = _make_map()
    paths = viewer.turntable(m, INTR, str(tmp_path), n_views=3,
                             look_at=(0.0, 0.0, 1.5))
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    from PIL import Image

    im = np.asarray(Image.open(paths[0]))
    assert im.shape == (96, 128, 3)


def test_stats_logger(tmp_path):
    class FakeMap:
        count = jnp.int32(7)

    class FakeState:
        last_icp_error = jnp.float32(0.25)
        last_icp_count = jnp.int32(1234)
        dense_frac = jnp.float32(0.9)
        map = FakeMap()
        t = jnp.zeros(3)

    p = tmp_path / "stats.jsonl"
    lg = StatsLogger(str(p))
    lg.log_state(0, FakeState(), extra={"fps": 3.0})
    lg.log_state(1, FakeState())
    lg.close()
    rows = [json.loads(l) for l in open(p)]
    assert rows[0]["icp_count"] == 1234 and rows[0]["fps"] == 3.0
    assert rows[1]["frame"] == 1 and rows[1]["surfels"] == 7


def test_stopwatch_udp_broadcast():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    port = rx.getsockname()[1]

    sw = Stopwatch()
    with sw.time("stage"):
        pass
    sw.broadcast(port=port, signature=42)
    payload = json.loads(rx.recv(65536).decode())
    rx.close()
    assert payload["signature"] == 42
    assert "stage" in payload["timings_ms"]


def test_reference_artifacts_and_prediction_dump(tmp_path):
    class FakeMap:
        count = jnp.int32(7)

    class FakeState:
        last_icp_error = jnp.float32(0.25)
        last_icp_count = jnp.int32(1234)
        dense_frac = jnp.float32(0.9)
        map = FakeMap()
        t = jnp.zeros(3)
        pred_vertex = jnp.zeros((4, 4, 3))
        pred_normal = jnp.zeros((4, 4, 3))
        pred_intensity = jnp.zeros((4, 4))
        pred_icp_weight = jnp.zeros((4, 4))
        pred_k1 = jnp.zeros((4, 4))
        pred_k2 = jnp.zeros((4, 4))

    lg = StatsLogger()
    lg.log_state(0, FakeState())
    lg.dump_reference_artifacts(str(tmp_path))
    assert open(tmp_path / "mean_error_pose.txt").read() == "0 0.250000\n"
    assert open(tmp_path / "inliers_num.txt").read() == "0 1234\n"

    from hrbffusion3d_tpu.viz.stats import dump_prediction_textures

    dump_prediction_textures(FakeState(), str(tmp_path / "pred"), frame=3)
    arr = np.load(tmp_path / "pred" / "pred_vertex_00003.npy")
    assert arr.shape == (4, 4, 3)
