import subprocess
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hrbffusion3d_tpu.config import CameraIntrinsics
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.io import klg, native_loader

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build():
    subprocess.run(["make", "-C", os.path.join(ROOT, "native")], check=True,
                   capture_output=True)


def test_native_matches_python(tmp_path):
    _build()
    assert native_loader.available()
    intr = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0, width=64, height=48)
    scene = synth.default_room()
    poses = synth.orbit_trajectory(4)
    ds, cs = [], []
    for i in range(4):
        d, c = synth.render_frame(scene, jnp.asarray(poses[i]), intr)
        ds.append(np.asarray(d))
        cs.append(np.asarray(c))
    p = str(tmp_path / "seq.klg")
    klg.write(p, np.stack(ds), np.stack(cs), depth_scale=1.0 / 5000.0)

    py_frames = list(klg.frames(p, 64, 48, 1.0 / 5000.0))
    nat_frames = list(native_loader.frames(p, 64, 48, 1.0 / 5000.0))
    assert len(nat_frames) == len(py_frames) == 4
    for a, b in zip(py_frames, nat_frames):
        assert a.timestamp == b.timestamp
        np.testing.assert_allclose(a.depth, b.depth, atol=1e-6)
        np.testing.assert_allclose(a.rgb, b.rgb, atol=1e-6)
