"""Equivalence of the pixel-space clean remap (cfg.clean_pixel_remap):
on tombstone frames the index-map translation through clean must be
bit-identical whether done via the remap row gather or via the per-pixel
keep mask from the extended attr image."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                        width=128, height=96)


def _run(cfg, n=6):
    scene = synth.default_room()
    poses = synth.orbit_trajectory(n, angle_per_frame=0.01)
    state = None
    outs = []
    for i in range(n):
        d, c = synth.render_frame(scene, jnp.asarray(poses[i]), INTR)
        f = slam.FrameInput(depth=d, rgb=c)
        if state is None:
            state = slam.bootstrap(f, INTR, cfg, init_pose=poses[i])
        else:
            state = slam.step(state, f, INTR, cfg)
        outs.append((np.asarray(state.t), np.asarray(state.pred_vertex),
                     int(state.map.count)))
    return outs


def test_pixel_remap_matches_gather():
    base = small_test_config(clean_compact_period=4, clean_crowd_period=4)
    a = _run(dataclasses.replace(base, clean_pixel_remap=True))
    b = _run(dataclasses.replace(base, clean_pixel_remap=False))
    for i, ((ta, va, ca), (tb, vb, cb)) in enumerate(zip(a, b)):
        assert ca == cb, (i, ca, cb)
        np.testing.assert_array_equal(ta, tb, err_msg=f"frame {i}")
        np.testing.assert_array_equal(va, vb, err_msg=f"frame {i}")
