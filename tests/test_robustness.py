"""Degenerate-input robustness: the jitted step must stay finite on empty /
hole-ridden frames (the reference's guards: tracking revert, validity
masks, fill-in)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

INTR = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0, width=64, height=48)
CFG = small_test_config(
    map_capacity=1 << 12, new_surfels_capacity=1 << 10,
    pyramid_iterations=(2, 2, 2), so3_iterations=2,
    predict_conf_threshold=0.2,
)


def _bootstrap():
    scene = synth.default_room()
    poses = synth.orbit_trajectory(2)
    d, c = synth.render_frame(scene, jnp.asarray(poses[0]), INTR)
    return slam.bootstrap(slam.FrameInput(depth=d, rgb=c), INTR, CFG,
                          init_pose=poses[0])


def test_step_on_all_invalid_depth():
    state = _bootstrap()
    dead = slam.FrameInput(depth=jnp.zeros((48, 64)),
                           rgb=jnp.zeros((48, 64, 3)))
    out = slam.step(state, dead, INTR, CFG)
    assert np.isfinite(np.asarray(out.t)).all()
    assert np.isfinite(np.asarray(out.R)).all()
    # divergence guard keeps the pose at (or very near) the previous one
    assert np.linalg.norm(np.asarray(out.t) - np.asarray(state.t)) <= 0.3 + 1e-6
    # map untouched by an invalid frame (nothing valid to fuse)
    assert int(out.map.count) <= int(state.map.count)


def test_step_on_half_occluded_frame():
    state = _bootstrap()
    scene = synth.default_room()
    poses = synth.orbit_trajectory(2)
    d, c = synth.render_frame(scene, jnp.asarray(poses[1]), INTR)
    d = d.at[:, :32].set(0.0)  # kill the left half (sensor dropout)
    out = slam.step(state, slam.FrameInput(depth=d, rgb=c), INTR, CFG)
    assert np.isfinite(np.asarray(out.t)).all()
    err = np.linalg.norm(np.asarray(out.t) - poses[1][:3, 3])
    assert err < 0.05, err


def test_bootstrap_on_empty_frame():
    dead = slam.FrameInput(depth=jnp.zeros((48, 64)),
                           rgb=jnp.zeros((48, 64, 3)))
    state = slam.bootstrap(dead, INTR, CFG)
    assert int(state.map.count) == 0
    assert np.isfinite(np.asarray(state.t)).all()
