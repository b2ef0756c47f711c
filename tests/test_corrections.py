"""O(changed) dense-map corrections (VERDICT r4 next-4): identity fast
path, archive-pass skipping via the covisible-mask invariant, and the
vectorized trajectory rewrite's equivalence with the reference per-frame
loop (HRBFFusion.cpp:457-497)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

INTR = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0,
                        width=64, height=48)
CFG = small_test_config(map_capacity=1 << 13, new_surfels_capacity=1 << 10,
                        use_local_ba=False, predict_conf_threshold=0.2)


def _boot():
    scene = synth.default_room()
    pose = synth.orbit_trajectory(1)[0]
    d, c = synth.render_frame_jit(scene, jnp.asarray(pose), INTR)
    sys_ = FullSLAM(INTR, CFG, init_pose=pose)
    sys_.process(slam.FrameInput(depth=d, rgb=c), timestamp=0.0)
    return sys_


def _delta(tx):
    d = np.eye(4, dtype=np.float32)
    d[0, 3] = tx
    return d


def test_identity_deltas_are_a_no_op():
    sys_ = _boot()
    before = np.asarray(sys_.state.map.data)
    traj_before = [t.copy() for t in sys_.trajectory]
    deltas = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    sys_._apply_correction(deltas, current_kf=0)
    np.testing.assert_array_equal(before, np.asarray(sys_.state.map.data))
    for a, b in zip(traj_before, sys_.trajectory):
        np.testing.assert_array_equal(a, b)


def test_trajectory_rewrite_matches_reference_loop():
    sys_ = _boot()
    rng = np.random.default_rng(3)
    # synthetic multi-keyframe history: frames tagged to submaps 0..3
    sys_.trajectory = [np.asarray(
        np.eye(4) + 0.01 * rng.standard_normal((4, 4)), np.float32)
        for _ in range(12)]
    for t in sys_.trajectory:
        t[3] = [0, 0, 0, 1]
    sys_.kf_of_frame = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    deltas = np.stack([np.eye(4, dtype=np.float32), _delta(0.05),
                       np.eye(4, dtype=np.float32), _delta(-0.02)])
    expect = [t.copy() for t in sys_.trajectory]
    for i, kf in enumerate(sys_.kf_of_frame):   # the reference loop
        expect[i] = (deltas[kf] @ expect[i]).astype(np.float32)
    sys_._apply_correction(deltas, current_kf=3)
    for a, b in zip(expect, sys_.trajectory):
        np.testing.assert_allclose(a, b, atol=1e-6)


def _toy_archive(n=64, submap=5, cap=256):
    data = np.zeros((cap, sm.N_CHANNELS), np.float32)
    data[:n, 0:3] = np.arange(3 * n).reshape(n, 3) * 0.01
    data[:n, sm.SUBMAP] = submap
    data[:n, sm.CONF] = 50.0
    data[:n, sm.VALID] = 1.0
    return sm.SurfelMap(data=jnp.asarray(data), count=jnp.int32(n))


def test_archive_pass_skipped_when_only_active_submaps_move():
    sys_ = _boot()
    sys_.archive = _toy_archive(submap=5)
    sys_._archive_count = 64
    mask = np.zeros(CFG.max_submaps, bool)
    mask[:3] = True          # submaps 0-2 covisible; submap 5 archived
    sys_._active_mask_host = mask
    arch_before = np.asarray(sys_.archive.data).copy()
    deltas = np.stack([np.eye(4, dtype=np.float32), _delta(0.05),
                       np.eye(4, dtype=np.float32)])
    sys_._apply_correction(deltas, current_kf=1)   # only submap 1 moves
    np.testing.assert_array_equal(arch_before, np.asarray(sys_.archive.data))


def test_archive_pass_runs_when_archived_submap_moves():
    sys_ = _boot()
    sys_.archive = _toy_archive(submap=5)
    sys_._archive_count = 64
    mask = np.zeros(CFG.max_submaps, bool)
    mask[:3] = True
    sys_._active_mask_host = mask
    pos_before = np.asarray(sys_.archive.data)[:64, 0:3].copy()
    deltas = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    deltas[5] = _delta(0.1)                        # archived submap moves
    sys_._apply_correction(deltas, current_kf=1)
    pos_after = np.asarray(sys_.archive.data)[:64, 0:3]
    np.testing.assert_allclose(pos_after[:, 0], pos_before[:, 0] + 0.1,
                               atol=1e-6)
    np.testing.assert_allclose(pos_after[:, 1:], pos_before[:, 1:],
                               atol=1e-6)
