"""Active-window / archive map split (cfg.active_capacity,
surfel_map.exchange_active): partition correctness, conservation, and
equivalence with the single-map mode when every submap stays active."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                        width=128, height=96)
CFG = small_test_config(map_capacity=1 << 15, keyframe_period=4,
                        predict_conf_threshold=0.2)


def _toy_map(n_per_submap=50, n_submaps=4, cap=512):
    rng = np.random.default_rng(0)
    n = n_per_submap * n_submaps
    data = np.zeros((cap, sm.N_CHANNELS), np.float32)
    data[:, sm.K1] = 0.0
    data[:, sm.K2] = 0.0
    data[:n, 0:3] = rng.normal(0, 1, (n, 3))
    data[:n, sm.SUBMAP] = np.repeat(np.arange(n_submaps), n_per_submap)
    data[:n, sm.CONF] = 50.0           # stable (no timeout kill)
    data[:n, sm.STAMP] = 1.0
    data[:n, sm.VALID] = 1.0
    data[:n, sm.ACT] = 1.0
    return sm.SurfelMap(data=jnp.asarray(data), count=jnp.int32(n))


def test_exchange_partitions_and_conserves():
    act = _toy_map()
    arch = sm.empty_map(512)
    mask = np.zeros(8, bool)
    mask[[0, 2]] = True              # deactivate submaps 1, 3
    act2, arch2, stats = sm.exchange_active(
        act, arch, jnp.asarray(mask), jnp.int32(5), CFG)
    assert int(stats[2]) == 0
    assert int(act2.count) == 100    # submaps 0, 2
    assert int(arch2.count) == 100   # submaps 1, 3
    a = np.asarray(act2.data)[:100]
    r = np.asarray(arch2.data)[:100]
    assert set(a[:, sm.SUBMAP].astype(int)) == {0, 2}
    assert set(r[:, sm.SUBMAP].astype(int)) == {1, 3}
    assert np.all(a[:, sm.ACT] == 1.0)

    # conservation of surfel identity (positions as the fingerprint)
    orig = np.asarray(act.data)[:200, 0:3]
    now = np.concatenate([a[:, 0:3], r[:, 0:3]])
    assert set(map(tuple, np.round(orig, 5))) == set(map(tuple, np.round(now, 5)))

    # reactivate everything: all rows return to the active map
    act3, arch3, stats3 = sm.exchange_active(
        act2, arch2, jnp.asarray(np.ones(8, bool)), jnp.int32(6), CFG)
    assert int(stats3[2]) == 0
    assert int(act3.count) == 200
    assert int(arch3.count) == 0


def test_exchange_applies_timeout_kill_to_leavers():
    act = _toy_map()
    d = np.asarray(act.data).copy()
    # make submap 1's surfels unstable + old => junk at exchange
    s1 = d[:, sm.SUBMAP] == 1
    d[s1, sm.CONF] = 0.5
    d[s1, sm.STAMP] = 0.0
    act = sm.SurfelMap(data=jnp.asarray(d), count=act.count)
    mask = np.zeros(8, bool)
    mask[[0, 2, 3]] = True
    act2, arch2, _ = sm.exchange_active(
        act, sm.empty_map(512), jnp.asarray(mask),
        jnp.int32(1000), CFG)     # time 1000 >> unstable_time_limit
    assert int(act2.count) == 150
    assert int(arch2.count) == 0  # the leavers were killed, not archived


def test_exchange_overflow_drops_and_reports():
    act = _toy_map(cap=512)
    arch = sm.empty_map(64)       # too small for 100 leavers
    mask = np.zeros(8, bool)
    mask[[0, 2]] = True
    act2, arch2, stats = sm.exchange_active(
        act, arch, jnp.asarray(mask), jnp.int32(5), CFG)
    assert int(arch2.count) == 64
    assert int(stats[2]) == 36


def _run_fullslam(cfg, n=14):
    gt = synth.orbit_trajectory(n, angle_per_frame=0.004)
    scene = synth.default_room()
    sys = FullSLAM(INTR, cfg, backend_kwargs=dict(fast_threshold=8.0),
                   init_pose=gt[0])
    for i in range(n):
        d, c = synth.render_frame(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=float(i))
    return sys


def test_fullslam_split_equals_single_when_all_active():
    """On a short orbit every keyframe stays covisible, so nothing is ever
    archived and the split-mode system must track the single-map one."""
    a = _run_fullslam(CFG)
    b = _run_fullslam(dataclasses.replace(CFG, active_capacity=1 << 15))
    assert int(b.archive.count) == 0 if b.archive is not None else True
    pa, pb = a.poses(), b.poses()
    assert np.max(np.abs(pa - pb)) < 1e-5, np.max(np.abs(pa - pb))
    assert int(a.state.map.count) == int(b.state.map.count)


def test_checkpoint_roundtrip_preserves_archive(tmp_path):
    """save/load must carry the archive (ADVICE r3 medium: a resumed run
    otherwise silently loses every archived surfel)."""
    from hrbffusion3d_tpu.utils import checkpoint

    cfg = dataclasses.replace(CFG, active_capacity=1 << 15)
    sys = _run_fullslam(cfg, n=9)
    kf = int(sys.state.submap_idx)
    mask = np.zeros(cfg.max_submaps, bool)
    mask[kf] = True
    sys._refresh_active(mask)          # force some surfels into the archive
    assert int(sys.archive.count) > 0
    path = str(tmp_path / "ck.bin")
    checkpoint.save(path, sys)

    sys2 = _run_fullslam(cfg, n=2)     # fresh system (bootstrapped)
    checkpoint.load(path, sys2)
    assert sys2.archive is not None
    assert int(sys2.archive.count) == int(sys.archive.count)
    np.testing.assert_array_equal(np.asarray(sys2.archive.data),
                                  np.asarray(sys.archive.data))
    # host mirrors restored from device state
    assert sys2._time_host == int(sys.state.time)
    assert sys2._archive_count == int(sys.archive.count)
    # full_map merges active + archive identically
    assert (int(sys2.full_map().count) == int(sys.full_map().count))


def test_fullslam_split_archives_on_deactivation():
    """Force an active-window change and check surfels flow to the archive
    and the dense pipeline keeps stepping."""
    cfg = dataclasses.replace(CFG, active_capacity=1 << 15)
    sys = _run_fullslam(cfg, n=9)
    total_before = int(sys.state.map.count) + (
        int(sys.archive.count) if sys.archive is not None else 0)
    # deactivate everything but the current submap
    kf = int(sys.state.submap_idx)
    mask = np.zeros(cfg.max_submaps, bool)
    mask[kf] = True
    sys._refresh_active(mask)
    assert sys.archive is not None
    assert int(sys.archive.count) > 0
    total_after = int(sys.state.map.count) + int(sys.archive.count)
    assert total_after <= total_before   # timeout kill may prune leavers
    assert total_after > 0.5 * total_before
    # dense step still runs on the shrunken active map
    gt = synth.orbit_trajectory(12, angle_per_frame=0.004)
    scene = synth.default_room()
    d, c = synth.render_frame(scene, jnp.asarray(gt[9]), INTR)
    sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=9.0)
    assert np.isfinite(np.asarray(sys.state.t)).all()
    # merged export sees both segments
    m = sys.full_map()
    assert int(m.count) == int(sys.state.map.count) + int(sys.archive.count)
