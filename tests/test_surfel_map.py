import dataclasses

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)
CFG = small_test_config(map_capacity=1 << 15)


def _measure(pose):
    scene = synth.default_room()
    depth, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    pre = preprocess.vertex_normal_radius(depth, depth, INTR, CFG)
    curv = preprocess.curvature_gradient(pre, INTR, CFG, chunk=4096)
    pre = preprocess.update_normal_rad(pre, curv, CFG)
    conf = preprocess.confidence_map(pre, curv, INTR, CFG)
    return sm.measurement_from_preprocess(pre, curv, rgb, conf), depth


def test_initialise():
    meas, depth = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG)
    cnt = int(m.count)
    assert cnt > 5000
    assert bool(jnp.all(m.valid[:cnt])) and not bool(jnp.any(m.valid[cnt:]))
    # world == camera frame for identity pose; depths match measurement
    z = np.asarray(m.pos[:cnt, 2])
    assert (z > 0.29).all() and (z <= CFG.depth_cutoff + 1e-5).all()
    # radii positive, normals unit
    assert (np.asarray(m.radius[:cnt]) > 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(m.normal[:cnt]), axis=-1), 1.0, atol=1e-3
    )


def test_render_index_roundtrip():
    meas, depth = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    iv = np.asarray(idx)
    hit = iv >= 0
    assert hit.mean() > 0.5
    # the rendered surfel's depth approximates the measured depth
    d = np.asarray(depth)
    sz = np.asarray(m.pos)[iv[hit], 2]
    close = np.abs(sz - d[hit]) < 0.05
    assert close.mean() > 0.95


def test_render_index_depth_test():
    m = sm.empty_map(8)
    # two surfels projecting to the same pixel; nearer one must win
    data = m.data
    data = data.at[0, sm.POS].set(jnp.array([0.0, 0.0, 2.0])).at[0, sm.VALID].set(1.0)
    data = data.at[1, sm.POS].set(jnp.array([0.0, 0.0, 1.0])).at[1, sm.VALID].set(1.0)
    m = sm.SurfelMap(data=data, count=jnp.int32(2))
    idx = sm.render_index(m, jnp.eye(4), INTR)
    assert int(idx[48, 64]) == 1


def test_fuse_merges_not_grows():
    pose = jnp.eye(4)
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, pose, CFG, time=1)
    c0 = int(m.count)
    conf0 = float(jnp.sum(m.conf * m.valid))
    idx = sm.render_index(m, jnp.eye(4), INTR)
    m2, _ = sm.fuse(m, meas, pose, idx, INTR, CFG, time=1, submap_idx=0)
    c1 = int(m2.count)
    # same-frame refusion: nearly all checkerboard pixels merge
    assert c1 - c0 < 0.02 * c0, (c0, c1)
    assert float(jnp.sum(m2.conf * m2.valid)) > conf0


def test_fuse_adds_new_on_novel_view():
    posesA = np.eye(4, dtype=np.float32)
    measA, _ = _measure(posesA)
    m = sm.initialise(CFG.map_capacity, measA, jnp.asarray(posesA), CFG, time=1)
    c0 = int(m.count)
    # rotate camera: new region becomes visible
    poseB = np.asarray(lie.se3_exp(jnp.array([0, 0, 0, 0.0, 0.5, 0.0])), np.float32)
    measB, _ = _measure(poseB)
    idx = sm.render_index(m, jnp.asarray(np.linalg.inv(poseB)), INTR)
    m2, _ = sm.fuse(m, measB, jnp.asarray(poseB), idx, INTR, CFG, time=2, submap_idx=0)
    assert int(m2.count) > c0 + 100


def test_clean_kills_stale_unstable():
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG, time=1)
    c0 = int(m.count)
    # all surfels have conf < threshold?? typical init conf ~<=1 each; set
    # confidence threshold high so everything is 'unstable'
    cfg = dataclasses.replace(CFG, confidence_threshold=100.0)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    m2 = sm.clean(m, jnp.eye(4), idx, INTR, cfg, time=1 + cfg.unstable_time_limit + 10)
    assert int(m2.count) == 0
    # but recently-seen surfels survive
    m3 = sm.clean(m, jnp.eye(4), idx, INTR, cfg, time=5)
    assert int(m3.count) == c0


def test_compact_preserves_data():
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG)
    keep = m.valid & (jnp.arange(CFG.map_capacity) % 2 == 0)
    m2 = sm.compact(m, keep)
    assert int(m2.count) == int(jnp.sum(keep))
    # first kept surfel is old index 0
    np.testing.assert_allclose(m2.pos[0], m.pos[0])
    np.testing.assert_allclose(m2.pos[1], m.pos[2])


def test_apply_submap_deltas():
    m = sm.empty_map(4)
    data = m.data
    data = data.at[:, sm.POS].set(jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [2, 2, 2]]))
    data = data.at[:, sm.NORMAL].set(jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1)))
    data = data.at[:, sm.SUBMAP].set(jnp.array([0.0, 1, 1, 0]))
    data = data.at[:, sm.VALID].set(jnp.array([1.0, 1, 1, 0]))
    m = sm.SurfelMap(data=data, count=jnp.int32(3))
    shift = jnp.eye(4).at[:3, 3].set(jnp.array([0.0, 0.0, 5.0]))
    deltas = jnp.stack([jnp.eye(4), shift])
    m2 = sm.apply_submap_deltas(m, deltas)
    np.testing.assert_allclose(m2.pos[0], [1, 0, 0], atol=1e-6)      # submap 0: identity
    np.testing.assert_allclose(m2.pos[1], [0, 1, 5], atol=1e-6)      # submap 1: +5z
    np.testing.assert_allclose(m2.pos[3], [2, 2, 2], atol=1e-6)      # invalid untouched


def test_fuse_respects_capacity():
    cfg = dataclasses.replace(CFG, map_capacity=1000)
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(cfg.map_capacity, meas, jnp.eye(4), cfg)
    assert int(m.count) == 1000
    assert bool(jnp.all(m.valid))


def test_grow_is_observably_identical():
    """Capacity bucketing: a map grown mid-sequence must behave bit-exactly
    like one allocated large from the start (dead-row values never leak)."""
    import dataclasses

    from hrbffusion3d_tpu.pipeline import slam

    scene = synth.default_room()
    poses = synth.orbit_trajectory(4, angle_per_frame=0.004)
    frames = []
    for i in range(4):
        d, c = synth.render_frame(scene, jnp.asarray(poses[i]), INTR)
        frames.append(slam.FrameInput(depth=d, rgb=c))

    cfg_small = dataclasses.replace(CFG, map_capacity=1 << 14)
    cfg_big = dataclasses.replace(CFG, map_capacity=1 << 16)

    # small run with aggressive growth (threshold 0.3 -> grows to 1<<16
    # right after bootstrap)
    state = slam.bootstrap(frames[0], INTR, cfg_small, init_pose=poses[0])
    cfg_cur = cfg_small
    for f in frames[1:]:
        state, cfg_cur = slam.ensure_capacity(state, cfg_cur, threshold=0.3)
        state = slam.step(state, f, INTR, cfg_cur)
    assert cfg_cur.map_capacity == 1 << 16

    # big run, no growth
    state_b = slam.bootstrap(frames[0], INTR, cfg_big, init_pose=poses[0])
    for f in frames[1:]:
        state_b = slam.step(state_b, f, INTR, cfg_big)

    assert int(state.map.count) == int(state_b.map.count)
    n = int(state.map.count)
    np.testing.assert_array_equal(np.asarray(state.map.data[:n]),
                                  np.asarray(state_b.map.data[:n]))
    np.testing.assert_array_equal(np.asarray(state.t), np.asarray(state_b.t))


def test_grow_unit():
    m = sm.empty_map(64)
    m2 = sm.grow(m, 256)
    assert m2.data.shape == (256, 24)
    assert int(m2.count) == 0
    # pristine rows: curvature sentinel, invalid
    assert np.all(np.asarray(m2.data[:, sm.K1]) == 1000.0)
    assert sm.grow(m2, 128).data.shape[0] == 256  # never shrinks


def test_clean_compact_period():
    """Tombstone + periodic compaction tracks the compact-every-frame run:
    same kills, same live surfel count, near-identical trajectory."""
    from hrbffusion3d_tpu.pipeline import slam

    scene = synth.default_room()
    poses = synth.orbit_trajectory(5, angle_per_frame=0.004)
    frames = []
    for i in range(5):
        d, c = synth.render_frame(scene, jnp.asarray(poses[i]), INTR)
        frames.append(slam.FrameInput(depth=d, rgb=c))

    def run(cfg):
        state = slam.bootstrap(frames[0], INTR, cfg, init_pose=poses[0])
        for f in frames[1:]:
            state = slam.step(state, f, INTR, cfg)
        return state

    s1 = run(CFG)
    s2 = run(dataclasses.replace(CFG, clean_compact_period=3))

    live1 = int(np.asarray(s1.map.valid).sum())
    live2 = int(np.asarray(s2.map.valid).sum())
    assert abs(live1 - live2) <= 0.01 * max(live1, 1), (live1, live2)
    # tombstoned rows are truly dead
    v2 = np.asarray(s2.map.valid)
    assert int(s2.map.count) >= live2
    assert not v2[int(s2.map.count):].any()
    np.testing.assert_allclose(np.asarray(s2.t), np.asarray(s1.t), atol=2e-3)


def test_fuse_gather_quarter_matches_slice():
    # the two quarter-view formulations (row gather vs stride-2 slice)
    # must be bit-identical for both checkerboard parities
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    pose = jnp.eye(4)
    m = sm.initialise(CFG.map_capacity, meas, pose, CFG, time=1)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg_g = dataclasses.replace(CFG, fuse_gather_quarter=True)
    cfg_s = dataclasses.replace(CFG, fuse_gather_quarter=False)
    for t in (1, 2):
        mg, ig = sm.fuse(m, meas, pose, idx, INTR, cfg_g, time=t, submap_idx=0)
        ms, is_ = sm.fuse(m, meas, pose, idx, INTR, cfg_s, time=t, submap_idx=0)
        np.testing.assert_array_equal(np.asarray(mg.data), np.asarray(ms.data))
        assert int(mg.count) == int(ms.count)
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(is_))


def test_incremental_active_mask_matches_full_gather():
    # step() patches the pre-fuse submap-activity gather with the appended
    # block instead of re-gathering post-fuse; verify the identity
    import jax

    meas, _ = _measure(np.eye(4, dtype=np.float32))
    pose = jnp.eye(4)
    m = sm.initialise(CFG.map_capacity, meas, pose, CFG, time=1)
    n_cap = m.data.shape[0]
    act_sub = jnp.zeros((16,), bool).at[0].set(True).at[3].set(True)
    # scatter some surfels into another submap to make the mask non-trivial
    data = m.data.at[100:200, sm.SUBMAP].set(7.0)   # inactive submap
    data = data.at[200:300, sm.SUBMAP].set(3.0)     # active submap
    m = sm.SurfelMap(data=data, count=m.count)

    sub_act = act_sub[jnp.clip(m.submap, 0, act_sub.shape[0] - 1)]
    idx = sm.render_index(m, jnp.eye(4), INTR, active=m.valid & sub_act)
    poseB = np.asarray(lie.se3_exp(jnp.array([0, 0, 0, 0.0, 0.1, 0.0])), np.float32)
    measB, _ = _measure(poseB)
    submap_idx = jnp.int32(3)
    m2, _ = sm.fuse(m, measB, jnp.asarray(poseB), idx, INTR, CFG,
                    time=2, submap_idx=submap_idx)

    P = (INTR.height // 2) * (INTR.width // 2)
    S = min(CFG.new_surfels_capacity, P, n_cap)
    start = jnp.clip(m.count, 0, n_cap - S)
    cur = jnp.broadcast_to(act_sub[submap_idx], (S,))
    sub_act2 = jax.lax.dynamic_update_slice(sub_act, cur, (start,))
    incremental = m2.valid & sub_act2
    full = sm.active_from_submaps(m2, act_sub)
    np.testing.assert_array_equal(np.asarray(incremental), np.asarray(full))


def test_clean_crowd_period_gates_crowd_rules():
    """clean_crowd_period > 1: the crowd/free-space rules fire only on
    period frames; the elementwise rules (unstable-kill) run every frame."""
    meas, _ = _measure(np.eye(4, dtype=np.float32))
    m = sm.initialise(CFG.map_capacity, meas, jnp.eye(4), CFG, time=1)
    idx = sm.render_index(m, jnp.eye(4), INTR)
    cfg = dataclasses.replace(CFG, clean_crowd_period=2)
    # period=2: off-frame (odd time) keep mask must be a superset of the
    # on-frame (even time) mask with identical elementwise rules
    keep_on = np.asarray(sm.clean_mask(m, jnp.eye(4), idx, INTR, cfg, time=2))
    keep_off = np.asarray(sm.clean_mask(m, jnp.eye(4), idx, INTR, cfg, time=3))
    assert (keep_off | ~keep_on).all() or (keep_off >= keep_on).all()
    # on-frame equals the every-frame config at the same time
    keep_ref = np.asarray(sm.clean_mask(m, jnp.eye(4), idx, INTR, CFG, time=2))
    assert (keep_on == keep_ref).all()
    # unstable-kill still fires on an off-frame
    cfg_hi = dataclasses.replace(cfg, confidence_threshold=100.0)
    m2 = sm.clean(m, jnp.eye(4), idx, INTR, cfg_hi,
                  time=1 + cfg.unstable_time_limit + 11)  # odd time
    assert int(m2.count) == 0
