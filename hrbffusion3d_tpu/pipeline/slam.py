"""The SLAM engine: a pure functional ``step(state, frame) -> state``.

TPU-native replacement for ``HRBFFusion::processFrame``
(``Core/src/HRBFFusion.cpp:991-1241``) — the per-frame pipeline
upload -> preprocess -> track -> fuse -> clean -> predict, with all mutexes,
condvars, GL textures and CUDA-GL interop replaced by one jitted pure
function over a ``SLAMState`` pytree.

The sparse backend (keyframes / local BA / loop closure — HRBFFusion.cpp
:1136-1188) hooks in between track and fuse via the ``backend`` package; the
dense side only consumes its per-submap delta transforms
(``apply_submap_deltas``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import lie
from ..map import surfel_map as sm
from ..ops import preprocess, pyramid, raycast
from ..tracking import odometry


class SLAMState(NamedTuple):
    map: sm.SurfelMap
    R: jnp.ndarray                # (3,3) current pose (world <- camera)
    t: jnp.ndarray                # (3,)
    time: jnp.ndarray             # () int32 frame counter (tick)
    submap_idx: jnp.ndarray       # () int32 current submap/keyframe index
    prev_intensity: jnp.ndarray   # (H,W) previous live intensity (SO3)
    pred_vertex: jnp.ndarray      # (H,W,3) prediction, current camera frame
    pred_normal: jnp.ndarray
    pred_intensity: jnp.ndarray   # (H,W) predicted grey
    pred_icp_weight: jnp.ndarray  # (H,W)
    pred_k1: jnp.ndarray          # (H,W) predicted curvature (corr. search)
    pred_k2: jnp.ndarray
    active_submaps: jnp.ndarray   # (max_submaps,) bool — covisible-KF set
                                  # masking render/fusion/clean
                                  # (index_map.vert:41-51, HRBFFusion.cpp:1160-1170)
    last_icp_error: jnp.ndarray
    last_icp_count: jnp.ndarray
    dense_frac: jnp.ndarray       # () denseEnough indicator of last predict


class FrameInput(NamedTuple):
    depth: jnp.ndarray   # (H,W) metric depth (0 = invalid)
    rgb: jnp.ndarray     # (H,W,3) in [0,1]


def _preprocess(frame: FrameInput, intr: CameraIntrinsics, cfg: SLAMConfig):
    """HRBFFusion.cpp:1016-1022: filter -> metricise -> vertex/normal/radius
    -> curvature/gradient -> update normal."""
    if cfg.use_bilateral_filter:
        if cfg.use_pallas:
            from ..ops import pallas_kernels

            depth_f = pallas_kernels.bilateral_filter(frame.depth, cfg)
        else:
            depth_f = preprocess.bilateral_filter(frame.depth, cfg)
    else:
        depth_f = frame.depth
    pre = preprocess.vertex_normal_radius(frame.depth, depth_f, intr, cfg)
    if cfg.use_pallas:
        from ..ops import pallas_kernels

        curv = pallas_kernels.curvature_gradient(pre, intr, cfg)
    else:
        curv = preprocess.curvature_gradient(pre, intr, cfg, chunk=cfg.curvature_chunk)
    pre = preprocess.update_normal_rad(pre, curv, cfg)
    intensity = pyramid.rgb_to_intensity(frame.rgb)
    return depth_f, pre, curv, intensity


def bootstrap(frame: FrameInput, intr: CameraIntrinsics, cfg: SLAMConfig,
              init_pose: jnp.ndarray | None = None) -> SLAMState:
    """First-frame initialisation (HRBFFusion.cpp:1026-1059).

    Jitted as ONE graph: the eager formulation dispatched hundreds of
    individual ops through the remote-TPU tunnel, each a ~0.4 s remote
    compile that jax by default refuses to persist (< 1 s) — measured
    124-280 s of pure per-process overhead before the first frame
    (NOTES_R5 warm-process attribution)."""
    pose = jnp.eye(4) if init_pose is None else jnp.asarray(init_pose)
    return _bootstrap_jit(frame, pose, intr, cfg)


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def _bootstrap_jit(frame: FrameInput, pose: jnp.ndarray,
                   intr: CameraIntrinsics, cfg: SLAMConfig) -> SLAMState:
    depth_f, pre, curv, intensity = _preprocess(frame, intr, cfg)
    conf = preprocess.confidence_map(pre, curv, intr, cfg, weighting=1.0)
    meas = sm.measurement_from_preprocess(pre, curv, frame.rgb, conf)
    m = sm.initialise(cfg.map_capacity, meas, pose, cfg, time=1, submap_idx=0)

    pose_inv = lie.se3_inverse(pose)
    idx = sm.render_index(m, pose_inv, intr)
    pred = raycast.predict_hrbf(m, pose_inv, idx, intr, cfg, chunk=cfg.raycast_chunk)
    filled = raycast.fill_in(
        pred, pre.vertex_filtered, pre.normal, pre.radius, frame.rgb,
        conf, curv.k1, curv.k2, cfg,
    )
    return SLAMState(
        map=m, R=pose[:3, :3], t=pose[:3, 3],
        time=jnp.int32(1), submap_idx=jnp.int32(0),
        prev_intensity=intensity,
        pred_vertex=filled.vertex, pred_normal=filled.normal,
        pred_intensity=pyramid.rgb_to_intensity(filled.color),
        pred_icp_weight=filled.icp_weight,
        pred_k1=filled.k1, pred_k2=filled.k2,
        active_submaps=jnp.ones((cfg.max_submaps,), bool),
        last_icp_error=jnp.float32(0), last_icp_count=jnp.float32(0),
        dense_frac=jnp.mean(filled.from_model.astype(jnp.float32)),
    )


def step_impl(state: SLAMState, frame: FrameInput, intr: CameraIntrinsics,
              cfg: SLAMConfig,
              fixed_pose: jnp.ndarray | None = None,
              pre_done=None) -> SLAMState:
    """One tracked+fused frame (HRBFFusion.cpp:991-1241, BA hooks excluded).

    ``fixed_pose``: optional (4,4) camera-to-world pose.  When given,
    tracking is skipped and the pose is taken as-is — the reference's
    ``globalInputLoadTrajectory`` replay mode (HRBFFusion.cpp:57-61,
    1105-1108), which isolates fusion/prediction from tracking.
    ``pre_done``: optional precomputed ``_preprocess`` result — step_many
    batches preprocessing across its frames (it is frame-local, so a vmap
    outside the scan runs it with 7x bigger shapes and 7x fewer
    fixed-cost ops than re-tracing it inside every scan iteration)."""
    time = state.time + 1
    if pre_done is None:
        depth_f, pre, curv, intensity = _preprocess(frame, intr, cfg)
    else:
        depth_f, pre, curv, intensity = pre_done

    if fixed_pose is None:
        # ---- TRACKING (frame-to-model, l.1063-1109) ----
        inp = odometry.build_inputs(
            next_depth=depth_f,
            next_intensity=intensity,
            next_vmap=pre.vertex_filtered,
            next_nmap=pre.normal,
            pred_vmap=state.pred_vertex,
            pred_nmap=state.pred_normal,
            pred_intensity=state.pred_intensity,
            icp_weight=state.pred_icp_weight,
            prev_R=state.R, prev_t=state.t,
            prev_intensity=state.prev_intensity,
            cfg=cfg,
            **({
                "next_k1": curv.k1, "next_k2": curv.k2,
                "pred_k1": state.pred_k1, "pred_k2": state.pred_k2,
            } if cfg.icp_use_correspondence_search else {}),
            **({"sal_k1": curv.k1, "sal_k2": curv.k2}
               if cfg.tracking_topk > 0 else {}),
        )
        tr = odometry.track(state.R, state.t, inp, intr, cfg)
        new_R, new_t = tr.R, tr.t
        icp_error, icp_count = tr.icp_error, tr.icp_count
    else:
        new_R = fixed_pose[:3, :3]
        new_t = fixed_pose[:3, 3]
        icp_error = jnp.float32(0.0)
        icp_count = jnp.float32(0.0)
    pose = lie.rt_to_mat(new_R, new_t)
    pose_inv = lie.se3_inverse(pose)

    # ---- velocity weighting (l.1112-1126): down-weight fast motion ----
    dt = jnp.linalg.norm(new_t - state.t)
    w_rot = jnp.linalg.norm(lie.so3_log(state.R.T @ new_R))
    weighting = jnp.clip(1.0 - (dt * 5.0 + w_rot * 2.0), 0.25, 1.0)
    conf = preprocess.confidence_map(pre, curv, intr, cfg, weighting=weighting)
    meas = sm.measurement_from_preprocess(pre, curv, frame.rgb, conf)

    # ---- FUSION (l.1192-1227) ----
    # ONE z-buffer render per frame: fuse updates the index map in place
    # (new surfels at their own pixels), clean translates it through the
    # compaction remap for prediction.
    # ZERO per-surfel submap-activity gathers per frame: the activity flag
    # is cached in the map's ACT channel (see surfel_map.py header) —
    # appends carry the current submap's activity, merges keep the old
    # flag, and the host refreshes the channel when the covisible set
    # changes (FullSLAM keyframe insert).
    act_cur = state.active_submaps[
        jnp.clip(state.submap_idx, 0, state.active_submaps.shape[0] - 1)]
    idx = sm.render_index(state.map, pose_inv, intr, active=state.map.active)
    m, idx2 = sm.fuse(state.map, meas, pose, idx, intr, cfg, time=time,
                      submap_idx=state.submap_idx, act=act_cur)
    # ONE extended attr render after fuse, shared by clean and prediction:
    # clean reads the base channels; prediction reads the same image with
    # clean-killed pixels masked out (surviving surfels' attribute VALUES
    # are untouched by clean — compaction only relocates rows — so this is
    # identical to re-rendering after clean)
    attr_ext = sm.render_attr_image(m, idx2, pose_inv, extended=True)
    m, remap = sm.clean_with_remap(m, pose, idx2, intr, cfg, time=time,
                                   attr=attr_ext[..., :sm.ATTR_CHANNELS])

    # ---- PREDICTION (l.1233, predict() 1244-1260) ----
    # translate the post-fuse render through the compaction instead of a
    # third full z-buffer render (IndexMap::predictIndices); fresh unstable
    # surfels are below the prediction confidence threshold either way.
    # On tombstone frames the translation happens in pixel space (no
    # gather — see surfel_map.pixel_keep_mask)
    cp = max(cfg.clean_compact_period, 1)
    cw = max(cfg.clean_crowd_period, 1)
    if cfg.clean_pixel_remap and cp > 1 and cw > 1:
        keep_pix = sm.pixel_keep_mask(attr_ext, cfg, time)
        idx3 = jax.lax.cond(
            (time % cp != 0) & (time % cw != 0),
            lambda: jnp.where((idx2 >= 0) & keep_pix, idx2, -1),
            lambda: sm.remap_index_map(idx2, remap))
    else:
        idx3 = sm.remap_index_map(idx2, remap)
    pred_attr = jnp.where((idx3 >= 0)[..., None], attr_ext, 0.0)
    if cfg.raycast_period > 1:
        # HRBF raycast every N-th frame, surfel-splat prediction in between
        # (combinedPredict alternative path); lax.cond runs only the taken
        # branch, so the off-frames skip the raycast kernel entirely
        pred = jax.lax.cond(
            time % cfg.raycast_period == 0,
            lambda: raycast.predict_hrbf(m, pose_inv, idx3, intr, cfg,
                                         chunk=cfg.raycast_chunk,
                                         attr_ext=pred_attr),
            lambda: raycast.predict_splat(m, pose_inv, idx3, intr, cfg),
        )
    else:
        pred = raycast.predict_hrbf(m, pose_inv, idx3, intr, cfg,
                                    chunk=cfg.raycast_chunk,
                                    attr_ext=pred_attr)
    filled = raycast.fill_in(
        pred, pre.vertex_filtered, pre.normal, pre.radius, frame.rgb,
        conf, curv.k1, curv.k2, cfg,
    )

    return SLAMState(
        map=m, R=new_R, t=new_t, time=time, submap_idx=state.submap_idx,
        prev_intensity=intensity,
        pred_vertex=filled.vertex, pred_normal=filled.normal,
        pred_intensity=pyramid.rgb_to_intensity(filled.color),
        pred_icp_weight=filled.icp_weight,
        pred_k1=filled.k1, pred_k2=filled.k2,
        active_submaps=state.active_submaps,
        last_icp_error=icp_error, last_icp_count=icp_count,
        dense_frac=jnp.mean(filled.from_model.astype(jnp.float32)),
    )


step = jax.jit(step_impl, static_argnames=("intr", "cfg"))


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def step_many(state: SLAMState, frames: FrameInput, intr: CameraIntrinsics,
              cfg: SLAMConfig):
    """Process a batch of stacked frames in ONE device dispatch via
    lax.scan — amortises host->device dispatch latency across frames (the
    per-call overhead through the remote TPU path measures ~27 ms, most of
    a 30 fps frame budget).  frames: FrameInput with leading frame axis.
    Returns (final state, (N,3) per-frame translations)."""

    pres = jax.vmap(lambda f: _preprocess(f, intr, cfg))(frames)

    def body(s, fp):
        f, pre_done = fp
        s2 = step_impl(s, f, intr, cfg, pre_done=pre_done)
        return s2, s2.t

    return jax.lax.scan(body, state, (frames, pres))


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def step_many_unrolled(state: SLAMState, frames: FrameInput,
                       intr: CameraIntrinsics, cfg: SLAMConfig):
    """step_many with the scan fully unrolled (lax.scan(unroll=True)):
    straight-line HLO lets XLA alias the state buffers across iterations
    instead of double-buffering the while-loop carry — the ~5 ms/frame of
    unattributed ``copy.*`` ops in the r3 roofline (NOTES_R3 scan-carry
    item).  Costs ~k-times the HLO size (compile time), identical math."""

    pres = jax.vmap(lambda f: _preprocess(f, intr, cfg))(frames)

    def body(s, fp):
        f, pre_done = fp
        s2 = step_impl(s, f, intr, cfg, pre_done=pre_done)
        return s2, s2.t

    return jax.lax.scan(body, state, (frames, pres), unroll=True)


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def step_many_traj(state: SLAMState, frames: FrameInput,
                   intr: CameraIntrinsics, cfg: SLAMConfig):
    """step_many returning full per-frame poses: (final state, (N,4,4))
    camera-to-world — the batched path of FullSLAM.process_batch needs the
    whole trajectory chunk, not just translations."""
    from ..core import lie as _lie

    pres = jax.vmap(lambda f: _preprocess(f, intr, cfg))(frames)

    def body(s, fp):
        f, pre_done = fp
        s2 = step_impl(s, f, intr, cfg, pre_done=pre_done)
        return s2, _lie.rt_to_mat(s2.R, s2.t)

    return jax.lax.scan(body, state, (frames, pres))


# single-frame replay: the jitted ``step`` already accepts
# ``fixed_pose`` — step(state, frame, intr, cfg, fixed_pose=pose)


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def step_chunk(state: SLAMState, frames: FrameInput,
               intr: CameraIntrinsics, cfg: SLAMConfig):
    """step_many_traj plus ONE packed host-sync vector.

    Through the remote-TPU tunnel every device->host fetch costs a full
    round trip (~a dispatch, NOTES_R1); FullSLAM.process_batch previously
    paid several per chunk (poses, map count, time, submap).  Everything
    the host loop needs is concatenated into a single flat array here:
      packed = [poses.ravel() (k*16), map.count, last_icp_error,
                last_icp_count, dense_frac]
    Returns (final state, packed (k*16+4,))."""
    from ..core import lie as _lie

    pres = jax.vmap(lambda f: _preprocess(f, intr, cfg))(frames)

    def body(s, fp):
        f, pre_done = fp
        s2 = step_impl(s, f, intr, cfg, pre_done=pre_done)
        return s2, _lie.rt_to_mat(s2.R, s2.t)

    state2, poses = jax.lax.scan(body, state, (frames, pres))
    aux = jnp.stack([state2.map.count.astype(jnp.float32),
                     state2.last_icp_error,
                     state2.last_icp_count,
                     state2.dense_frac])
    packed = jnp.concatenate([poses.reshape(-1), aux])
    return state2, packed


@functools.partial(jax.jit, static_argnames=("intr", "cfg"))
def step_many_replay(state: SLAMState, frames: FrameInput,
                     poses: jnp.ndarray, intr: CameraIntrinsics,
                     cfg: SLAMConfig):
    """Scan-batched trajectory replay: like ``step_many`` but tracking is
    skipped and per-frame (N,4,4) camera-to-world ``poses`` are used
    directly (globalInputLoadTrajectory, HRBFFusion.cpp:1105-1108)."""

    def body(s, fp):
        f, p = fp
        s2 = step_impl(s, f, intr, cfg, fixed_pose=p)
        return s2, s2.t

    return jax.lax.scan(body, state, (frames, poses))


def ensure_capacity(state: SLAMState, cfg: SLAMConfig,
                    threshold: float = 0.75,
                    frames_ahead: int = 1,
                    count: int | None = None):
    """Host-side capacity bucketing (between jitted steps): when the live
    surfel count crosses ``threshold`` of capacity, double the map's
    backing array (power-of-2 buckets — each bucket gets its own cached
    jit specialisation).  Returns (state, cfg) — cfg carries the new
    ``map_capacity``.  The reference instead allocates 21.1M surfels up
    front (GlobalModel.cpp:21-22) and drops data when full; here every map
    op costs proportional to static capacity, so buckets keep per-frame
    cost proportional to the live map.

    ``count``: pass the already-fetched live count (step_chunk's packed
    sync) to avoid an extra device->host round trip per call."""
    import dataclasses

    if count is None:
        count = int(state.map.count)
    cap = cfg.map_capacity
    if count <= threshold * cap:
        return state, cfg
    new_cap = cap
    while count > threshold * new_cap:
        new_cap *= 2
    return (state._replace(map=sm.grow(state.map, new_cap)),
            dataclasses.replace(cfg, map_capacity=new_cap))


def run_sequence(frames, intr: CameraIntrinsics, cfg: SLAMConfig,
                 init_pose=None, grow: bool = True,
                 input_trajectory=None, stats=None):
    """Host-side frame loop (MainController::run equivalent).  ``frames`` is
    an iterable of FrameInput; returns (final state, poses (N,4,4)).

    ``input_trajectory``: optional (N,4,4) camera-to-world poses — replay
    mode: tracking is skipped, fusion/prediction run against the given
    poses (globalInputLoadTrajectory, HRBFFusion.cpp:57-61,1105-1108).
    ``stats``: optional viz.stats.StatsLogger — per-frame scalar stream
    (the GUI's live ICP-residual/inlier plots, HRBF_fusion.cpp:284-296)."""
    import numpy as np

    state = None
    poses = []
    for i, f in enumerate(frames):
        if state is None:
            p0 = (input_trajectory[0] if input_trajectory is not None
                  else init_pose)
            state = bootstrap(f, intr, cfg, p0)
        elif input_trajectory is not None:
            state = step(state, f, intr, cfg,
                         fixed_pose=jnp.asarray(input_trajectory[i]))
        else:
            state = step(state, f, intr, cfg)
        if grow:
            state, cfg = ensure_capacity(state, cfg)
        poses.append(np.asarray(lie.rt_to_mat(state.R, state.t)))
        if stats is not None:
            stats.log_state(i, state)
    return state, np.stack(poses)
