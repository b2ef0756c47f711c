"""Global surfel map: fixed-capacity SoA arrays + fusion/cleaning ops.

TPU-native replacement for the reference's OpenGL ``GlobalModel``
(``Core/src/GlobalModel.cpp`` + ``data.vert``/``update.vert``/
``copy_unstable.vert``/``init_unstableTex.vert``/``update_delta_trans.vert``):
the double-buffered VBO ping-pong + transform feedback machinery becomes a
pytree of fixed-capacity arrays updated functionally; the GL point render of
the index map becomes a deterministic z-buffered scatter; stream compaction
becomes cumsum + scatter.

Surfel attribute layout (reference: 5 x vec4 = 80 B/surfel,
``Vertex.cpp:44``, attribute pointers ``GlobalModel.cpp:491-506``):
  [pos, conf] [color(enc), submap, init_time, stamp] [normal, radius]
  [curv_dir1, k1] [curv_dir2, k2]
Here each component is its own array (SoA — the layout the VPU wants);
color stays as 3 floats (no encode/decode packing needed on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera
from ..ops.preprocess import CurvatureResult, VertexNormalRadius

CURV_SENTINEL = 1000.0


class SurfelMap(NamedTuple):
    pos: jnp.ndarray        # (N,3) world position
    conf: jnp.ndarray       # (N,)
    color: jnp.ndarray      # (N,3)
    submap: jnp.ndarray     # (N,) int32 keyframe/submap index
    init_time: jnp.ndarray  # (N,) int32 creation frame
    stamp: jnp.ndarray      # (N,) int32 last merge/creation frame
    normal: jnp.ndarray     # (N,3) world normal (unit)
    radius: jnp.ndarray     # (N,) support radius
    curv_dir1: jnp.ndarray  # (N,3)
    k1: jnp.ndarray         # (N,)
    curv_dir2: jnp.ndarray  # (N,3)
    k2: jnp.ndarray         # (N,)
    valid: jnp.ndarray      # (N,) bool
    count: jnp.ndarray      # () int32 — number of live surfels (prefix)


def empty_map(capacity: int) -> SurfelMap:
    z = jnp.zeros
    return SurfelMap(
        pos=z((capacity, 3)), conf=z((capacity,)), color=z((capacity, 3)),
        submap=z((capacity,), jnp.int32), init_time=z((capacity,), jnp.int32),
        stamp=z((capacity,), jnp.int32), normal=z((capacity, 3)),
        radius=z((capacity,)),
        curv_dir1=z((capacity, 3)), k1=jnp.full((capacity,), CURV_SENTINEL),
        curv_dir2=z((capacity, 3)), k2=jnp.full((capacity,), CURV_SENTINEL),
        valid=z((capacity,), bool), count=jnp.int32(0),
    )


class FrameMeasurement(NamedTuple):
    """Per-pixel measurement set produced by preprocessing, all (H,W,...)
    camera-frame; the input side of init/fuse (data.vert inputs)."""

    vertex: jnp.ndarray     # (H,W,3) raw-depth vertex (positions to integrate)
    vertex_f: jnp.ndarray   # (H,W,3) filtered vertex (normals/radius source)
    normal: jnp.ndarray     # (H,W,3)
    radius: jnp.ndarray     # (H,W)
    color: jnp.ndarray      # (H,W,3)
    conf: jnp.ndarray       # (H,W)
    k1: jnp.ndarray         # (H,W)
    k2: jnp.ndarray         # (H,W)
    curv_dir1: jnp.ndarray  # (H,W,3) camera frame
    curv_dir2: jnp.ndarray  # (H,W,3)


def measurement_from_preprocess(pre: VertexNormalRadius, curv: CurvatureResult,
                                color: jnp.ndarray, conf: jnp.ndarray) -> FrameMeasurement:
    return FrameMeasurement(
        vertex=pre.vertex_raw, vertex_f=pre.vertex_filtered, normal=pre.normal,
        radius=pre.radius, color=color, conf=conf,
        k1=curv.k1, k2=curv.k2, curv_dir1=curv.dir1, curv_dir2=curv.dir2,
    )


def _measurement_valid(m: FrameMeasurement, cfg: SLAMConfig) -> jnp.ndarray:
    """Validity gate shared by initialise and fuse (data.vert:113-119 minus
    the checkerboard): normal length, depth range, curvature in bounds."""
    t = cfg.curv_valid_threshold
    return (
        (jnp.linalg.norm(m.normal, axis=-1) > 0.8)
        & (m.vertex[..., 2] > cfg.depth_min)
        & (m.vertex[..., 2] <= cfg.depth_cutoff)
        & (m.k1 > -t) & (m.k1 < t) & (m.k2 > -t) & (m.k2 < t)
    )


def _append(m: SurfelMap, new_fields: dict, new_mask: jnp.ndarray) -> SurfelMap:
    """Append up to sum(new_mask) new surfels after m.count (drops overflow
    past capacity).  new arrays are flat (P, ...) pixel-indexed."""
    capacity = m.pos.shape[0]
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = m.count + rank
    ok = new_mask & (dest < capacity)
    dest = jnp.where(ok, dest, capacity)  # scatter to dump slot
    def put(arr, new):
        padded = jnp.concatenate([arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
        padded = padded.at[dest].set(new.astype(arr.dtype), mode="drop")
        return padded[:capacity]
    out = m._replace(
        pos=put(m.pos, new_fields["pos"]),
        conf=put(m.conf, new_fields["conf"]),
        color=put(m.color, new_fields["color"]),
        submap=put(m.submap, new_fields["submap"]),
        init_time=put(m.init_time, new_fields["init_time"]),
        stamp=put(m.stamp, new_fields["stamp"]),
        normal=put(m.normal, new_fields["normal"]),
        radius=put(m.radius, new_fields["radius"]),
        curv_dir1=put(m.curv_dir1, new_fields["curv_dir1"]),
        k1=put(m.k1, new_fields["k1"]),
        curv_dir2=put(m.curv_dir2, new_fields["curv_dir2"]),
        k2=put(m.k2, new_fields["k2"]),
        valid=put(m.valid, jnp.ones_like(ok)) ,
        count=jnp.minimum(m.count + jnp.sum(ok.astype(jnp.int32)), capacity),
    )
    # valid must only be set where ok (put sets True at dump slot drops)
    return out._replace(valid=(jnp.arange(capacity) < out.count))


def _frame_fields(m: FrameMeasurement, pose: jnp.ndarray, submap_idx, time,
                  conf_override=None):
    """Flattened world-frame surfel attributes from a measurement."""
    h, w = m.radius.shape
    P = h * w
    R = pose[:3, :3]
    t = pose[:3, 3]
    pos_w = (m.vertex.reshape(P, 3) @ R.T) + t
    nrm_w = m.normal.reshape(P, 3) @ R.T
    d1_w = m.curv_dir1.reshape(P, 3) @ R.T
    d2_w = m.curv_dir2.reshape(P, 3) @ R.T
    conf = (m.conf if conf_override is None else conf_override).reshape(P)
    return dict(
        pos=pos_w, conf=conf, color=m.color.reshape(P, 3),
        submap=jnp.full((P,), submap_idx, jnp.int32),
        init_time=jnp.full((P,), time, jnp.int32),
        stamp=jnp.full((P,), time, jnp.int32),
        normal=nrm_w, radius=m.radius.reshape(P),
        curv_dir1=d1_w, k1=m.k1.reshape(P),
        curv_dir2=d2_w, k2=m.k2.reshape(P),
    )


def initialise(capacity: int, m: FrameMeasurement, pose: jnp.ndarray,
               cfg: SLAMConfig, time: int = 1, submap_idx: int = 0) -> SurfelMap:
    """First-frame map init (GlobalModel::initialise + init_unstableTex.vert:
    every valid pixel becomes a surfel)."""
    sm = empty_map(capacity)
    ok = _measurement_valid(m, cfg).reshape(-1)
    fields = _frame_fields(m, pose, submap_idx, time)
    return _append(sm, fields, ok)


def render_index(m: SurfelMap, pose_inv: jnp.ndarray, intr: CameraIntrinsics,
                 active: jnp.ndarray | None = None,
                 conf_threshold: float | None = None) -> jnp.ndarray:
    """Z-buffered point render of the map into a (H, W) int32 index grid
    (-1 = empty).  Replaces IndexMap::predictIndices (IndexMap.cpp:193-267,
    index_map.vert:34-66): nearest-depth surfel per pixel, deterministic ties
    by smallest surfel index; ``active`` masks by submap activity
    (index_map.vert:41-51), ``conf_threshold`` culls unstable surfels when
    requested by the consumer."""
    h, w = intr.height, intr.width
    n = m.pos.shape[0]
    local = m.pos @ pose_inv[:3, :3].T + pose_inv[:3, 3]
    z = local[:, 2]
    u = jnp.round(local[:, 0] * intr.fx / jnp.where(z != 0, z, 1e12) + intr.cx).astype(jnp.int32)
    v = jnp.round(local[:, 1] * intr.fy / jnp.where(z != 0, z, 1e12) + intr.cy).astype(jnp.int32)
    ok = m.valid & (z > 0) & (u >= 0) & (v >= 0) & (u < w) & (v < h)
    if active is not None:
        ok &= active
    if conf_threshold is not None:
        ok &= m.conf >= conf_threshold
    pix = jnp.where(ok, v * w + u, h * w)  # overflow bucket

    big = jnp.float32(1e30)
    zbuf = jnp.full((h * w + 1,), big)
    zbuf = zbuf.at[pix].min(jnp.where(ok, z, big))
    # winners: surfels whose depth equals the pixel minimum; min index wins
    is_winner = ok & (z <= zbuf[pix])
    idxbuf = jnp.full((h * w + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    idxbuf = idxbuf.at[pix].min(jnp.where(is_winner, jnp.arange(n, dtype=jnp.int32),
                                          jnp.iinfo(jnp.int32).max))
    out = idxbuf[: h * w]
    return jnp.where(out == jnp.iinfo(jnp.int32).max, -1, out).reshape(h, w)


def _gather_surfels(m: SurfelMap, idx: jnp.ndarray):
    """Gather surfel attributes by (clamped) index; callers mask by idx>=0."""
    safe = jnp.clip(idx, 0, m.pos.shape[0] - 1)
    return {
        "pos": m.pos[safe], "conf": m.conf[safe], "color": m.color[safe],
        "submap": m.submap[safe], "init_time": m.init_time[safe],
        "stamp": m.stamp[safe], "normal": m.normal[safe],
        "radius": m.radius[safe], "k1": m.k1[safe], "k2": m.k2[safe],
        "curv_dir1": m.curv_dir1[safe], "curv_dir2": m.curv_dir2[safe],
    }


def fuse(m: SurfelMap, meas: FrameMeasurement, pose: jnp.ndarray,
         index_map: jnp.ndarray, intr: CameraIntrinsics, cfg: SLAMConfig,
         time, submap_idx) -> SurfelMap:
    """Two-stage ElasticFusion-style fusion (data.vert + update.vert,
    GlobalModel.cpp:355-548).

    (a) association: each input pixel on the time-staggered checkerboard
        (data.vert:113) searches a 3x3 window of the index map for a model
        surfel with ray-depth consistency (+-0.05*lambda, data.vert:145) and
        normal agreement (<0.5 rad unless |n_z|<0.75, l.153); best by
        point-to-ray distance.
    (b) merge: confidence-weighted running average guarded by
        newRadius < 1.5x old (update.vert:80); one winning pixel per surfel
        (deterministic min-pixel instead of GL last-write).
    (c) unmatched valid pixels append as new unstable surfels.
    """
    h, w = intr.height, intr.width
    P = h * w
    pose_inv_R = pose[:3, :3].T
    pose_inv_t = -pose_inv_R @ pose[:3, 3]

    yy, xx = camera.pixel_grid(h, w)
    checker = (
        (xx.astype(jnp.int32) % 2 == time % 2)
        & (yy.astype(jnp.int32) % 2 == time % 2)
    ).reshape(P)

    ok_pix = _measurement_valid(meas, cfg).reshape(P) & checker

    v_local = meas.vertex.reshape(P, 3)
    n_local = meas.normal.reshape(P, 3)

    xl = (xx.reshape(P) - intr.cx) / intr.fx
    yl = (yy.reshape(P) - intr.cy) / intr.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
    ray_len = jnp.linalg.norm(ray, axis=-1)

    # --- association over 3x3 window (half-pixel supersampling of the
    # reference collapses to a 3x3 pixel window at FACTOR=1) ---
    best_dist = jnp.full((P,), 1e3)
    best_id = jnp.full((P,), -1, jnp.int32)
    flat_idx = index_map.reshape(P)
    yi = yy.reshape(P).astype(jnp.int32)
    xi = xx.reshape(P).astype(jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            vv = jnp.clip(yi + dy, 0, h - 1)
            uu = jnp.clip(xi + dx, 0, w - 1)
            cand = flat_idx[vv * w + uu]
            has = cand >= 0
            cs = jnp.clip(cand, 0, m.pos.shape[0] - 1)
            cpos_w = m.pos[cs]
            cpos = cpos_w @ pose_inv_R.T + pose_inv_t      # camera frame
            cnrm = m.normal[cs] @ pose_inv_R.T
            depth_ok = jnp.abs(cpos[:, 2] * lam - v_local[:, 2] * lam) < cfg.depth_consistency
            dist = jnp.linalg.norm(jnp.cross(ray, cpos), axis=-1) / ray_len
            cosang = jnp.sum(cnrm * n_local, axis=-1)
            ang_ok = (jnp.abs(cnrm[:, 2]) < 0.75) | (
                jnp.abs(jnp.arccos(jnp.clip(cosang, -1.0, 1.0))) < cfg.fuse_angle_limit
            )
            better = has & depth_ok & ang_ok & (dist < best_dist)
            best_dist = jnp.where(better, dist, best_dist)
            best_id = jnp.where(better, cand, best_id)

    matched = ok_pix & (best_id >= 0)

    # --- one winning pixel per surfel: min pixel id (GL: last write wins) ---
    n_cap = m.pos.shape[0]
    pixel_ids = jnp.arange(P, dtype=jnp.int32)
    tgt = jnp.where(matched, best_id, n_cap)
    winner_tbl = jnp.full((n_cap + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    winner_tbl = winner_tbl.at[tgt].min(jnp.where(matched, pixel_ids, jnp.iinfo(jnp.int32).max))
    is_winner = matched & (winner_tbl[tgt] == pixel_ids)

    # --- merge (update.vert:62-104) ---
    fields = _frame_fields(meas, pose, submap_idx, time)
    win_tgt = jnp.where(is_winner, best_id, n_cap)  # scatter via drop-slot

    a = fields["conf"]                      # new measurement confidence
    c_k = m.conf[jnp.clip(win_tgt, 0, n_cap - 1)]
    denom = jnp.maximum(c_k + a, 1e-12)
    r_ok = fields["radius"] < 1.5 * m.radius[jnp.clip(win_tgt, 0, n_cap - 1)]

    def blend(old_at, new):
        return jnp.where(
            r_ok[:, None] if new.ndim == 2 else r_ok,
            (c_k[..., None] * old_at + a[..., None] * new) / denom[..., None]
            if new.ndim == 2
            else (c_k * old_at + a * new) / denom,
            old_at,
        )

    safe_tgt = jnp.clip(win_tgt, 0, n_cap - 1)

    def scat(arr, vals):
        # win_tgt == n_cap (dump slot) for non-winning pixels, so only the
        # unique winner per surfel writes a live slot
        padded = jnp.concatenate([arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
        padded = padded.at[win_tgt].set(vals.astype(arr.dtype))
        return padded[:n_cap]

    new_pos = blend(m.pos[safe_tgt], fields["pos"])
    new_col = blend(m.color[safe_tgt], fields["color"])
    nr = blend(m.normal[safe_tgt], fields["normal"])
    nr = nr / jnp.maximum(jnp.linalg.norm(nr, axis=-1, keepdims=True), 1e-12)
    new_rad = blend(m.radius[safe_tgt], fields["radius"])
    new_d1 = blend(m.curv_dir1[safe_tgt], fields["curv_dir1"])
    new_k1 = blend(m.k1[safe_tgt], fields["k1"])
    new_d2 = blend(m.curv_dir2[safe_tgt], fields["curv_dir2"])
    new_k2 = blend(m.k2[safe_tgt], fields["k2"])

    m = m._replace(
        pos=scat(m.pos, new_pos),
        conf=scat(m.conf, c_k + a),
        color=scat(m.color, new_col),
        normal=scat(m.normal, nr),
        radius=scat(m.radius, new_rad),
        curv_dir1=scat(m.curv_dir1, new_d1),
        k1=scat(m.k1, new_k1),
        curv_dir2=scat(m.curv_dir2, new_d2),
        k2=scat(m.k2, new_k2),
        stamp=scat(m.stamp, jnp.full((P,), time, jnp.int32)),
    )

    # --- new unstable surfels (data.vert:171-176 -> copy_unstable:155-158) ---
    new_mask = ok_pix & (best_id < 0)
    return _append(m, fields, new_mask)


def clean(m: SurfelMap, pose: jnp.ndarray, index_map: jnp.ndarray,
          intr: CameraIntrinsics, cfg: SLAMConfig, time,
          active: jnp.ndarray | None = None) -> SurfelMap:
    """Outlier/redundancy culling + compaction (copy_unstable.vert:62-166).

    Kill rules per surfel:
      - curvature invalid (l.143-147)
      - > 8 older stable overlapping surfels just behind it (of a 16-sample
        half-pixel window == 3x3 with [1,2,1]^2 weights), or > 4 free-space
        violations from newly-updated stable surfels (l.149-152)
      - unstable for > 200 frames below the confidence threshold (l.161-164)
    Survivors are compacted to a prefix (the transform-feedback stream
    compaction, GlobalModel.cpp:550-686)."""
    n = m.pos.shape[0]
    h, w = intr.height, intr.width
    pose_inv_R = pose[:3, :3].T
    pose_inv_t = -pose_inv_R @ pose[:3, 3]
    local = m.pos @ pose_inv_R.T + pose_inv_t
    lz = local[:, 2]
    safe_z = jnp.where(lz != 0, lz, 1e12)
    x = local[:, 0] * intr.fx / safe_z + intr.cx
    y = local[:, 1] * intr.fy / safe_z + intr.cy
    in_view = (lz > 0) & (lz < cfg.depth_cutoff) & (x > 0) & (y > 0) & (x < w) & (y < h)
    local_n = m.normal @ pose_inv_R.T

    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    flat_idx = index_map.reshape(h * w)

    count = jnp.zeros((n,), jnp.int32)
    zcount = jnp.zeros((n,), jnp.int32)
    weights = {(-1, -1): 1, (-1, 0): 2, (-1, 1): 1,
               (0, -1): 2, (0, 0): 4, (0, 1): 2,
               (1, -1): 1, (1, 0): 2, (1, 1): 1}
    for (dy, dx), wgt in weights.items():
        vv = jnp.clip(yi + dy, 0, h - 1)
        uu = jnp.clip(xi + dx, 0, w - 1)
        cand = flat_idx[vv * w + uu]
        has = in_view & (cand >= 0)
        cs = jnp.clip(cand, 0, n - 1)
        cpos = m.pos[cs] @ pose_inv_R.T + pose_inv_t
        c_conf = m.conf[cs]
        c_init = m.init_time[cs]
        c_stamp = m.stamp[cs]
        stable = c_conf > cfg.confidence_threshold
        behind = cpos[:, 2] > lz
        # redundancy: older, stable, within 0.01 behind, radii overlap
        overlap = jnp.linalg.norm(cpos[:, :2] - local[:, :2], axis=-1) < m.radius * 1.4
        red = has & (c_init < m.init_time) & stable & behind & \
            (cpos[:, 2] - lz < 0.01) & overlap
        count = count + jnp.where(red, wgt, 0)
        # free-space violation: newly updated stable surfel well behind this
        act_ok = True if active is None else active[cs]
        fs = has & (c_stamp == time) & stable & behind & \
            (cpos[:, 2] - lz > 0.01) & (jnp.abs(local_n[:, 2]) > 0.85) & act_ok
        zcount = zcount + jnp.where(fs, wgt, 0)

    t = cfg.curv_valid_threshold
    curv_bad = (m.k1 < -t) | (m.k1 > t) | (m.k2 < -t) | (m.k2 > t)
    crowd_kill = (count > cfg.clean_overlap_limit) | (zcount > cfg.clean_freespace_limit)
    unstable_kill = ((time - m.stamp) > cfg.unstable_time_limit) & \
        (m.conf < cfg.confidence_threshold)

    keep = m.valid & ~curv_bad & ~crowd_kill & ~unstable_kill
    return compact(m, keep)


def compact(m: SurfelMap, keep: jnp.ndarray) -> SurfelMap:
    """Stream-compact survivors to a prefix (cumsum + scatter)."""
    n = m.pos.shape[0]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, rank, n)
    new_count = jnp.sum(keep.astype(jnp.int32))

    def move(arr):
        out = jnp.zeros((n + 1,) + arr.shape[1:], arr.dtype)
        out = out.at[dest].set(arr, mode="drop")
        return out[:n]

    return SurfelMap(
        pos=move(m.pos), conf=move(m.conf), color=move(m.color),
        submap=move(m.submap), init_time=move(m.init_time), stamp=move(m.stamp),
        normal=move(m.normal), radius=move(m.radius),
        curv_dir1=move(m.curv_dir1), k1=move(m.k1),
        curv_dir2=move(m.curv_dir2), k2=move(m.k2),
        valid=(jnp.arange(n) < new_count), count=new_count,
    )


def apply_submap_deltas(m: SurfelMap, deltas: jnp.ndarray) -> SurfelMap:
    """Post-BA dense map correction: per-surfel rigid transform looked up by
    submap index (update_delta_trans.vert:43-88; deltas built per keyframe in
    HRBFFusion::UpdateDenseGlobalModel as pose_new * pose_old^-1).

    deltas: (S, 4, 4)."""
    d = deltas[jnp.clip(m.submap, 0, deltas.shape[0] - 1)]
    pos = jnp.einsum("nij,nj->ni", d[:, :3, :3], m.pos) + d[:, :3, 3]
    nrm = jnp.einsum("nij,nj->ni", d[:, :3, :3], m.normal)
    d1 = jnp.einsum("nij,nj->ni", d[:, :3, :3], m.curv_dir1)
    d2 = jnp.einsum("nij,nj->ni", d[:, :3, :3], m.curv_dir2)
    keep3 = m.valid[:, None]
    return m._replace(
        pos=jnp.where(keep3, pos, m.pos),
        normal=jnp.where(keep3, nrm, m.normal),
        curv_dir1=jnp.where(keep3, d1, m.curv_dir1),
        curv_dir2=jnp.where(keep3, d2, m.curv_dir2),
    )


def active_from_submaps(m: SurfelMap, submap_active: jnp.ndarray) -> jnp.ndarray:
    """Per-surfel activity mask from the active-keyframe set
    (KeyFrameIDMap texture, GlobalModel.cpp:586-598)."""
    return m.valid & submap_active[jnp.clip(m.submap, 0, submap_active.shape[0] - 1)]
