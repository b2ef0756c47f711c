"""Global surfel map: packed fixed-capacity array + fusion/cleaning ops.

TPU-native replacement for the reference's OpenGL ``GlobalModel``
(``Core/src/GlobalModel.cpp`` + ``data.vert``/``update.vert``/
``copy_unstable.vert``/``init_unstableTex.vert``/``update_delta_trans.vert``):
the double-buffered VBO ping-pong + transform feedback machinery becomes a
functional update of one packed array; the GL point render of the index map
becomes a deterministic z-buffered scatter; stream compaction becomes
cumsum + scatter.

Surfel attribute layout: the reference packs 5 x vec4 = 80 B/surfel
(``Vertex.cpp:44``, attribute pointers ``GlobalModel.cpp:491-506``); we pack
24 f32 channels per surfel so every gather/scatter in the hot paths (fuse /
clean / predict) moves one wide row instead of ~13 scalar lanes — on TPU,
row gathers amortise the per-element gather cost across the minor
dimension.

Channel map (C = 24):
  0:3   pos (world)      3     conf
  4:7   color            7     submap (float-encoded int)
  8     init_time        9     stamp
  10:13 normal           13    radius
  14:17 curv_dir1        17    k1
  18:21 curv_dir2        21    k2
  22    valid (0/1)      23    act (0/1 — submap-activity flag)

The activity flag (channel 23) caches ``active_submaps[submap]`` per surfel
(the KeyFrameIDMap mask, GlobalModel.cpp:586-598) so the per-frame pipeline
never re-gathers per-surfel activity (a full-capacity 1-ch gather costs
~4 ms at 512k): appends write the current submap's activity, merges keep the
old surfel's flag (merges keep the old submap), compaction moves rows
wholesale, and the host refreshes the channel only when the covisible-KF set
changes (keyframe insert / loop closure — ``refresh_active_channel``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera
from ..ops.preprocess import CurvatureResult, VertexNormalRadius

CURV_SENTINEL = 1000.0
N_CHANNELS = 24

# channel slices
POS = slice(0, 3)
CONF = 3
COLOR = slice(4, 7)
SUBMAP = 7
INIT_TIME = 8
STAMP = 9
NORMAL = slice(10, 13)
RADIUS = 13
CURV_DIR1 = slice(14, 17)
K1 = 17
CURV_DIR2 = slice(18, 21)
K2 = 21
VALID = 22
ACT = 23


class SurfelMap(NamedTuple):
    data: jnp.ndarray       # (N, 24) packed surfels
    count: jnp.ndarray      # () int32 — number of live surfels (prefix)

    # ---- field views (read-only convenience accessors) ----
    @property
    def pos(self):
        return self.data[:, POS]

    @property
    def conf(self):
        return self.data[:, CONF]

    @property
    def color(self):
        return self.data[:, COLOR]

    @property
    def submap(self):
        return self.data[:, SUBMAP].astype(jnp.int32)

    @property
    def init_time(self):
        return self.data[:, INIT_TIME].astype(jnp.int32)

    @property
    def stamp(self):
        return self.data[:, STAMP].astype(jnp.int32)

    @property
    def normal(self):
        return self.data[:, NORMAL]

    @property
    def radius(self):
        return self.data[:, RADIUS]

    @property
    def curv_dir1(self):
        return self.data[:, CURV_DIR1]

    @property
    def k1(self):
        return self.data[:, K1]

    @property
    def curv_dir2(self):
        return self.data[:, CURV_DIR2]

    @property
    def k2(self):
        return self.data[:, K2]

    @property
    def valid(self):
        return self.data[:, VALID] > 0.5

    @property
    def active(self):
        """valid & submap-active (the cached KeyFrameIDMap mask)."""
        return (self.data[:, VALID] > 0.5) & (self.data[:, ACT] > 0.5)


def empty_map(capacity: int) -> SurfelMap:
    data = jnp.zeros((capacity, N_CHANNELS), jnp.float32)
    data = data.at[:, K1].set(CURV_SENTINEL).at[:, K2].set(CURV_SENTINEL)
    return SurfelMap(data=data, count=jnp.int32(0))


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


def _pack_frame(m: FrameMeasurement, pose: jnp.ndarray, submap_idx, time,
                act=1.0) -> jnp.ndarray:
    """Flatten a measurement into packed (P, 24) world-frame surfel rows.
    ``act``: activity flag of the surfels' submap (scalar, may be traced)."""
    h, w = m.radius.shape
    P = h * w
    R = pose[:3, :3]
    t = pose[:3, 3]
    rows = jnp.zeros((P, N_CHANNELS), jnp.float32)
    rows = rows.at[:, POS].set((m.vertex.reshape(P, 3) @ R.T) + t)
    rows = rows.at[:, CONF].set(m.conf.reshape(P))
    rows = rows.at[:, COLOR].set(m.color.reshape(P, 3))
    rows = rows.at[:, SUBMAP].set(jnp.asarray(submap_idx, jnp.float32))
    rows = rows.at[:, INIT_TIME].set(jnp.asarray(time, jnp.float32))
    rows = rows.at[:, STAMP].set(jnp.asarray(time, jnp.float32))
    rows = rows.at[:, NORMAL].set(m.normal.reshape(P, 3) @ R.T)
    rows = rows.at[:, RADIUS].set(m.radius.reshape(P))
    rows = rows.at[:, CURV_DIR1].set(m.curv_dir1.reshape(P, 3) @ R.T)
    rows = rows.at[:, K1].set(m.k1.reshape(P))
    rows = rows.at[:, CURV_DIR2].set(m.curv_dir2.reshape(P, 3) @ R.T)
    rows = rows.at[:, K2].set(m.k2.reshape(P))
    rows = rows.at[:, VALID].set(1.0)
    rows = rows.at[:, ACT].set(jnp.asarray(act, jnp.float32))
    return rows


def _append(m: SurfelMap, rows: jnp.ndarray, new_mask: jnp.ndarray,
            block_size: int | None = None) -> SurfelMap:
    """Append up to sum(new_mask) packed rows after m.count.

    Row scatters measure ~3.4 us/row on the chip while sorts and row
    gathers are ~50 ns/row, so the append compacts the selected rows to a
    prefix with a stable argsort + gather and writes ONE contiguous block
    with dynamic_update_slice (a DMA, not a scatter).  The block size is
    static; when the map is within ``block_size`` of capacity the write is
    clamped and may recycle the tail (the reference similarly drops data
    when its VBO fills)."""
    capacity = m.data.shape[0]
    P = rows.shape[0]
    S = min(block_size or P, P, capacity)
    perm = jnp.argsort(jnp.logical_not(new_mask), stable=True)
    sorted_rows = rows[perm][:S]
    n_new = jnp.minimum(jnp.sum(new_mask.astype(jnp.int32)), S)
    slot = jnp.arange(S, dtype=jnp.int32)
    empty_row = jnp.zeros((N_CHANNELS,), m.data.dtype
                          ).at[K1].set(CURV_SENTINEL).at[K2].set(CURV_SENTINEL)
    block = jnp.where((slot < n_new)[:, None], sorted_rows, empty_row)
    start = jnp.clip(m.count, 0, capacity - S)
    data = jax.lax.dynamic_update_slice(m.data, block, (start, 0))
    count = jnp.minimum(start + n_new, capacity)
    # VALID is carried in the rows themselves (1 for appended surfels, 0 for
    # the block's empty tail); rows outside the block keep their flags —
    # tombstoned rows must stay dead (clean_compact_period > 1).
    return SurfelMap(data=data, count=count)


def grow(m: SurfelMap, new_capacity: int) -> SurfelMap:
    """Return the same map backed by a larger array (pristine empty rows
    appended).  Host-side capacity bucketing: the reference allocates its
    full 21.1M-surfel VBO up front (GlobalModel.cpp:21-22); on TPU every
    map op costs proportional to the static capacity, so the engine starts
    small and doubles between jitted steps.  Dead-row *values* never
    influence live outputs (all map ops mask on the valid prefix), so a
    grown map is observably identical to one allocated large from the
    start."""
    n = m.data.shape[0]
    if new_capacity <= n:
        return m
    pad = jnp.zeros((new_capacity - n, N_CHANNELS), m.data.dtype)
    pad = pad.at[:, K1].set(CURV_SENTINEL).at[:, K2].set(CURV_SENTINEL)
    return SurfelMap(data=jnp.concatenate([m.data, pad], axis=0), count=m.count)


def initialise(capacity: int, m: FrameMeasurement, pose: jnp.ndarray,
               cfg: SLAMConfig, time: int = 1, submap_idx: int = 0) -> SurfelMap:
    """First-frame map init (GlobalModel::initialise + init_unstableTex.vert:
    every valid pixel becomes a surfel)."""
    sm = empty_map(capacity)
    ok = _measurement_valid(m, cfg).reshape(-1)
    rows = _pack_frame(m, pose, submap_idx, time)
    return _append(sm, rows, ok)


def render_index(m: SurfelMap, pose_inv: jnp.ndarray, intr: CameraIntrinsics,
                 active: jnp.ndarray | None = None,
                 conf_threshold: float | None = None) -> jnp.ndarray:
    """Z-buffered point render of the map into a (H, W) int32 index grid
    (-1 = empty).  Replaces IndexMap::predictIndices (IndexMap.cpp:193-267,
    index_map.vert:34-66)."""
    h, w = intr.height, intr.width
    n = m.data.shape[0]
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

    if n <= (1 << 20):
        # single scatter-min of a packed (quantised-depth | surfel-id) key:
        # 11 bits of z (1.7 mm steps to 3.5 m — far finer than the +-50 mm
        # association tolerances) in the high bits, 20-bit id in the low
        # bits.  One scatter replaces the zbuf-min + winner-select +
        # idbuf-min trio (device scatters cost ~0.1 us/row — the hot op).
        zq = jnp.clip((z * (2047.0 / 3.5)), 0, 2047).astype(jnp.int32)
        key = jnp.where(ok, (zq << 20) | jnp.arange(n, dtype=jnp.int32),
                        jnp.iinfo(jnp.int32).max)
        buf = jnp.full((h * w + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
        buf = buf.at[pix].min(key)
        out = buf[: h * w]
        return jnp.where(out == jnp.iinfo(jnp.int32).max, -1,
                         out & ((1 << 20) - 1)).reshape(h, w)

    # large-capacity fallback: exact float z-buffer (two scatter-mins)
    big = jnp.float32(1e30)
    zbuf = jnp.full((h * w + 1,), big)
    zbuf = zbuf.at[pix].min(jnp.where(ok, z, big))
    is_winner = ok & (z <= zbuf[pix])
    idxbuf = jnp.full((h * w + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    idxbuf = idxbuf.at[pix].min(jnp.where(is_winner, jnp.arange(n, dtype=jnp.int32),
                                          jnp.iinfo(jnp.int32).max))
    out = idxbuf[: h * w]
    return jnp.where(out == jnp.iinfo(jnp.int32).max, -1, out).reshape(h, w)


# Rendered attribute image channels (render_attr_image): the TPU analogue of
# IndexMap's multi-attachment framebuffer (vertConf/normRad/colorTime/...
# textures, IndexMap.cpp:193-267) — ONE row gather builds it; all window
# searches then read it with streaming patch extraction instead of dynamic
# gathers (calibrated at ~10 ns/row on the chip, so 9-49 taps of per-pixel
# gathers were the dominant cost).
A_POS = slice(0, 3)      # camera-frame position
A_NRM = slice(3, 6)      # camera-frame normal
A_CONF = 6
A_RADIUS = 7
A_INIT = 8
A_STAMP = 9
A_ACTIVE = 10
A_VALID = 11
ATTR_CHANNELS = 12
# extended channels (render_attr_image(extended=True)): raw map attributes
# the raycast epilogue needs — fetched per-pixel so prediction assembly
# never re-gathers the full-capacity surfel table
A_EXT_COLOR = slice(12, 15)
A_EXT_K1 = 15
A_EXT_K2 = 16
A_EXT_D1 = slice(17, 20)  # world-frame principal directions (raw)
A_EXT_D2 = slice(20, 23)
ATTR_EXT_CHANNELS = 23


def render_attr_image(m: SurfelMap, index_map: jnp.ndarray,
                      pose_inv: jnp.ndarray,
                      extended: bool = False) -> jnp.ndarray:
    """(H, W, 12|23) camera-frame attributes of the rendered surfel per
    pixel (extra channels are ~free: row gathers cost per row).  The
    A_ACTIVE channel is the surfel's cached activity flag (ACT channel) —
    no separate per-surfel activity gather."""
    h, w = index_map.shape
    flat = index_map.reshape(-1)
    has = flat >= 0
    cs = jnp.clip(flat, 0, m.data.shape[0] - 1)
    if extended:
        rows = m.data[cs]                             # ONE (P, 24) row gather
        pos_w, nrm_w = rows[:, POS], rows[:, NORMAL]
        conf, radius = rows[:, CONF], rows[:, RADIUS]
        init, stamp, act = rows[:, INIT_TIME], rows[:, STAMP], rows[:, ACT]
    else:
        # the base attr image reads 11 of the 24 data channels; gather the
        # pre-sliced table (row-gather cost grows with row bytes — the
        # slice itself is a cheap streaming copy)
        sel = jnp.array([0, 1, 2, 10, 11, 12, CONF, RADIUS,
                         INIT_TIME, STAMP, ACT])
        r11 = m.data[:, sel][cs]                      # ONE (P, 11) row gather
        pos_w, nrm_w = r11[:, 0:3], r11[:, 3:6]
        conf, radius = r11[:, 6], r11[:, 7]
        init, stamp, act = r11[:, 8], r11[:, 9], r11[:, 10]
    pos_cam = pos_w @ pose_inv[:3, :3].T + pose_inv[:3, 3]
    nrm_cam = nrm_w @ pose_inv[:3, :3].T
    chans = [
        pos_cam, nrm_cam,
        conf[:, None], radius[:, None],
        init[:, None], stamp[:, None],
        act[:, None], has[:, None].astype(jnp.float32),
    ]
    if extended:
        chans += [rows[:, COLOR], rows[:, K1, None], rows[:, K2, None],
                  rows[:, CURV_DIR1], rows[:, CURV_DIR2]]
    img = jnp.concatenate(chans, axis=-1)
    img = jnp.where(has[:, None], img, 0.0)
    return img.reshape(h, w, ATTR_EXT_CHANNELS if extended else ATTR_CHANNELS)


def fuse(m: SurfelMap, meas: FrameMeasurement, pose: jnp.ndarray,
         index_map: jnp.ndarray, intr: CameraIntrinsics, cfg: SLAMConfig,
         time, submap_idx, act=1.0) -> SurfelMap:
    """Two-stage ElasticFusion-style fusion (data.vert + update.vert,
    GlobalModel.cpp:355-468 / 470-548).

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
    P = (h // 2) * (w // 2)   # only checkerboard pixels can fuse this frame
    n_cap = m.data.shape[0]
    pose_inv_R = pose[:3, :3].T
    pose_inv_t = -pose_inv_R @ pose[:3, 3]
    par = jnp.asarray(time, jnp.int32) % 2

    # --- the time-staggered checkerboard (data.vert:113) selects the
    # quarter of pixels with x%2 == y%2 == time%2; ALL per-pixel work below
    # runs on that quarter (4x less association/pack/scatter than full-res).
    # The parity is traced; two quarter-view formulations (cfg-gated):
    #   gather: ROW GATHERS at the quarter's flat pixel ids
    #   slice:  stride-2 slices at both parities + select (a slice on a
    #           T(8,128)-tiled tensor pays a layout shuffle per array) ---
    yyq, xxq = camera.pixel_grid(h // 2, w // 2)
    gx = 2.0 * xxq + par.astype(jnp.float32)   # global pixel coords
    gy = 2.0 * yyq + par.astype(jnp.float32)

    from ..ops.patches import extract_patches

    pose_inv = jnp.eye(4).at[:3, :3].set(pose_inv_R).at[:3, 3].set(pose_inv_t)
    attr = render_attr_image(m, index_map, pose_inv)

    if cfg.fuse_gather_quarter:
        qpix = (gy.astype(jnp.int32) * w + gx.astype(jnp.int32)).reshape(P)

        # ONE joint row gather for every per-pixel input (same trick as
        # tracking's joint_step): [valid | vertex | normal | packed
        # measurement row | 3x3 attr patches (the 7 channels the
        # association reads: pos, nrm, valid) | 3x3 candidate ids]
        # = 103 ch.  Row-gather cost grows with row bytes, so the patch
        # stack carries only the needed channels.  Ids ride as f32 VALUES
        # (exact to 2^24; NOT a bitcast — small ints bitcast to f32 are
        # denormal/NaN patterns, and GSPMD's masked-sum lowering of a
        # sharded gather canonicalizes NaN payloads, corrupting them).
        assert m.data.shape[0] <= (1 << 24), "id-as-f32 exactness limit"
        FC = 7   # per-tap channels: A_POS(3) A_NRM(3) A_VALID
        attr7 = attr[..., jnp.array([0, 1, 2, 3, 4, 5, A_VALID])]
        tbl = jnp.concatenate([
            _measurement_valid(meas, cfg)[..., None].astype(jnp.float32),
            meas.vertex, meas.normal,
            _pack_frame(meas, pose, submap_idx, time, act).reshape(h, w, 24),
            extract_patches(attr7, 1).reshape(h, w, 9 * FC),
            extract_patches(index_map, 1, fill=-1).astype(jnp.float32),
        ], axis=-1).reshape(h * w, 31 + 9 * FC + 9)
        rows_q = tbl[qpix]                                   # (P, 103)
        ok_pix = rows_q[:, 0] > 0.5
        v_local = rows_q[:, 1:4]
        n_local = rows_q[:, 4:7]
        new_rows = rows_q[:, 7:31]                           # (P, 24)
        patch = rows_q[:, 31:31 + 9 * FC].reshape(P, 9, FC)
        cand = jnp.round(
            rows_q[:, 31 + 9 * FC:]).astype(jnp.int32)       # (P, 9)
    else:
        def quarter(img):
            return jnp.where(par == 0, img[0::2, 0::2], img[1::2, 1::2])

        def qsel(img):      # (h, w, *ch) -> (P, *ch) quarter view
            return quarter(img).reshape((P,) + img.shape[2:])

        meas_q = jax.tree.map(quarter, meas)
        ok_pix = _measurement_valid(meas_q, cfg).reshape(P)
        v_local = meas_q.vertex.reshape(P, 3)
        n_local = meas_q.normal.reshape(P, 3)
        new_rows = _pack_frame(meas_q, pose, submap_idx, time, act)  # (P,24)
        # association inputs (the GL data.vert texture fetches), quartered
        attr7 = attr[..., jnp.array([0, 1, 2, 3, 4, 5, A_VALID])]
        patch = qsel(extract_patches(attr7, 1)).reshape(P, 9, 7)
        cand = qsel(extract_patches(index_map, 1, fill=-1)).reshape(P, 9)

    xl = (gx.reshape(P) - intr.cx) / intr.fx
    yl = (gy.reshape(P) - intr.cy) / intr.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
    ray_len = jnp.linalg.norm(ray, axis=-1)

    # --- association over the 3x3 window of the attr-image render ---
    # (patch channels: 0:3 pos | 3:6 nrm | 6 valid)
    has = (cand >= 0) & (patch[..., 6] > 0.5)
    cpos = patch[..., 0:3]                                 # (P,9,3) camera
    cnrm = patch[..., 3:6]

    depth_ok = jnp.abs(cpos[..., 2] * lam[:, None]
                       - (v_local[:, 2] * lam)[:, None]) < cfg.depth_consistency
    dist = jnp.linalg.norm(jnp.cross(jnp.broadcast_to(ray[:, None, :], cpos.shape),
                                     cpos), axis=-1) / ray_len[:, None]
    cosang = jnp.sum(cnrm * n_local[:, None, :], axis=-1)
    ang_ok = (jnp.abs(cnrm[..., 2]) < 0.75) | (
        jnp.abs(jnp.arccos(jnp.clip(cosang, -1.0, 1.0))) < cfg.fuse_angle_limit)
    good = has & depth_ok & ang_ok
    dist = jnp.where(good, dist, 1e3)
    best_tap = jnp.argmin(dist, axis=1)
    best_ok = jnp.take_along_axis(good, best_tap[:, None], axis=1)[:, 0]
    best_id = jnp.where(best_ok,
                        jnp.take_along_axis(cand, best_tap[:, None], axis=1)[:, 0],
                        -1)
    matched = ok_pix & (best_id >= 0)

    # --- one winning pixel per surfel: min pixel id (GL: last write wins);
    # the winner table is the only scatter here (narrow scatter-min) ---
    pixel_ids = jnp.arange(P, dtype=jnp.int32)
    tgt = jnp.where(matched, best_id, n_cap)
    winner_tbl = jnp.full((n_cap + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    winner_tbl = winner_tbl.at[tgt].min(
        jnp.where(matched, pixel_ids, jnp.iinfo(jnp.int32).max))

    # --- merge (update.vert:62-104), formulated surfel-side: each surfel
    # with a winning pixel GATHERS that pixel's measurement row and blends
    # in place (row scatters are ~70x slower than row gathers on TPU) ---
    wtbl = winner_tbl[:n_cap]
    has_winner = wtbl != jnp.iinfo(jnp.int32).max
    wpix = jnp.clip(wtbl, 0, P - 1)
    meas_rows = new_rows[wpix]                              # (N, 24) gather
    old = m.data

    c_k = old[:, CONF]
    a = meas_rows[:, CONF]
    denom = jnp.maximum(c_k + a, 1e-12)
    r_ok = meas_rows[:, RADIUS] < 1.5 * old[:, RADIUS]

    blended = (c_k[:, None] * old + a[:, None] * meas_rows) / denom[:, None]
    nrm = blended[:, NORMAL]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    blended = blended.at[:, NORMAL].set(nrm)
    merged = jnp.where(r_ok[:, None], blended, old)
    # unconditional on merge: conf accumulates, stamp/bookkeeping updates
    merged = merged.at[:, CONF].set(c_k + a)
    merged = merged.at[:, SUBMAP].set(old[:, SUBMAP])
    merged = merged.at[:, INIT_TIME].set(old[:, INIT_TIME])
    merged = merged.at[:, STAMP].set(meas_rows[:, STAMP])
    merged = merged.at[:, VALID].set(1.0)
    # merges keep the old submap, hence the old activity flag
    merged = merged.at[:, ACT].set(old[:, ACT])
    data = jnp.where(has_winner[:, None], merged, old)
    m = SurfelMap(data=data, count=m.count)

    # --- new unstable surfels: block append + in-place index-map update,
    # so the caller can skip the second full z-buffer render (the reference
    # re-renders before clean, GlobalModel.cpp; new surfels appear at their
    # own pixel, merged surfels keep their ids) ---
    new_mask = ok_pix & (best_id < 0)
    S = min(cfg.new_surfels_capacity, P, n_cap)
    start = jnp.clip(m.count, 0, n_cap - S)
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    new_id = start + rank
    appended = new_mask & (rank < S)
    m = _append(m, new_rows, new_mask, block_size=S)

    # z-test the new surfels against the existing render at their pixel:
    # the 3x3 patches' CENTER tap (index 4) is exactly this pixel's render,
    # so no extra gathers are needed
    idx_q = cand[:, 4]
    exist = idx_q >= 0
    exist_z = patch[:, 4, 2]                       # A_POS z channel
    new_z = v_local[:, 2]
    wins = appended & (~exist | (new_z < exist_z))
    upd = jnp.where(wins, new_id, idx_q).reshape(h // 2, w // 2)
    # write the quarter back at its parity (both variants + select, as the
    # parity is traced)
    idx4 = index_map.reshape(h // 2, 2, w // 2, 2)
    idx_updated = jnp.where(par == 0,
                            idx4.at[:, 0, :, 0].set(upd),
                            idx4.at[:, 1, :, 1].set(upd)).reshape(h, w)
    return m, idx_updated


def clean_mask(m: SurfelMap, pose: jnp.ndarray, index_map: jnp.ndarray,
               intr: CameraIntrinsics, cfg: SLAMConfig, time,
               attr: jnp.ndarray | None = None) -> jnp.ndarray:
    """Survival mask of the cleaning pass (copy_unstable.vert:62-166).

    Kill rules per surfel:
      - curvature invalid (l.143-147)
      - > 8 older stable overlapping surfels just behind it (16 half-pixel
        samples == 3x3 window with [1,2,1]^2 weights), or > 4 free-space
        violations from newly-updated stable surfels (l.149-152)
      - unstable for > 200 frames below the confidence threshold (l.161-164)
    Survivors are compacted to a prefix (the transform-feedback stream
    compaction, GlobalModel.cpp:550-686)."""
    n = m.data.shape[0]
    h, w = intr.height, intr.width
    pose_inv_R = pose[:3, :3].T
    pose_inv_t = -pose_inv_R @ pose[:3, 3]
    local = m.pos @ pose_inv_R.T + pose_inv_t
    lz = local[:, 2]
    safe_z = jnp.where(lz != 0, lz, 1e12)
    x = local[:, 0] * intr.fx / safe_z + intr.cx
    y = local[:, 1] * intr.fy / safe_z + intr.cy
    in_view = (lz > 0) & (lz < cfg.depth_cutoff) & (x > 0) & (y > 0) & (x < w) & (y < h)
    local_nz = (m.normal @ pose_inv_R.T)[:, 2]

    xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)

    # one attr-image render + pre-extracted 3x3 patches; each surfel then
    # needs only a single row gather of its pixel's 9-tap patch.  ``attr``
    # may be passed in precomputed (slam.step renders ONE extended attr
    # image after fuse and shares it between clean and prediction)
    from ..ops.patches import extract_patches

    if attr is None:
        pose_inv = jnp.eye(4).at[:3, :3].set(pose_inv_R).at[:3, 3].set(pose_inv_t)
        attr = render_attr_image(m, index_map, pose_inv)

    def crowd_counts():
        # the kill rules use 8 of the 12 attr channels (not normal/radius);
        # gather the narrowed table — a full-capacity gather's cost grows
        # with row byte-size once rows exceed ~100 B, so 72-ch beats 108-ch
        KEEP_CH = [0, 1, 2, A_CONF, A_INIT, A_STAMP, A_ACTIVE, A_VALID]
        C8 = len(KEEP_CH)
        patch_img = extract_patches(
            attr[..., jnp.array(KEEP_CH)], 1).reshape(h * w, 9 * C8)
        rows9 = patch_img[yi * w + xi].reshape(n, 9, C8)

        taps = [(-1, -1, 1), (-1, 0, 2), (-1, 1, 1),
                (0, -1, 2), (0, 0, 4), (0, 1, 2),
                (1, -1, 1), (1, 0, 2), (1, 1, 1)]
        wgt = jnp.array([t[2] for t in taps], jnp.int32)
        has = in_view[:, None] & (rows9[..., 7] > 0.5)
        cpos_z = rows9[..., 2]
        cpos_xy = rows9[..., 0:2]
        c_conf = rows9[..., 3]
        c_init = rows9[..., 4]
        c_stamp = rows9[..., 5]

        stable = c_conf > cfg.confidence_threshold
        behind = cpos_z > lz[:, None]
        overlap = jnp.linalg.norm(cpos_xy - local[:, None, :2], axis=-1) < \
            (m.radius * 1.4)[:, None]
        red = has & (c_init < m.data[:, INIT_TIME][:, None]) & stable & \
            behind & (cpos_z - lz[:, None] < 0.01) & overlap
        count = jnp.sum(jnp.where(red, wgt[None, :], 0), axis=1)

        act_ok = rows9[..., 6] > 0.5
        fs = has & (c_stamp == jnp.float32(time)) & stable & behind & \
            (cpos_z - lz[:, None] > 0.01) & \
            (jnp.abs(local_nz) > 0.85)[:, None] & act_ok
        zcount = jnp.sum(jnp.where(fs, wgt[None, :], 0), axis=1)
        return count, zcount

    crowd_period = getattr(cfg, "clean_crowd_period", 1)
    if crowd_period <= 1:
        count, zcount = crowd_counts()
    else:
        # crowd/free-space rules every N-th frame only (their 9-tap patch
        # gather is clean's entire cost); off-frames kill nothing by them
        count, zcount = jax.lax.cond(
            jnp.asarray(time, jnp.int32) % crowd_period == 0,
            crowd_counts,
            lambda: (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32)))

    t = cfg.curv_valid_threshold
    k1 = m.data[:, K1]
    k2 = m.data[:, K2]
    curv_bad = (k1 < -t) | (k1 > t) | (k2 < -t) | (k2 > t)
    crowd_kill = (count > cfg.clean_overlap_limit) | (zcount > cfg.clean_freespace_limit)
    unstable_kill = ((time - m.data[:, STAMP]) > cfg.unstable_time_limit) & \
        (m.data[:, CONF] < cfg.confidence_threshold)

    keep = m.valid & ~curv_bad & ~crowd_kill & ~unstable_kill
    return keep


def clean(m: SurfelMap, pose: jnp.ndarray, index_map: jnp.ndarray,
          intr: CameraIntrinsics, cfg: SLAMConfig, time) -> SurfelMap:
    """Cleaning pass + stream compaction (see clean_mask / compact)."""
    return compact(m, clean_mask(m, pose, index_map, intr, cfg, time))


def clean_with_remap(m: SurfelMap, pose: jnp.ndarray, index_map: jnp.ndarray,
                     intr: CameraIntrinsics, cfg: SLAMConfig, time,
                     attr: jnp.ndarray | None = None):
    """clean() + (old index -> new index, -1 if killed) remap so the caller
    can translate an existing index map instead of re-rendering (prediction
    filters out fresh unstable surfels by confidence anyway, so a remapped
    post-fuse render is prediction-equivalent to a fresh post-clean one).

    With ``cfg.clean_compact_period > 1`` the kill rules still run every
    frame (reference parity) but killed surfels are tombstoned in place and
    the stream compaction (a full-capacity sort + row gather) runs only
    every N-th frame.  Observable behavior is equal up to z-buffer
    tie-breaks (ties at the same pixel within one quantisation step break
    by array index — the reference's GL equivalent is last-write
    nondeterminism)."""
    keep = clean_mask(m, pose, index_map, intr, cfg, time, attr=attr)
    n = m.data.shape[0]
    period = getattr(cfg, "clean_compact_period", 1)

    def do_compact(_):
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        remap = jnp.where(keep, rank, -1)
        mc = compact(m, keep)
        return mc.data, mc.count, remap

    def do_tombstone(_):
        data = m.data.at[:, VALID].set(
            jnp.where(keep, m.data[:, VALID], 0.0))
        remap = jnp.where(keep, jnp.arange(n, dtype=jnp.int32), -1)
        return data, m.count, remap

    if period <= 1:
        data, count, remap = do_compact(None)
    else:
        data, count, remap = jax.lax.cond(
            jnp.asarray(time, jnp.int32) % period == 0,
            do_compact, do_tombstone, None)
    return SurfelMap(data=data, count=count), remap


def remap_index_map(index_map: jnp.ndarray, remap: jnp.ndarray) -> jnp.ndarray:
    """Translate a pre-compaction index map through a clean_with_remap
    remap (-1 entries stay -1)."""
    safe = jnp.clip(index_map, 0, remap.shape[0] - 1)
    return jnp.where(index_map >= 0, remap[safe], -1)


def pixel_keep_mask(attr_ext: jnp.ndarray, cfg: SLAMConfig,
                    time) -> jnp.ndarray:
    """(H,W) clean keep flag evaluated directly in PIXEL space from the
    extended attr image.

    On tombstone frames (no compaction, no crowd/free-space evaluation) the
    only kill rules are curvature-validity and unstable-timeout
    (copy_unstable.vert:143-147, 161-164), and both read nothing but the
    pixel's own surfel attributes — which the extended attr render already
    fetched.  slam.step uses this to skip the full remap row gather
    (remap_index_map cost ~2.2 ms/frame at 640x480; this is elementwise).
    Exactly equal to remap_index_map on such frames: the remap is the
    identity on survivors and -1 on kills."""
    t = cfg.curv_valid_threshold
    k1 = attr_ext[..., A_EXT_K1]
    k2 = attr_ext[..., A_EXT_K2]
    curv_bad = (k1 < -t) | (k1 > t) | (k2 < -t) | (k2 > t)
    unstable = (
        ((jnp.asarray(time, jnp.float32) - attr_ext[..., A_STAMP])
         > cfg.unstable_time_limit)
        & (attr_ext[..., A_CONF] < cfg.confidence_threshold))
    return (attr_ext[..., A_VALID] > 0.5) & ~curv_bad & ~unstable


def compact(m: SurfelMap, keep: jnp.ndarray) -> SurfelMap:
    """Stream-compact survivors to a prefix.

    Sort-based: a stable argsort of the keep mask gives the permutation
    (survivors first, original order preserved), applied with one row
    GATHER — ~300x cheaper than the equivalent row scatter on TPU."""
    n = m.data.shape[0]
    new_count = jnp.sum(keep.astype(jnp.int32))
    perm = jnp.argsort(jnp.logical_not(keep), stable=True)
    data = m.data[perm]
    data = data.at[:, VALID].set(
        (jnp.arange(n) < new_count).astype(jnp.float32))
    return SurfelMap(data=data, count=new_count)


@functools.partial(jax.jit, static_argnames=("cfg",))
def exchange_active(act: SurfelMap, arch: SurfelMap,
                    submap_active: jnp.ndarray, time, cfg: SLAMConfig):
    """Active-window <-> archive surfel exchange (the map-scale axis,
    VERDICT r2 next-3).

    The reference masks inactive-submap surfels out of prediction/fusion/
    clean (index_map.vert:41-51, copy_unstable.vert:99-101) but still pays
    a full-buffer pass per frame; on TPU every per-frame map op costs by
    STATIC capacity, so here the inactive surfels physically leave the
    per-frame working set: the ACTIVE map (fixed small capacity — what
    slam.step sees) holds only active-submap surfels, everything else
    lives in an ARCHIVE array this function maintains.  Called from
    FullSLAM whenever the covisible set changes (keyframe cadence), it
    moves newly-inactive rows to the archive and reactivated rows back.

    Per-frame dense cost is thereby bounded by the active-window size
    regardless of total map size; the exchange itself is two stable
    argsort+gather compactions amortized over the keyframe period.

    Deviation (documented): the curvature/timeout kill rules
    (copy_unstable.vert:143-164) apply to leaving rows at exchange time
    instead of per-frame, so kills of inactive surfels land at most one
    keyframe period later than the reference's.

    Returns (active', archive', stats) with stats = int32 [n_active,
    n_archive, n_dropped] — packed so the host syncs ONE array per
    exchange (each device->host fetch through the remote tunnel costs a
    full round trip); n_dropped counts rows lost to capacity overflow
    (0 in healthy runs)."""
    Ca = act.data.shape[0]
    Cr = arch.data.shape[0]
    nch = act.data.shape[1]
    ns = submap_active.shape[0]

    t = cfg.curv_valid_threshold
    tf = jnp.asarray(time, jnp.float32)

    def junk(rows):
        k1 = rows[:, K1]
        k2 = rows[:, K2]
        curv_bad = (k1 < -t) | (k1 > t) | (k2 < -t) | (k2 > t)
        unstable = (((tf - rows[:, STAMP]) > cfg.unstable_time_limit)
                    & (rows[:, CONF] < cfg.confidence_threshold))
        return curv_bad | unstable

    sub_a = jnp.clip(act.data[:, SUBMAP].astype(jnp.int32), 0, ns - 1)
    va = act.data[:, VALID] > 0
    on_a = va & submap_active[sub_a]
    leave = va & ~on_a & ~junk(act.data)

    sub_r = jnp.clip(arch.data[:, SUBMAP].astype(jnp.int32), 0, ns - 1)
    vr = arch.data[:, VALID] > 0
    enter = vr & submap_active[sub_r] & ~junk(arch.data)
    keep_r = vr & ~enter

    # ---- new active = [stay-compacted | enter-compacted] ----
    stay = act.data[jnp.argsort(jnp.logical_not(on_a), stable=True)]
    n_stay = jnp.sum(on_a.astype(jnp.int32))
    enter_blk = arch.data[jnp.argsort(jnp.logical_not(enter),
                                      stable=True)[:Ca]]
    n_enter_all = jnp.sum(enter.astype(jnp.int32))
    n_enter = jnp.minimum(jnp.minimum(n_enter_all, Ca), Ca - n_stay)

    buf = jnp.zeros((2 * Ca, nch), act.data.dtype)
    buf = jax.lax.dynamic_update_slice(buf, stay, (0, 0))
    buf = jax.lax.dynamic_update_slice(buf, enter_blk, (n_stay, 0))
    act_data = buf[:Ca]
    n_act = n_stay + n_enter
    act_valid = (jnp.arange(Ca, dtype=jnp.int32) < n_act)
    act_data = act_data.at[:, VALID].set(act_valid.astype(jnp.float32))
    # refresh the cached activity channel for the whole active map
    new_sub = jnp.clip(act_data[:, SUBMAP].astype(jnp.int32), 0, ns - 1)
    act_data = act_data.at[:, ACT].set(
        (submap_active[new_sub] & act_valid).astype(jnp.float32))

    # ---- new archive = [keep-compacted | leave-compacted] ----
    keep_blk = arch.data[jnp.argsort(jnp.logical_not(keep_r), stable=True)]
    n_keep = jnp.sum(keep_r.astype(jnp.int32))
    leave_blk = act.data[jnp.argsort(jnp.logical_not(leave),
                                     stable=True)[:Ca]]
    n_leave = jnp.sum(leave.astype(jnp.int32))
    buf2 = jnp.zeros((Cr + Ca, nch), arch.data.dtype)
    buf2 = jax.lax.dynamic_update_slice(buf2, keep_blk, (0, 0))
    buf2 = jax.lax.dynamic_update_slice(buf2, leave_blk, (n_keep, 0))
    arch_data = buf2[:Cr]
    n_arch = jnp.minimum(n_keep + n_leave, Cr)
    arch_data = arch_data.at[:, VALID].set(
        (jnp.arange(Cr, dtype=jnp.int32) < n_arch).astype(jnp.float32))

    dropped = (n_enter_all - n_enter) + (n_keep + n_leave - n_arch)
    stats = jnp.stack([n_act, n_arch, dropped]).astype(jnp.int32)
    return (SurfelMap(data=act_data, count=n_act),
            SurfelMap(data=arch_data, count=n_arch), stats)


def _apply_deltas_rows(rows: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    """(B,24) map rows x (S,12) row-major [R|t] table -> corrected rows."""
    sub = jnp.clip(rows[:, SUBMAP].astype(jnp.int32), 0, flat.shape[0] - 1)
    d = flat[sub]                                           # (B, 12)
    keep = (rows[:, VALID] > 0.5)[:, None]

    def rot(v, with_t):
        out = []
        for i in range(3):
            r = d[:, 4 * i] * v[:, 0] + d[:, 4 * i + 1] * v[:, 1] \
                + d[:, 4 * i + 2] * v[:, 2]
            if with_t:
                r = r + d[:, 4 * i + 3]
            out.append(r)
        return jnp.stack(out, axis=-1)

    rows = rows.at[:, POS].set(
        jnp.where(keep, rot(rows[:, POS], True), rows[:, POS]))
    rows = rows.at[:, NORMAL].set(
        jnp.where(keep, rot(rows[:, NORMAL], False), rows[:, NORMAL]))
    rows = rows.at[:, CURV_DIR1].set(
        jnp.where(keep, rot(rows[:, CURV_DIR1], False), rows[:, CURV_DIR1]))
    rows = rows.at[:, CURV_DIR2].set(
        jnp.where(keep, rot(rows[:, CURV_DIR2], False), rows[:, CURV_DIR2]))
    return rows


def apply_submap_deltas(m: SurfelMap, deltas: jnp.ndarray,
                        chunk: int = 1 << 19) -> SurfelMap:
    """Post-BA dense map correction: per-surfel rigid transform looked up by
    submap index (update_delta_trans.vert:43-88; deltas built per keyframe in
    HRBFFusion::UpdateDenseGlobalModel as pose_new * pose_old^-1).

    deltas: (S, 4, 4).

    Memory shape matters here: the old formulation gathered per-surfel
    (4,4) matrices — on TPU the (4,4) minor dims tile to (8,128), a 32x
    padding expansion, so an 8M-row archive materialized a 16 GB temp and
    killed the compile (the r3 'HBM-estimate failure' that lost the
    PANORAMA no-loop ablation).  Now: ONE (B,12) row gather of the flat
    [R|t] table per ``chunk`` rows, rotation applied as column arithmetic,
    chunks iterated with lax.map so the live temp is ~chunk*128*4 B
    regardless of map size."""
    flat = deltas[:, :3, :].reshape(-1, 12)
    N = m.data.shape[0]
    if N <= chunk:
        return SurfelMap(data=_apply_deltas_rows(m.data, flat),
                         count=m.count)
    c = chunk
    while N % c:            # largest power-of-2-ish divisor <= chunk
        c //= 2
    blocks = m.data.reshape(N // c, c, m.data.shape[1])
    out = jax.lax.map(lambda b: _apply_deltas_rows(b, flat), blocks)
    return SurfelMap(data=out.reshape(N, m.data.shape[1]), count=m.count)


def active_from_submaps(m: SurfelMap, submap_active: jnp.ndarray) -> jnp.ndarray:
    """Per-surfel activity mask from the active-keyframe set
    (KeyFrameIDMap texture, GlobalModel.cpp:586-598)."""
    return m.valid & submap_active[jnp.clip(m.submap, 0, submap_active.shape[0] - 1)]


@jax.jit
def refresh_active_channel(m: SurfelMap, submap_active: jnp.ndarray) -> SurfelMap:
    """Rewrite the cached per-surfel activity flag (ACT channel) from the
    active-keyframe set.  Called only when the covisible-KF set changes
    (keyframe insert / loop closure, HRBFFusion.cpp:1160-1170) — the
    per-frame pipeline reads the cached channel instead of re-gathering."""
    act = submap_active[jnp.clip(m.submap, 0, submap_active.shape[0] - 1)]
    return SurfelMap(
        data=m.data.at[:, ACT].set(act.astype(jnp.float32)), count=m.count)
