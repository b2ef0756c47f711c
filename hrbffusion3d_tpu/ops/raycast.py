"""HRBF surface prediction: per-pixel ray cast of the on-the-fly implicit.

TPU-native replacement for ``predict_hrbf.frag`` (311 LoC) driven by
``IndexMap::predictHRBF`` (IndexMap.cpp:413-518), plus the FillIn composite
passes (``Shaders/FillIn.cpp``, ``fill_vertex.frag``/``fill_rgb.frag``).

Per pixel: gather <= K stable surfels from a (2*winMultiply+1)^2 window of
the index map in ring order (frag:75-113), locate the point on the viewing
ray closest to any neighbor (frag:134-142), bracket the zero crossing of the
HRBF implicit with fixed 4 mm ladder steps in the direction given by
sign(f) (frag:153-231), then bisect 10 iterations (frag:236-270).  The
divergent forward/backward marching branches become one branchless ladder
evaluation + masked first-crossing select — every VPU lane stays busy
(SURVEY §7.3 hard part 3).

Output maps (camera frame): vertex+conf, normal+radius, color, curvature,
per-pixel ICP weight w = 1/z^2 (conf/256 + exp(-lambda^2 / 2 cmax^2))
(frag:300-302).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera
from ..map.surfel_map import SurfelMap
from . import hrbf


_GEOMETRIC_LADDER = (1, 2, 3, 5, 8, 13, 18, 25)


def ladder_offsets(cfg: SLAMConfig) -> tuple[list[int], int]:
    """Ladder tap offsets (in units of ``raycast_coarse_step``) and the
    bisection iteration count.  Uniform: every step out to
    ``raycast_coarse_steps`` with the reference's 10 bisections
    (predict_hrbf.frag:163-236).  Geometric: same range and the same 1-step
    granularity within +-3 steps of the nearest-neighbor init, sparse
    beyond; +3 bisections recover the precision of the widest (7-step)
    bracket."""
    steps = cfg.raycast_coarse_steps
    if not cfg.raycast_geometric_ladder:
        return list(range(1, steps + 1)), cfg.raycast_bisection_iters
    g = [s for s in _GEOMETRIC_LADDER if s < steps] + [steps]
    return g, cfg.raycast_bisection_iters + 3


def bisection_plan(cfg: SLAMConfig) -> tuple[int, int]:
    """(points_per_pass, n_passes) of the root refinement.  Sequential
    bisection = (1, iters); with ``raycast_bisection_batch = B > 1`` the
    k-section variant evaluates B interior points per pass and needs
    ceil(iters / log2(B+1)) passes for at least the same bracket shrink."""
    import math

    _, iters = ladder_offsets(cfg)
    B = cfg.raycast_bisection_batch
    if B <= 1:
        return 1, iters
    return B, math.ceil(iters / math.log2(B + 1))


def _ring_offsets(radius: int):
    """Window offsets sorted by ring (Chebyshev distance), matching the
    frag's ring-by-ring neighbor collection order."""
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]
    offs.sort(key=lambda o: (max(abs(o[0]), abs(o[1])), o[0], o[1]))
    return offs


class Prediction(NamedTuple):
    vertex: jnp.ndarray      # (H,W,3) predicted surface point, camera frame
    conf: jnp.ndarray        # (H,W)
    normal: jnp.ndarray      # (H,W,3) unit, camera frame
    radius: jnp.ndarray      # (H,W)
    color: jnp.ndarray       # (H,W,3)
    k1: jnp.ndarray          # (H,W)
    k2: jnp.ndarray          # (H,W)
    curv_dir1: jnp.ndarray   # (H,W,3)
    curv_dir2: jnp.ndarray   # (H,W,3)
    time: jnp.ndarray        # (H,W) int32 init time of nearest surfel
    icp_weight: jnp.ndarray  # (H,W)
    found: jnp.ndarray       # (H,W) bool


def predict_hrbf(m: SurfelMap, pose_inv: jnp.ndarray, index_map: jnp.ndarray,
                 intr: CameraIntrinsics, cfg: SLAMConfig,
                 chunk: int = 8192, pallas_interpret: bool = False,
                 attr_ext: jnp.ndarray | None = None) -> Prediction:
    """Ray-cast the HRBF implicit through the rendered index map.

    With ``cfg.use_pallas_raycast`` the ladder/bisection/gradient core runs
    as one fused Pallas kernel with the neighbor window resident in VMEM
    (ops/pallas_kernels.raycast_core); otherwise the XLA formulation below.

    ``attr_ext``: optional precomputed extended attr image for this
    index_map (slam.step renders ONE extended image after fuse and shares
    it between clean and prediction — pixels whose surfel clean killed must
    already be zeroed).
    """
    h, w = intr.height, intr.width
    P = h * w
    K = cfg.predict_max_neighbors  # frag:108 neighbor cap, ring-ordered
    R = cfg.predict_window_multiplier

    # ---- neighbor collection: one attr-image render + streaming patch
    # extraction in ring order (no per-tap dynamic gathers, no sort) ----
    from ..map import surfel_map as smod
    from .patches import extract_patches

    yy, xx = camera.pixel_grid(h, w)
    offs = _ring_offsets(R)
    n_off = len(offs)
    # permutation mapping extract_patches' row-major order to ring order
    D = 2 * R + 1
    perm = jnp.array([(dy + R) * D + (dx + R) for dy, dx in offs], jnp.int32)

    if attr_ext is None:
        attr_ext = smod.render_attr_image(m, index_map, pose_inv, extended=True)
    attr = attr_ext[..., :smod.ATTR_CHANNELS]

    if cfg.use_pallas_raycast or pallas_interpret:
        from . import pallas_kernels

        attr9 = attr[..., [0, 1, 2, 3, 4, 5, smod.A_CONF, smod.A_RADIUS,
                           smod.A_VALID]]
        p_surf, grad, nearest, found = pallas_kernels.raycast_core(
            attr9, intr, cfg, interpret=pallas_interpret)
        p_surf = p_surf.reshape(P, 3)
        grad = grad.reshape(P, 3)
        nrm = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        nearest = nearest.reshape(P)
        found = found.reshape(P)
        return _assemble_prediction(
            attr_ext, pose_inv, p_surf, nrm, nearest, found, intr, cfg)
    cand = extract_patches(index_map, R, fill=-1).reshape(P, D * D)[:, perm]
    ap = extract_patches(attr, R).reshape(P, D * D, smod.ATTR_CHANNELS)[:, perm]
    nb_pos = ap[..., smod.A_POS]                   # camera frame (P, n_off, 3)
    nb_nrm = ap[..., smod.A_NRM]
    nb_conf = ap[..., smod.A_CONF]

    # stability filter (frag:94-99): z>0.1, |n|>0.1, conf>=thresh, n_z>0
    ok = (
        (cand >= 0) & (ap[..., smod.A_VALID] > 0.5)
        & (nb_pos[..., 2] > 0.1)
        & (jnp.sum(nb_nrm * nb_nrm, axis=-1) > 0.01)
        & (nb_conf >= cfg.predict_conf_threshold)
        & (nb_nrm[..., 2] > 0.0)
    )

    # cap at predict_max_neighbors in ring order by masking (frag:108) —
    # masking keeps the window-wide arrays but avoids any compaction sort
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=-1) - 1
    sel_ok = ok & (rank < K)
    sel_pos = nb_pos
    sel_nrm = nb_nrm
    sel_rad = ap[..., smod.A_RADIUS]
    n_neighbors = jnp.sum(sel_ok, axis=-1)

    # ---- viewing rays ----
    xl = (xx.reshape(P) - intr.cx) / intr.fx
    yl = (yy.reshape(P) - intr.cy) / intr.fy
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    # closest neighbor projection onto the ray (frag:134-142)
    proj = jnp.abs(jnp.einsum("pkc,pc->pk", sel_pos, ray))
    proj = jnp.where(sel_ok, proj, 1e6)
    t0 = jnp.min(proj, axis=-1)

    step = cfg.raycast_coarse_step
    g_steps, bis_iters = ladder_offsets(cfg)
    G = len(g_steps)
    g_off = jnp.asarray(g_steps, jnp.float32) * step            # (G,)
    g_prev = jnp.asarray([0] + g_steps[:-1], jnp.float32) * step
    lad = jnp.concatenate([-g_off[::-1], jnp.zeros((1,)), g_off])  # (2G+1,)

    def block(args):
        (b_ray, b_t0, b_pos, b_nrm, b_rad, b_ok, b_nn) = args
        C = b_ray.shape[0]
        ts = b_t0[:, None] + lad[None, :]                  # (C, L)
        pts = ts[..., None] * b_ray[:, None, :]            # (C, L, 3)
        f, nsupp = hrbf.hrbf_value(
            pts, b_pos[:, None], b_nrm[:, None], b_rad[:, None], b_ok[:, None]
        )                                                   # (C, L)
        f0 = f[:, G]
        supp_ok = nsupp[:, G] > cfg.predict_min_neighbors
        enough = (b_nn > cfg.predict_min_neighbors) & supp_ok

        # backward branch (f0 > 0): taps at t0 - g_off, nearest first;
        # first f < 0 at k brackets [t0 - g_off[k], t0 - g_prev[k]]
        back = f[:, G - 1::-1]                              # (C, G) toward camera
        bneg = back < 0
        bfound = jnp.any(bneg, axis=-1)
        bidx = jnp.argmax(bneg, axis=-1)                    # first True
        t_lo_b = b_t0 - g_off[bidx]
        t_hi_b = b_t0 - g_prev[bidx]

        # forward branch (f0 < 0): first f > 0 at k brackets
        # [t0 + g_prev[k], t0 + g_off[k]]
        fwd = f[:, G + 1:]
        fpos = fwd > 0
        ffound = jnp.any(fpos, axis=-1)
        fidx = jnp.argmax(fpos, axis=-1)
        t_hi_f = b_t0 + g_off[fidx]
        t_lo_f = b_t0 + g_prev[fidx]

        go_back = f0 > 0
        found = enough & jnp.where(go_back, bfound, ffound)
        t_lo = jnp.where(go_back, t_lo_b, t_lo_f)
        t_hi = jnp.where(go_back, t_hi_b, t_hi_f)

        if cfg.raycast_false_position > 0:
            # bracket-end field values for false position (prev tap = f0
            # at ladder index 0)
            def tk(a, i):
                return jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]

            back_prev = jnp.concatenate([f0[:, None], back[:, :-1]], axis=1)
            fwd_prev = jnp.concatenate([f0[:, None], fwd[:, :-1]], axis=1)
            f_lo = jnp.where(go_back, tk(back, bidx), tk(fwd_prev, fidx))
            f_hi = jnp.where(go_back, tk(back_prev, bidx), tk(fwd, fidx))

        # ---- root refinement (frag:236-270): sequential bisection, the
        # batched k-section variant (cfg.raycast_bisection_batch), or
        # false-position iterations (cfg.raycast_false_position) ----
        ksec_b, ksec_p = bisection_plan(cfg)
        if cfg.raycast_false_position > 0:
            def falsi(_, carry):
                lo, hi, flo, fhi = carry
                den = fhi - flo
                den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
                mid = jnp.clip(lo - flo * (hi - lo) / den,
                               jnp.minimum(lo, hi), jnp.maximum(lo, hi))
                pm = mid[:, None] * b_ray
                fm, _ = hrbf.hrbf_value(pm, b_pos, b_nrm, b_rad, b_ok)
                neg = fm < 0
                return (jnp.where(neg, mid, lo), jnp.where(neg, hi, mid),
                        jnp.where(neg, fm, flo), jnp.where(neg, fhi, fm))

            t_lo, t_hi, f_lo, f_hi = jax.lax.fori_loop(
                0, cfg.raycast_false_position, falsi,
                (t_lo, t_hi, f_lo, f_hi))
            den = f_hi - f_lo
            den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
            t_surf = jnp.clip(t_lo - f_lo * (t_hi - t_lo) / den,
                              jnp.minimum(t_lo, t_hi),
                              jnp.maximum(t_lo, t_hi))
        elif ksec_b > 1:
            fr = jnp.arange(1, ksec_b + 1, dtype=jnp.float32)
            for _ in range(ksec_p):
                wdt = (t_hi - t_lo) / (ksec_b + 1.0)
                mids = t_lo[:, None] + wdt[:, None] * fr[None, :]   # (C, B)
                pm = mids[..., None] * b_ray[:, None, :]
                fm, _ = hrbf.hrbf_value(
                    pm, b_pos[:, None], b_nrm[:, None], b_rad[:, None],
                    b_ok[:, None])                                   # (C, B)
                # invariant f(t_lo) < 0 <= f(t_hi): the crossing lies after
                # the last negative interior point
                neg = jnp.sum((fm < 0).astype(jnp.float32), axis=-1)
                t_lo = t_lo + neg * wdt
                t_hi = t_lo + wdt
        else:
            def bis(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                pm = mid[:, None] * b_ray
                fm, _ = hrbf.hrbf_value(pm, b_pos, b_nrm, b_rad, b_ok)
                lo = jnp.where(fm < 0, mid, lo)
                hi = jnp.where(fm < 0, hi, mid)
                return lo, hi

            t_lo, t_hi = jax.lax.fori_loop(0, bis_iters, bis, (t_lo, t_hi))
        if cfg.raycast_false_position <= 0:
            t_surf = 0.5 * (t_lo + t_hi)
        p_surf = t_surf[:, None] * b_ray
        grad = hrbf.hrbf_gradient(p_surf, b_pos, b_nrm, b_rad, b_ok)
        nrm = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)

        # nearest neighbor for the remaining attributes (frag:282-299)
        d2 = jnp.sum((p_surf[:, None, :] - b_pos) ** 2, axis=-1)
        d2 = jnp.where(b_ok, d2, 1e12)
        nearest = jnp.argmin(d2, axis=-1)
        return p_surf, nrm, nearest, found

    chunk = min(chunk, P)

    def padded(x, c):
        pad = (-P) % c
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (P + pad) // c, c, *x.shape[1:]
        )

    outs = jax.lax.map(
        block,
        (padded(ray, chunk), padded(t0, chunk), padded(sel_pos, chunk),
         padded(sel_nrm, chunk), padded(sel_rad, chunk), padded(sel_ok, chunk),
         padded(n_neighbors, chunk)),
    )
    p_surf, nrm, nearest, found = [o.reshape(-1, *o.shape[2:])[:P] for o in outs]

    near_ok = jnp.take_along_axis(sel_ok, nearest[:, None], axis=1)[:, 0]
    found = found & near_ok
    return _assemble_prediction(
        attr_ext, pose_inv, p_surf, nrm, nearest, found, intr, cfg)


def _assemble_prediction(attr_ext: jnp.ndarray, pose_inv: jnp.ndarray,
                         p_surf: jnp.ndarray,
                         nrm: jnp.ndarray, nearest: jnp.ndarray,
                         found: jnp.ndarray, intr: CameraIntrinsics,
                         cfg: SLAMConfig) -> Prediction:
    """Shared raycast epilogue: nearest-surfel attribute fetch + per-pixel
    ICP weight (frag:282-302).  nearest: (P,) ring-tap index of the closest
    neighbor.  Attributes come from the EXTENDED attr image at the tap's
    pixel (one (P, 23) row gather from an image-sized table — the previous
    full-capacity m.data gather at take_along_axis(cand, nearest) cost
    ~19 ms/frame; this identity holds because cand IS the index map's
    patch, so cand[nearest] == index_map[pixel + ring_offset(nearest)])."""
    from ..map import surfel_map as smod

    h, w = intr.height, intr.width
    P = h * w
    R = cfg.predict_window_multiplier
    offs = jnp.asarray(_ring_offsets(R), jnp.float32)       # (n_off, 2) dy,dx
    onehot = (nearest[:, None] ==
              jnp.arange(offs.shape[0], dtype=jnp.int32)[None, :])
    d_yx = onehot.astype(jnp.float32) @ offs                # (P, 2) on MXU
    pid = jnp.arange(P, dtype=jnp.int32)
    py = jnp.clip(pid // w + d_yx[:, 0].astype(jnp.int32), 0, h - 1)
    px = jnp.clip(pid % w + d_yx[:, 1].astype(jnp.int32), 0, w - 1)
    # gather only the 14 channels the epilogue reads (row-gather cost grows
    # with row bytes); the slice is a cheap streaming copy
    NEED = [smod.A_CONF, smod.A_RADIUS, smod.A_INIT,
            12, 13, 14, smod.A_EXT_K1, smod.A_EXT_K2,
            17, 18, 19, 20, 21, 22]
    near = attr_ext.reshape(P, smod.ATTR_EXT_CHANNELS)[
        :, jnp.array(NEED)][py * w + px]
    Rr = pose_inv[:3, :3]

    conf = jnp.where(found, near[:, 0], 0.0)
    radius = jnp.where(found, near[:, 1], 0.0)
    color = jnp.where(found[:, None], near[:, 3:6], 0.0)
    k1 = jnp.where(found, near[:, 6], 1000.0)
    k2 = jnp.where(found, near[:, 7], 1000.0)
    d1 = jnp.where(found[:, None], near[:, 8:11] @ Rr.T, 0.0)
    d2_ = jnp.where(found[:, None], near[:, 11:14] @ Rr.T, 0.0)
    itime = jnp.where(found, near[:, 2].astype(jnp.int32), 0)

    lam = cfg.icp_curv_weight_lambda
    cmax = jnp.maximum(jnp.abs(k1), jnp.abs(k2))
    zz = jnp.maximum(p_surf[:, 2], 1e-6)
    icp_w = jnp.where(
        found,
        (1.0 / (zz * zz)) * (conf / 256.0 + jnp.exp(-0.5 * lam * lam / jnp.maximum(cmax * cmax, 1e-12))),
        0.0,
    )

    p_out = jnp.where(found[:, None], p_surf, 0.0)
    n_out = jnp.where(found[:, None], nrm, 0.0)
    return Prediction(
        vertex=p_out.reshape(h, w, 3), conf=conf.reshape(h, w),
        normal=n_out.reshape(h, w, 3), radius=radius.reshape(h, w),
        color=color.reshape(h, w, 3),
        k1=k1.reshape(h, w), k2=k2.reshape(h, w),
        curv_dir1=d1.reshape(h, w, 3), curv_dir2=d2_.reshape(h, w, 3),
        time=itime.reshape(h, w), icp_weight=icp_w.reshape(h, w),
        found=found.reshape(h, w),
    )


class FilledPrediction(NamedTuple):
    vertex: jnp.ndarray      # (H,W,3)
    conf: jnp.ndarray
    normal: jnp.ndarray
    radius: jnp.ndarray
    color: jnp.ndarray       # (H,W,3) rgb [0,1]
    k1: jnp.ndarray
    k2: jnp.ndarray
    icp_weight: jnp.ndarray
    from_model: jnp.ndarray  # (H,W) bool — density indicator (denseEnough)


def fill_in(pred: Prediction, live_vertex: jnp.ndarray, live_normal: jnp.ndarray,
            live_radius: jnp.ndarray, live_color: jnp.ndarray,
            live_conf: jnp.ndarray, live_k1: jnp.ndarray, live_k2: jnp.ndarray,
            cfg: SLAMConfig) -> FilledPrediction:
    """FillIn composite (fill_vertex.frag / fill_rgb.frag / FillIn.cpp):
    where the model prediction has holes, substitute the live frame's data
    and recompute the per-pixel ICP weight from the live curvature."""
    have = pred.found & (pred.vertex[..., 2] > 0)
    t = cfg.curv_valid_threshold
    live_curv_ok = (live_k1 > -t) & (live_k1 < t) & (live_k2 > -t) & (live_k2 < t)
    lam = cfg.icp_curv_weight_lambda
    cmax = jnp.maximum(jnp.abs(live_k1), jnp.abs(live_k2))
    lz = jnp.maximum(live_vertex[..., 2], 1e-6)
    live_w = jnp.where(
        live_curv_ok & (live_vertex[..., 2] > 0),
        (1.0 / (lz * lz)) * (live_conf / 256.0 + jnp.exp(-0.5 * lam * lam / jnp.maximum(cmax * cmax, 1e-12))),
        0.0,
    )
    pick = have[..., None]
    return FilledPrediction(
        vertex=jnp.where(pick, pred.vertex, jnp.where(live_curv_ok[..., None], live_vertex, 0.0)),
        conf=jnp.where(have, pred.conf, jnp.where(live_curv_ok, live_conf, 0.0)),
        normal=jnp.where(pick, pred.normal, jnp.where(live_curv_ok[..., None], live_normal, 0.0)),
        radius=jnp.where(have, pred.radius, live_radius),
        color=jnp.where(pick, pred.color, live_color),
        k1=jnp.where(have, pred.k1, live_k1),
        k2=jnp.where(have, pred.k2, live_k2),
        icp_weight=jnp.where(have, pred.icp_weight, live_w),
        from_model=have,
    )


def predict_splat(m: SurfelMap, pose_inv: jnp.ndarray, index_map: jnp.ndarray,
                  intr: CameraIntrinsics, cfg: SLAMConfig) -> Prediction:
    """Classic surfel-splat prediction — the reference's ``combinedPredict``
    alternative path (IndexMap.cpp:359-412, combo_splat.frag:19-63), kept
    for comparison/debug: each pixel simply takes the nearest rendered
    surfel from the index map (no implicit-surface ray cast)."""
    from ..map import surfel_map as smod

    h, w = intr.height, intr.width
    P = h * w
    flat = index_map.reshape(P)
    found = flat >= 0
    cs = jnp.clip(flat, 0, m.data.shape[0] - 1)
    rows = m.data[cs]
    Rr = pose_inv[:3, :3]
    tt = pose_inv[:3, 3]
    pos = rows[:, smod.POS] @ Rr.T + tt
    nrm = rows[:, smod.NORMAL] @ Rr.T
    conf = rows[:, smod.CONF]
    k1 = rows[:, smod.K1]
    k2 = rows[:, smod.K2]
    lam = cfg.icp_curv_weight_lambda
    cmax = jnp.maximum(jnp.abs(k1), jnp.abs(k2))
    zz = jnp.maximum(pos[:, 2], 1e-6)
    icp_w = jnp.where(
        found,
        (1.0 / (zz * zz)) * (conf / 256.0
                             + jnp.exp(-0.5 * lam * lam / jnp.maximum(cmax * cmax, 1e-12))),
        0.0,
    )
    z3 = found[:, None]
    return Prediction(
        vertex=jnp.where(z3, pos, 0.0).reshape(h, w, 3),
        conf=jnp.where(found, conf, 0.0).reshape(h, w),
        normal=jnp.where(z3, nrm, 0.0).reshape(h, w, 3),
        radius=jnp.where(found, rows[:, smod.RADIUS], 0.0).reshape(h, w),
        color=jnp.where(z3, rows[:, smod.COLOR], 0.0).reshape(h, w, 3),
        k1=jnp.where(found, k1, 1000.0).reshape(h, w),
        k2=jnp.where(found, k2, 1000.0).reshape(h, w),
        curv_dir1=jnp.where(z3, rows[:, smod.CURV_DIR1] @ Rr.T, 0.0).reshape(h, w, 3),
        curv_dir2=jnp.where(z3, rows[:, smod.CURV_DIR2] @ Rr.T, 0.0).reshape(h, w, 3),
        time=jnp.where(found, rows[:, smod.INIT_TIME].astype(jnp.int32), 0).reshape(h, w),
        icp_weight=icp_w.reshape(h, w),
        found=found.reshape(h, w),
    )


def render_depth(m: SurfelMap, pose_inv: jnp.ndarray, index_map: jnp.ndarray,
                 intr: CameraIntrinsics) -> jnp.ndarray:
    """Depth-only render for display/debug (IndexMap::renderDepth,
    IndexMap.cpp:269-301)."""
    h, w = intr.height, intr.width
    flat = index_map.reshape(h * w)
    cs = jnp.clip(flat, 0, m.data.shape[0] - 1)
    from ..map import surfel_map as smod

    pos = m.data[cs][:, smod.POS] @ pose_inv[:3, :3].T + pose_inv[:3, 3]
    return jnp.where(flat >= 0, pos[:, 2], 0.0).reshape(h, w)
