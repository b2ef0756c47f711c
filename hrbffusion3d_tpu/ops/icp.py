"""Fused tracking residual + normal-equation kernels.

TPU-native equivalents of the reference's CUDA tracking suite
(``Core/src/Cuda/reduce.cu``):
  ICPReduction::search/getProducts (l.253-573) -> :func:`icp_step`
  RGBResidual (l.942-1154)                     -> :func:`rgb_residual`
  RGBReduction (l.697-896)                     -> :func:`rgb_step`
  SO3Reduction (l.1156-1359)                   -> :func:`so3_step`

Design notes (TPU):
  - Normal equations: every pixel contributes ``row = [J | r]``; the system
    is one weighted Gram matmul on the MXU (vs the CUDA warp-tree reduction
    + per-iteration 27-float device->host download, RGBDOdometry.cpp:796+).
  - Gathers are the expensive primitive on TPU, so the model maps are packed
    into 8-channel rows (``pack_model``) and fetched with ONE row gather per
    iteration; the photometric pass gathers packed [depth|intensity] pairs
    at 4 bilinear corners; the RGB Jacobian's 3-D point is derived
    analytically from the gathered depth instead of gathering a cloud map.
  - Everything with static offsets (isolation masks, gradient images) is
    hoisted out of the Gauss-Newton iteration into per-level constants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from .patches import extract_patches

_HI = jax.lax.Precision.HIGHEST


def _gather(map2d: jnp.ndarray, vi: jnp.ndarray, ui: jnp.ndarray) -> jnp.ndarray:
    """Clamped nearest-pixel gather. map2d: (H,W[,C]); vi/ui: (N,) int32."""
    h, w = map2d.shape[:2]
    uic = jnp.clip(ui, 0, w - 1)
    vic = jnp.clip(vi, 0, h - 1)
    flat = map2d.reshape((h * w,) + map2d.shape[2:])
    return flat[vic * w + uic]


def _gram(rows: jnp.ndarray, weight: jnp.ndarray):
    """rows: (N,7), weight: (N,) -> (A (6,6), b (6,), r2_sum).

    Weighted Gram matrix on the MXU; exactly the quantities the CUDA
    JtJJtrSE3 reduction produces (reduce.cu:511-545)."""
    wr = rows * weight[:, None]
    S = jnp.einsum("np,nq->pq", wr, rows,
                   preferred_element_type=jnp.float32, precision=_HI)
    return S[:6, :6], S[:6, 6], S[6, 6]


class StepResult(NamedTuple):
    A: jnp.ndarray
    b: jnp.ndarray
    residual2: jnp.ndarray
    count: jnp.ndarray


class SparseICPExtras(NamedTuple):
    """Per-pixel data the sparse-ICP ADMM lambda update needs after the
    pose solve (updateLambdaMapKernel, cudafuncs.cu:1030-1075)."""

    found: jnp.ndarray   # (N,) bool correspondence mask
    d_cp: jnp.ndarray    # (N,3) unmodified target point, previous camera frame
    z: jnp.ndarray       # (N,3) shrinkage variable of this iteration


def lp_shrink(h: jnp.ndarray, mu: float, p: float, iters: int) -> jnp.ndarray:
    """The L_p proximal ("thrink") operator (reduce.cu:301-315): zero inside
    the threshold, otherwise a fixed-point iteration on the shrink factor.
    h: (..., 3)."""
    alpha_a = ((2.0 / mu) * (1.0 - p)) ** (1.0 / (2.0 - p))
    h_tilde = alpha_a + (p / mu) * alpha_a ** (p - 1.0)
    h_norm = jnp.linalg.norm(h, axis=-1)
    safe = jnp.maximum(h_norm, 1e-12)
    beta = (alpha_a / safe + 1.0) / 2.0
    for _ in range(iters):
        beta = 1.0 - (p / mu) * safe ** (p - 2.0) * beta ** (p - 1.0)
    return jnp.where((h_norm <= h_tilde)[..., None], 0.0, beta[..., None] * h)


def sparse_icp_lambda_update(
    lam: jnp.ndarray, extras: SparseICPExtras,
    R_curr_new: jnp.ndarray, t_curr_new: jnp.ndarray,
    R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray, mu: float,
) -> jnp.ndarray:
    """ADMM dual update after the pose solve (updateLambdaMapKernel):
    lambda += mu * (s_cp(new pose) - d_cp - z) at found correspondences."""
    n = lam.shape[0]
    vcurr = vmap_curr.reshape(n, 3)
    s_cp = ((vcurr @ R_curr_new.T + t_curr_new) - t_prev) @ R_prev_inv.T
    delta = s_cp - extras.d_cp - extras.z
    return jnp.where(extras.found[:, None], lam + mu * delta, lam)


# ---------------------------------------------------------------------- #
# packed per-level model data
# ---------------------------------------------------------------------- #

def pack_model(vmap_g: jnp.ndarray, nmap_g: jnp.ndarray,
               icp_weight: jnp.ndarray) -> jnp.ndarray:
    """(H,W,3)+(H,W,3)+(H,W) -> (H*W, 8) packed model rows for icp_step."""
    h, w = icp_weight.shape
    P = h * w
    rows = jnp.zeros((P, 8), jnp.float32)
    rows = rows.at[:, 0:3].set(vmap_g.reshape(P, 3))
    rows = rows.at[:, 3:6].set(nmap_g.reshape(P, 3))
    rows = rows.at[:, 6].set(icp_weight.reshape(P))
    return rows


def pack_last(last_depth: jnp.ndarray, last_intensity: jnp.ndarray) -> jnp.ndarray:
    """(H,W)x2 -> (H*W, 8) rows packing the 2x2 bilinear footprint
    [d00,i00,d01,i01,d10,i10,d11,i11] via shifted copies, so the photometric
    pass fetches all four corners with ONE row gather at the floor coords."""
    h, w = last_depth.shape
    P = h * w

    def sh(x, dy, dx):
        out = jnp.roll(x, (-dy, -dx), axis=(0, 1))
        if dy:
            out = out.at[-dy:, :].set(0.0)
        if dx:
            out = out.at[:, -dx:].set(0.0)
        return out.reshape(P)

    return jnp.stack([
        last_depth.reshape(P), last_intensity.reshape(P),
        sh(last_depth, 0, 1), sh(last_intensity, 0, 1),
        sh(last_depth, 1, 0), sh(last_intensity, 1, 0),
        sh(last_depth, 1, 1), sh(last_intensity, 1, 1),
    ], axis=-1)


def pack_joint_nearest(vmap_g: jnp.ndarray, nmap_g: jnp.ndarray,
                       icp_weight: jnp.ndarray, last_depth: jnp.ndarray,
                       last_intensity: jnp.ndarray) -> jnp.ndarray:
    """(H*W, 9) rows [v(3) n(3) w d i] — the single-corner joint table.

    With nearest-pixel photometric lookups (cfg.tracking_rgb_nearest — the
    REFERENCE's semantics: reduce.cu fetches lastImage at the rounded warp)
    the ICP target, the depth and the intensity all come from the same
    rounded pixel, so ONE 9-channel gather serves both terms.  Gather cost
    grows with row bytes beyond ~100 B/row (measured on-chip), so this beats
    both the 36-ch 2x2-footprint table and the two separate 8-ch tables."""
    h, w = icp_weight.shape
    P = h * w
    return jnp.concatenate([
        vmap_g.reshape(P, 3), nmap_g.reshape(P, 3),
        icp_weight.reshape(P, 1), last_depth.reshape(P, 1),
        last_intensity.reshape(P, 1),
    ], axis=-1)


def pack_joint(vmap_g: jnp.ndarray, nmap_g: jnp.ndarray,
               icp_weight: jnp.ndarray, last_depth: jnp.ndarray,
               last_intensity: jnp.ndarray) -> jnp.ndarray:
    """(H*W, 36) rows packing [v(3) n(3) w d i] for the 2x2 footprint
    (corners 00,01,10,11 via shifted copies).  The ICP projective target
    (rounded pixel) and the photometric bilinear footprint (floored pixel)
    live in the same 2x2 window, so ONE row gather per GN iteration serves
    both terms (gather cost on TPU is per-row; width is ~free)."""
    h, w = icp_weight.shape
    P = h * w

    base = jnp.concatenate([
        vmap_g.reshape(P, 3), nmap_g.reshape(P, 3),
        icp_weight.reshape(P, 1), last_depth.reshape(P, 1),
        last_intensity.reshape(P, 1),
    ], axis=-1).reshape(h, w, 9)

    def sh(dy, dx):
        out = jnp.roll(base, (-dy, -dx), axis=(0, 1))
        if dy:
            out = out.at[-dy:, :].set(0.0)
        if dx:
            out = out.at[:, -dx:].set(0.0)
        return out.reshape(P, 9)

    return jnp.concatenate(
        [base.reshape(P, 9), sh(0, 1), sh(1, 0), sh(1, 1)], axis=-1)


class PatchAssoc(NamedTuple):
    """Bounded-displacement streaming association (cfg.tracking_patch_assoc).

    The finest-level GN iterations re-fetch their correspondence row at the
    rounded warp pixel every iteration; that random row gather is the single
    most expensive tracking op (issue-rate bound, ~4.5 ns/row x 307k rows x
    10 iterations).  After SO(3) pre-alignment and the coarse levels the
    finest-level warp moves sub-pixel-to-few-pixel between iterations, so
    the association can be ANCHORED once: gather the (2R+1)^2-tap patch of
    packed model rows around the level-entry warp pixel (one wide gather),
    then select the tap arithmetically inside each iteration (pure VPU
    selects, zero gathers).  Pixels whose warp leaves the window lose their
    correspondence for that iteration (masked — the same pixels the
    divergence guard worries about).

    Tap payload is 6 channels [d, n_cp(3), w, i] in the PREVIOUS CAMERA
    frame: the model vertex is derived from the tap pixel + depth (the
    prediction lies on the pixel ray), and the point-to-plane system is
    assembled in the previous camera frame anyway (reduce.cu:474-507), so
    neither the world-frame vertex nor the world-frame normal needs storing.
    """

    rows: jnp.ndarray   # (M, T*6) anchored patch rows, T = (2R+1)^2
    au: jnp.ndarray     # (M,) anchor pixel u (int32, unclamped)
    av: jnp.ndarray     # (M,) anchor pixel v
    ok: jnp.ndarray     # (M,) bool anchor-in-image


def pack_patch_base(last_depth: jnp.ndarray, nmap_c: jnp.ndarray,
                    icp_weight: jnp.ndarray, last_intensity: jnp.ndarray
                    ) -> jnp.ndarray:
    """(H,W)x3 + (H,W,3) -> (H,W,6) base image [d, n_cp(3), w, i]; the
    normal is in the previous CAMERA frame (pred_nmap, pre-initICPModel)."""
    return jnp.concatenate([
        last_depth[..., None], nmap_c, icp_weight[..., None],
        last_intensity[..., None],
    ], axis=-1)


def build_patch_table(base6: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(H,W,6) -> (H*W, T*6) patch table via streaming shifted copies
    (extract_patches — no gathers; out-of-image taps are zero => d=0
    invalid).  Tap order d = (dy+R)*(2R+1) + (dx+R)."""
    h, w = base6.shape[:2]
    t = (2 * radius + 1) ** 2
    return extract_patches(base6, radius).reshape(h * w, t * 6)


def patch_anchor(R_curr: jnp.ndarray, t_curr: jnp.ndarray,
                 R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
                 vcurr: jnp.ndarray, table: jnp.ndarray,
                 intr: CameraIntrinsics) -> PatchAssoc:
    """Anchor the patch association at the current (level-entry) warp:
    ONE wide row gather of the (2R+1)^2-tap patch per tracked pixel."""
    h, w = intr.height, intr.width
    dot = functools.partial(jnp.matmul, precision=_HI)
    vcurr_g = dot(vcurr, R_curr.T) + t_curr
    vcurr_cp = dot(vcurr_g - t_prev, R_prev_inv.T)
    z = vcurr_cp[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u0f = vcurr_cp[:, 0] * intr.fx / safe_z + intr.cx
    v0f = vcurr_cp[:, 1] * intr.fy / safe_z + intr.cy
    ui = jnp.round(u0f).astype(jnp.int32)
    vi = jnp.round(v0f).astype(jnp.int32)
    ok = (ui >= 0) & (vi >= 0) & (ui < w) & (vi < h) & (z > 0)
    flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
    return PatchAssoc(rows=table[flat], au=ui, av=vi, ok=ok)


def joint_step_patch(
    R_curr: jnp.ndarray, t_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
    patch: PatchAssoc, radius: int,
    vcurr: jnp.ndarray, ncurr: jnp.ndarray, valid_curr: jnp.ndarray,
    i_next: jnp.ndarray, static_valid: jnp.ndarray,
    intr: CameraIntrinsics, cfg: SLAMConfig,
):
    """One gather-free joint GN pass against the anchored patch (see
    PatchAssoc).  Where the rounded warp stays inside the anchor window the
    association — and therefore the residual rows — matches joint_step's
    re-gathered nearest-pixel association exactly (up to the f32 wobble of
    assembling in the previous-camera frame directly); out-of-window pixels
    drop their correspondence for the iteration."""
    h, w = intr.height, intr.width
    D = 2 * radius + 1
    T = D * D

    dot = functools.partial(jnp.matmul, precision=_HI)
    vcurr_g = dot(vcurr, R_curr.T) + t_curr
    vcurr_cp = dot(vcurr_g - t_prev, R_prev_inv.T)
    # normals straight into the previous camera frame (|cross| is rotation
    # invariant so the angle gate is unchanged)
    R_rel = dot(R_prev_inv, R_curr)
    ncurr_cp = dot(ncurr, R_rel.T)

    z = vcurr_cp[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u0f = vcurr_cp[:, 0] * intr.fx / safe_z + intr.cx
    v0f = vcurr_cp[:, 1] * intr.fy / safe_z + intr.cy
    ui = jnp.round(u0f).astype(jnp.int32)
    vi = jnp.round(v0f).astype(jnp.int32)

    du = ui - patch.au
    dv = vi - patch.av
    inwin = ((jnp.abs(du) <= radius) & (jnp.abs(dv) <= radius)
             & patch.ok)
    tap = jnp.clip((dv + radius) * D + (du + radius), 0, T - 1)

    # branchless tap select: T-1 wide selects on 6-ch rows (pure VPU)
    r = patch.rows[:, 0:6]
    for t_i in range(1, T):
        r = jnp.where((tap == t_i)[:, None],
                      patch.rows[:, 6 * t_i:6 * t_i + 6], r)
    d0 = r[:, 0]
    n_cp = r[:, 1:4]
    wp = r[:, 4]
    i_last = r[:, 5]

    # model vertex derived from tap pixel + depth (prediction is on-ray)
    uf = ui.astype(jnp.float32)
    vf = vi.astype(jnp.float32)
    d_cp = jnp.stack([
        (uf - intr.cx) * d0 * (1.0 / intr.fx),
        (vf - intr.cy) * d0 * (1.0 / intr.fy),
        d0,
    ], axis=-1)

    in_img = (ui >= 0) & (vi >= 0) & (ui < w) & (vi < h) & (z > 0)
    ok = (in_img & inwin & valid_curr & (d0 > 0)
          & (jnp.sum(n_cp * n_cp, axis=-1) > 1e-6))
    s_cp = vcurr_cp
    dist = jnp.linalg.norm(d_cp - s_cp, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(ncurr_cp, n_cp), axis=-1)
    found = ok & (sine <= cfg.angle_threshold) & (dist <= cfg.dist_threshold)

    resid = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate(
        [n_cp, jnp.cross(s_cp, n_cp), resid[:, None]], axis=-1)
    rows = jnp.where(found[:, None], rows, 0.0)
    if cfg.icp_use_weighted:
        weight = jnp.where(found & jnp.isfinite(wp), wp, 0.0)
    else:
        weight = found.astype(rows.dtype)
    A, b, r2 = _gram(rows, weight)
    icp_res = StepResult(A=A, b=b, residual2=r2,
                         count=jnp.sum(found.astype(jnp.float32)))

    in_last = ((u0f >= 0) & (v0f >= 0) & (u0f <= w - 1) & (v0f <= h - 1)
               & (z > 0))
    depth_ok = ((d0 > 0) & (jnp.abs(z - d0) <= cfg.max_depth_delta_rgb)
                & (i_last != 0) & inwin)
    rgb_valid = static_valid & in_last & depth_ok
    diff = jnp.where(rgb_valid, i_next - i_last, 0.0)
    corres = RGBCorres(
        u0f=u0f, v0f=v0f, d0=d0, diff=diff, valid=rgb_valid,
        sigma_sum=jnp.sum(diff * diff),
        count=jnp.sum(rgb_valid.astype(jnp.float32)),
    )
    return icp_res, corres


class SubPixels(NamedTuple):
    """Pose-invariant current-frame inputs of the subsampled GN iterations
    (cfg.tracking_subsample): the per-pixel arrays joint_step/rgb_step read,
    pre-gathered at a stride-decimated pixel grid."""

    vcurr: jnp.ndarray        # (M,3) unprojected current depth
    ncurr: jnp.ndarray        # (M,3)
    valid: jnp.ndarray        # (M,) bool ICP validity gate
    i_next: jnp.ndarray       # (M,) current intensity
    static_valid: jnp.ndarray  # (M,) bool photometric static gate
    gx: jnp.ndarray           # (M,) Sobel dI/dx
    gy: jnp.ndarray           # (M,) Sobel dI/dy


def _sub_pixels_at(ids: jnp.ndarray, vmap_curr, nmap_curr, next_depth,
                   next_image, static_valid, d_idx, d_idy,
                   intr: CameraIntrinsics) -> SubPixels:
    """Gather the SubPixels bundle at arbitrary flat pixel ids with ONE
    (M, 11) row gather."""
    from ..core import camera

    h, w = intr.height, intr.width
    P = h * w
    vcurr = camera.unproject(next_depth, intr).reshape(P, 3)
    ncurr = nmap_curr.reshape(P, 3)
    valid = ((vmap_curr.reshape(P, 3)[:, 2] > 0)
             & (jnp.sum(ncurr * ncurr, axis=-1) > 0.25))
    tbl = jnp.concatenate([
        vcurr, ncurr, valid[:, None].astype(jnp.float32),
        next_image.reshape(P, 1),
        static_valid.reshape(P, 1).astype(jnp.float32),
        d_idx.reshape(P, 1), d_idy.reshape(P, 1),
    ], axis=-1)
    r = tbl[ids]
    return SubPixels(vcurr=r[:, 0:3], ncurr=r[:, 3:6], valid=r[:, 6] > 0.5,
                     i_next=r[:, 7], static_valid=r[:, 8] > 0.5,
                     gx=r[:, 9], gy=r[:, 10])


def pack_sub_pixels(stride: int, vmap_curr, nmap_curr, next_depth,
                    next_image, static_valid, d_idx, d_idy,
                    intr: CameraIntrinsics) -> SubPixels:
    """Build the SubPixels bundle with ONE (M, 11) row gather at a static
    stride-decimated pixel grid (strided slices of image-sized tensors pay
    a layout shuffle on TPU; a flat gather at computed ids does not)."""
    h, w = intr.height, intr.width
    yy = jnp.arange(0, h, stride, dtype=jnp.int32)
    xx = jnp.arange(0, w, stride, dtype=jnp.int32)
    ids = (yy[:, None] * w + xx[None, :]).reshape(-1)
    return _sub_pixels_at(ids, vmap_curr, nmap_curr, next_depth, next_image,
                          static_valid, d_idx, d_idy, intr)


def saliency_ids(k: int, vmap_curr, nmap_curr, next_image, static_valid,
                 d_idx, d_idy, intr: CameraIntrinsics,
                 k1=None, k2=None) -> jnp.ndarray:
    """Pick the k most informative tracked pixels (VERDICT r2 weak-1c):
    the 6-DoF solve is constrained by intensity-gradient pixels (the
    photometric term) and curvature-rich pixels (the geometric term); flat
    textureless wall pixels mostly restate the same plane constraint.
    score = normalised |grad I|^2 + normalised clipped (|k1|+|k2|) + a
    pixel-hash dither that fills the remaining slots UNIFORMLY over the
    valid set (so the ICP term keeps a spatially unbiased sample of the
    geometry — pure top-k-by-texture would starve textureless regions).
    Returns (k,) flat pixel ids sorted ascending (gather locality)."""
    h, w = intr.height, intr.width
    P = h * w
    ncurr = nmap_curr.reshape(P, 3)
    valid = ((vmap_curr.reshape(P, 3)[:, 2] > 0)
             & (jnp.sum(ncurr * ncurr, axis=-1) > 0.25))
    sv = static_valid.reshape(P)
    g2 = jnp.where(sv, (d_idx.reshape(P) ** 2 + d_idy.reshape(P) ** 2), 0.0)
    g2n = g2 / jnp.maximum(jnp.sum(g2) / jnp.maximum(
        jnp.sum(sv.astype(jnp.float32)), 1.0), 1e-12)
    score = jnp.minimum(g2n, 8.0)
    if k1 is not None:
        c = jnp.where(valid, jnp.minimum(
            jnp.abs(k1.reshape(P)) + jnp.abs(k2.reshape(P)), 50.0), 0.0)
        cn = c / jnp.maximum(jnp.sum(c) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0), 1e-12)
        score = score + jnp.minimum(cn, 8.0)
    # uniform dither in [0, 1): Weyl sequence on the pixel id
    ids_all = jnp.arange(P, dtype=jnp.uint32)
    dither = ((ids_all * jnp.uint32(2654435761)) >> 8).astype(jnp.float32) \
        * (1.0 / float(1 << 24))
    score = jnp.where(valid | sv, score + dither, -1.0)
    # ROW-STRATIFIED top-k: k//h per scanline via a per-row lax.top_k
    # (width-w sorts), instead of one global 307k argsort (~1.7 ms).  Every
    # scanline gets an equal budget — stronger spatial stratification than
    # global top-k — and the returned ids are ascending within each row
    # (gather locality).  Effective k is (k//h)*h.
    k_row = max(1, k // h)
    _, ci = jax.lax.top_k(score.reshape(h, w), k_row)       # (h, k_row)
    ci = jnp.sort(ci, axis=1)
    ids = jnp.arange(h, dtype=jnp.int32)[:, None] * w + ci.astype(jnp.int32)
    return ids.reshape(-1)


def joint_cur_pack(vmap_curr, nmap_curr, next_depth, intr):
    """Pose-invariant per-pixel inputs of joint_step (current-frame vertex
    cloud, normals, validity), computed once per pyramid level instead of
    inside every GN iteration."""
    from ..core import camera

    h, w = vmap_curr.shape[:2]
    n_pix = h * w
    vcurr = camera.unproject(next_depth, intr).reshape(n_pix, 3)
    vmap_z = vmap_curr.reshape(n_pix, 3)[:, 2]
    ncurr = nmap_curr.reshape(n_pix, 3)
    valid_curr = (vmap_z > 0) & (jnp.sum(ncurr * ncurr, axis=-1) > 0.25)
    return vcurr, ncurr, valid_curr


def joint_step(
    R_curr: jnp.ndarray, t_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray, nmap_curr: jnp.ndarray,
    next_depth: jnp.ndarray,
    joint_rows: jnp.ndarray,        # (H*W, 36) from pack_joint
    next_image: jnp.ndarray,
    static_valid: jnp.ndarray,
    intr: CameraIntrinsics, cfg: SLAMConfig,
    assoc_prev: jnp.ndarray | None = None,  # (H*W, 9) carried association
    do_gather: jnp.ndarray | None = None,   # () bool — re-gather this iter?
    nearest: bool = False,   # joint_rows from pack_joint_nearest (9-ch)
    cur_pack=None,           # optional hoisted (vcurr, ncurr, valid_curr)
    sub: SubPixels | None = None,  # subsampled current-frame pixel set
):
    """Fused ICP + photometric correspondence pass sharing ONE row gather
    (the default-config fast path; identical math to icp_step(R=0) +
    rgb_residual up to fp association order — both warp through the same
    K T^-1 transform, reduce.cu:317-334 vs reduce.cu:1013-1028).

    The shared warp comes from the UNGATED depth (the photometric term uses
    every pixel with depth, reduce.cu:1013; the vertex map is additionally
    gated by normal/depth-range validity, which only the ICP term requires
    — where the gate passes both unprojections are bit-identical).

    ``assoc_prev``/``do_gather`` implement fixed-correspondence iterations
    (cfg.tracking_reassoc_period > 1): when ``do_gather`` is False the
    carried association rows [model vertex(3) | normal(3) | weight | depth
    | intensity] are reused and the expensive correspondence gather is
    skipped — all residuals, gates and Jacobians are still recomputed under
    the current pose (classic ICP inner iterations).

    Returns (icp StepResult, RGBCorres, assoc (H*W, 9))."""
    from ..core import camera

    h, w = intr.height, intr.width
    if sub is not None:
        # subsampled current-frame pixel set (tracking_subsample): all
        # per-pixel inputs pre-gathered; the model table stays full-res
        vcurr, ncurr, valid_curr = sub.vcurr, sub.ncurr, sub.valid
        i_next = sub.i_next
        static_valid = sub.static_valid
    elif cur_pack is not None:
        # pose-invariant per-pixel quantities hoisted out of the GN loop
        vcurr, ncurr, valid_curr = cur_pack
        i_next = next_image.reshape(h * w)
    else:
        n_pix = h * w
        vcurr = camera.unproject(next_depth, intr).reshape(n_pix, 3)
        vmap_z = vmap_curr.reshape(n_pix, 3)[:, 2]
        ncurr = nmap_curr.reshape(n_pix, 3)
        valid_curr = (vmap_z > 0) & (jnp.sum(ncurr * ncurr, axis=-1) > 0.25)
        i_next = next_image.reshape(n_pix)

    # full-precision warp: the TPU matmul default is bf16, which shifts the
    # warped coordinate by ~0.2 px — the reference's photometric warp is
    # plain f32 scalar arithmetic (reduce.cu:1013-1028)
    dot = functools.partial(jnp.matmul, precision=_HI)
    vcurr_g = dot(vcurr, R_curr.T) + t_curr
    ncurr_g = dot(ncurr, R_curr.T)
    vcurr_cp = dot(vcurr_g - t_prev, R_prev_inv.T)

    z = vcurr_cp[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u0f = vcurr_cp[:, 0] * intr.fx / safe_z + intr.cx
    v0f = vcurr_cp[:, 1] * intr.fy / safe_z + intr.cy

    # floor coords clamped BEFORE the fraction so boundary pixels (e.g.
    # u0f in [-0.5, 0), valid for the rounding ICP term) select corner 00
    # at the clamped pixel — matching the separate paths' clamped gathers
    u0 = jnp.clip(jnp.floor(u0f).astype(jnp.int32), 0, w - 1)
    v0 = jnp.clip(jnp.floor(v0f).astype(jnp.int32), 0, h - 1)
    au = u0f - u0.astype(jnp.float32)
    av = v0f - v0.astype(jnp.float32)

    # ---- the ONE gather (conditional under fixed-correspondence mode) ----
    if nearest:
        # single-corner table (pack_joint_nearest): the rounded pixel's
        # 9-ch row IS the association [vp np wp d0 i_last] — the
        # reference's nearest-pixel photometric semantics (our bilinear
        # default is a documented strictly-better-accuracy deviation)
        def gather_assoc():
            ui_c = jnp.clip(jnp.round(u0f).astype(jnp.int32), 0, w - 1)
            vi_c = jnp.clip(jnp.round(v0f).astype(jnp.int32), 0, h - 1)
            return joint_rows[vi_c * w + ui_c]         # (N, 9)

    else:
        def gather_assoc():
            flat = v0 * w + u0
            c = joint_rows[flat]                       # (N, 36)
            near_u = (au > 0.5)[:, None]
            near_v = (av > 0.5)[:, None]
            # branchless corner select (a take_along_axis here would be
            # another per-element gather — 3 wide selects are pure VPU
            # work); the per-corner layout is [v(3) n(3) w d i], so
            # sel[:, 7] is already the nearest-corner depth
            sel = jnp.where(near_v,
                            jnp.where(near_u, c[:, 27:36], c[:, 18:27]),
                            jnp.where(near_u, c[:, 9:18], c[:, 0:9]))
            # photometric: bilinear intensity over the 2x2 footprint
            i00, i01, i10, i11 = c[:, 8], c[:, 17], c[:, 26], c[:, 35]
            i_last = (i00 * (1 - au) * (1 - av) + i01 * au * (1 - av)
                      + i10 * (1 - au) * av + i11 * au * av)
            return jnp.concatenate([sel[:, 0:8], i_last[:, None]], axis=-1)

    if assoc_prev is None:
        assoc = gather_assoc()
    elif isinstance(do_gather, bool):
        # static (unrolled-loop) fixed-correspondence mode: no lax.cond in
        # the graph — the round-1 cond-gated variant measured SLOWER than
        # gathering every iteration (NOTES_R1), the static form does not
        assoc = gather_assoc() if do_gather else assoc_prev
    else:
        assoc = jax.lax.cond(do_gather, gather_assoc, lambda: assoc_prev)
    vp = assoc[:, 0:3]
    np_ = assoc[:, 3:6]
    wp = assoc[:, 6]
    d0 = assoc[:, 7]
    i_last = assoc[:, 8]

    ui = jnp.round(u0f).astype(jnp.int32)
    vi = jnp.round(v0f).astype(jnp.int32)
    in_img = (ui >= 0) & (vi >= 0) & (ui < w) & (vi < h) & (z > 0)
    ok = (
        in_img & valid_curr
        & (vp[:, 2] != 0)
        & (jnp.sum(np_ * np_, axis=-1) > 1e-6)
    )
    dist = jnp.linalg.norm(vp - vcurr_g, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(ncurr_g, np_), axis=-1)
    found = ok & (sine <= cfg.angle_threshold) & (dist <= cfg.dist_threshold)

    s_cp = vcurr_cp
    d_cp = (vp - t_prev) @ R_prev_inv.T
    n_cp = np_ @ R_prev_inv.T
    r = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate([n_cp, jnp.cross(s_cp, n_cp), r[:, None]], axis=-1)
    rows = jnp.where(found[:, None], rows, 0.0)
    if cfg.icp_use_weighted:
        weight = jnp.where(found & jnp.isfinite(wp), wp, 0.0)
    else:
        weight = found.astype(rows.dtype)
    A, b, r2 = _gram(rows, weight)
    icp_res = StepResult(A=A, b=b, residual2=r2,
                         count=jnp.sum(found.astype(jnp.float32)))

    # ---- photometric term (bilinear intensity + nearest-corner depth come
    # from the association rows) ----
    in_last = (u0f >= 0) & (v0f >= 0) & (u0f <= w - 1) & (v0f <= h - 1) & (z > 0)
    td1 = z
    depth_ok = (d0 > 0) & (jnp.abs(td1 - d0) <= cfg.max_depth_delta_rgb) & (i_last != 0)
    rgb_valid = static_valid & in_last & depth_ok
    diff = jnp.where(rgb_valid, i_next - i_last, 0.0)
    corres = RGBCorres(
        u0f=u0f, v0f=v0f, d0=d0, diff=diff, valid=rgb_valid,
        sigma_sum=jnp.sum(diff * diff),
        count=jnp.sum(rgb_valid.astype(jnp.float32)),
    )
    return icp_res, corres, assoc


def rgb_static_valid(next_image: jnp.ndarray, d_idx: jnp.ndarray,
                     d_idy: jnp.ndarray, next_depth: jnp.ndarray,
                     min_scale: float) -> jnp.ndarray:
    """Pose-independent part of the photometric correspondence gate
    (reduce.cu:998-1029), hoisted out of the GN loop: in-range, non-isolated
    (4x4 window of nextImage > 0), strong gradient, has depth."""
    h, w = next_image.shape
    P = h * w
    yy = (jnp.arange(P, dtype=jnp.int32) // w)
    xx = (jnp.arange(P, dtype=jnp.int32) % w)
    in_range = (xx < w - 5) & (yy < h - 1)
    # 4x4 window [i-2..i+1] x [j-2..j+1]: patches radius 2 minus the last
    # row/col (offsets +2)
    pat = extract_patches(next_image, 2).reshape(P, 25)
    keep = [dy * 5 + dx for dy in range(0, 4) for dx in range(0, 4)]
    not_isolated = jnp.all(pat[:, jnp.array(keep)] > 0, axis=-1)
    gx = d_idx.reshape(P)
    gy = d_idy.reshape(P)
    strong = (gx * gx + gy * gy) >= min_scale
    has_depth = next_depth.reshape(P) > 0
    return in_range & not_isolated & strong & has_depth


# ---------------------------------------------------------------------- #
# ICP
# ---------------------------------------------------------------------- #

def icp_step(
    R_curr: jnp.ndarray, t_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray, nmap_curr: jnp.ndarray,
    model_rows: jnp.ndarray,        # (H*W, 8) from pack_model
    intr: CameraIntrinsics, cfg: SLAMConfig,
    k1_curr: jnp.ndarray | None = None, k2_curr: jnp.ndarray | None = None,
    k1_prev: jnp.ndarray | None = None, k2_prev: jnp.ndarray | None = None,
    sparse_lambda: jnp.ndarray | None = None,
):
    """Projective-association point-to-plane ICP normal equations
    (reduce.cu:253-573).  *curr maps are the live frame in its camera frame;
    model_rows hold the prediction in WORLD frame (initICPModel semantics).
    The returned system is in the PREVIOUS camera frame (reduce.cu:474-507).

    With cfg.icp_use_correspondence_search, scores a (2R+1)^2 window with
    p = (D_p + D_n + D_c)/3 (reduce.cu:349-430); default R=0 nearest
    projective."""
    h, w = vmap_curr.shape[:2]
    n_pix = h * w
    vcurr = vmap_curr.reshape(n_pix, 3)
    ncurr = nmap_curr.reshape(n_pix, 3)
    valid_curr = (vcurr[:, 2] > 0) & (jnp.sum(ncurr * ncurr, axis=-1) > 0.25)

    vcurr_g = vcurr @ R_curr.T + t_curr
    ncurr_g = ncurr @ R_curr.T
    vcurr_cp = (vcurr_g - t_prev) @ R_prev_inv.T

    z = vcurr_cp[:, 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = jnp.round(vcurr_cp[:, 0] * intr.fx / safe_z + intr.cx).astype(jnp.int32)
    v = jnp.round(vcurr_cp[:, 1] * intr.fy / safe_z + intr.cy).astype(jnp.int32)
    in_img = (u >= 0) & (v >= 0) & (u < w) & (v < h) & (z > 0)

    radius = cfg.icp_search_radius if cfg.icp_use_correspondence_search else 0
    offsets = [(dy, dx) for dy in range(-radius, radius + 1)
               for dx in range(-radius, radius + 1)]

    use_curv = (
        cfg.icp_use_correspondence_search
        and k1_curr is not None and k1_prev is not None
    )
    if use_curv:
        k1c = k1_curr.reshape(n_pix)
        k2c = k2_curr.reshape(n_pix)

    def tap(dy, dx):
        vi, ui = v + dy, u + dx
        flat = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
        rows = model_rows[flat]                      # ONE wide row gather
        vp = rows[:, 0:3]
        np_ = rows[:, 3:6]
        wp = rows[:, 6]
        ok = (
            in_img
            & (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
            & (vp[:, 2] != 0)
            & (jnp.sum(np_ * np_, axis=-1) > 1e-6)
        )
        dist = jnp.linalg.norm(vp - vcurr_g, axis=-1)
        sine = jnp.linalg.norm(jnp.cross(ncurr_g, np_), axis=-1)
        ok &= (sine <= cfg.angle_threshold) & (dist <= cfg.dist_threshold)
        return vp, np_, wp, ok, dist, flat

    if cfg.icp_use_correspondence_search:
        taps = [tap(dy, dx) for dy, dx in offsets]
        d_p_r = jnp.full((n_pix,), -1e8)
        for vp, np_, wp, ok, dist, flat in taps:
            d_p_r = jnp.where(ok, jnp.maximum(d_p_r, dist), d_p_r)

        best_p = jnp.full((n_pix,), 1e8)
        best_v = jnp.zeros((n_pix, 3))
        best_n = jnp.zeros((n_pix, 3))
        best_w = jnp.zeros((n_pix,))
        found = jnp.zeros((n_pix,), bool)
        for (vp, np_, wp, ok, dist, flat), (dy, dx) in zip(taps, offsets):
            if use_curv:
                k1p = _gather(k1_prev[..., None], v + dy, u + dx)[:, 0]
                k2p = _gather(k2_prev[..., None], v + dy, u + dx)[:, 0]
                ckmax = jnp.maximum(jnp.abs(k1p), jnp.abs(k2p))
                d_n = 1.0 - jnp.sum(np_ * ncurr_g, axis=-1)
                d_c = 1.0 - jnp.exp(-jnp.abs(k1p - k1c) / jnp.maximum(ckmax, 1e-6)) * \
                    jnp.exp(-jnp.abs(k2p - k2c) / jnp.maximum(ckmax, 1e-6))
                p = (dist / jnp.maximum(d_p_r, 1e-12) + d_n + d_c) / 3.0
            else:
                p = dist / jnp.maximum(d_p_r, 1e-12)
            better = ok & (p < best_p)
            best_p = jnp.where(better, p, best_p)
            best_v = jnp.where(better[:, None], vp, best_v)
            best_n = jnp.where(better[:, None], np_, best_n)
            best_w = jnp.where(better, wp, best_w)
            found = found | ok
    else:
        best_v, best_n, best_w, found, _, _ = tap(0, 0)

    found &= valid_curr

    # rows in the previous camera frame (reduce.cu:474-507)
    s_cp = (vcurr_g - t_prev) @ R_prev_inv.T
    d_cp = (best_v - t_prev) @ R_prev_inv.T
    n_cp = best_n @ R_prev_inv.T
    d_used = d_cp
    extras = None
    if sparse_lambda is not None:
        # sparse ICP (reduce.cu:479-492): shift the target by the shrinkage
        # variable z and the scaled dual, d' = d + z - lambda/mu
        mu = cfg.sparse_icp_mu
        h = s_cp - d_cp + sparse_lambda / mu
        z = lp_shrink(h, mu, cfg.sparse_icp_p, cfg.sparse_icp_shrink_iters)
        z = jnp.where(found[:, None], z, 0.0)
        d_used = d_cp + z - sparse_lambda / mu
        extras = SparseICPExtras(found=found, d_cp=d_cp, z=z)
    r = jnp.sum(n_cp * (s_cp - d_used), axis=-1)
    rows = jnp.concatenate([n_cp, jnp.cross(s_cp, n_cp), r[:, None]], axis=-1)
    rows = jnp.where(found[:, None], rows, 0.0)

    if cfg.icp_use_weighted:
        weight = jnp.where(found & jnp.isfinite(best_w), best_w, 0.0)
    else:
        weight = found.astype(rows.dtype)

    A, b, r2 = _gram(rows, weight)
    count = jnp.sum(found.astype(jnp.float32))
    res = StepResult(A=A, b=b, residual2=r2, count=count)
    return (res, extras) if sparse_lambda is not None else res


# ---------------------------------------------------------------------- #
# RGB
# ---------------------------------------------------------------------- #

class RGBCorres(NamedTuple):
    u0f: jnp.ndarray     # (N,) float warp target in last image
    v0f: jnp.ndarray
    d0: jnp.ndarray      # (N,) last depth at the (nearest) target
    diff: jnp.ndarray    # (N,) intensity difference next - last
    valid: jnp.ndarray   # (N,) bool
    sigma_sum: jnp.ndarray
    count: jnp.ndarray


def rgb_residual(
    krkinv: jnp.ndarray, kt: jnp.ndarray,
    next_depth: jnp.ndarray, next_image: jnp.ndarray,
    last_rows: jnp.ndarray,          # (H*W, 2) from pack_last
    static_valid: jnp.ndarray,       # (H*W,) from rgb_static_valid
    cfg: SLAMConfig,
) -> RGBCorres:
    """Photometric correspondences + residual statistics
    (reduce.cu:942-1154): NEXT pixels warped into the LAST image via
    (K R K^-1, K t); the last [depth|intensity] pair is fetched with 4
    packed bilinear-corner gathers (intensity interpolated, depth nearest).
    """
    h, w = next_image.shape
    n_pix = h * w
    yy = (jnp.arange(n_pix, dtype=jnp.int32) // w)
    xx = (jnp.arange(n_pix, dtype=jnp.int32) % w)
    xf = xx.astype(jnp.float32)
    yf = yy.astype(jnp.float32)

    d1 = next_depth.reshape(n_pix)
    td1 = d1 * (krkinv[2, 0] * xf + krkinv[2, 1] * yf + krkinv[2, 2]) + kt[2]
    safe_td1 = jnp.where(jnp.abs(td1) > 1e-12, td1, 1e-12)
    u0f = (d1 * (krkinv[0, 0] * xf + krkinv[0, 1] * yf + krkinv[0, 2]) + kt[0]) / safe_td1
    v0f = (d1 * (krkinv[1, 0] * xf + krkinv[1, 1] * yf + krkinv[1, 2]) + kt[1]) / safe_td1
    in_last = (u0f >= 0) & (v0f >= 0) & (u0f <= w - 1) & (v0f <= h - 1)

    if cfg.tracking_rgb_nearest:
        # nearest-pixel lookups (reference semantics): the rounded pixel's
        # corner-00 IS its own (d, i)
        ui = jnp.clip(jnp.round(u0f).astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(jnp.round(v0f).astype(jnp.int32), 0, h - 1)
        c = last_rows[vi * w + ui]                   # (N, 8)
        d0 = c[:, 0]
        i_last = c[:, 1]
    else:
        u0 = jnp.floor(u0f).astype(jnp.int32)
        v0 = jnp.floor(v0f).astype(jnp.int32)
        au = u0f - u0.astype(jnp.float32)
        av = v0f - v0.astype(jnp.float32)

        # ONE row gather fetches the whole 2x2 footprint (pack_last layout)
        flat = jnp.clip(v0, 0, h - 1) * w + jnp.clip(u0, 0, w - 1)
        c = last_rows[flat]                          # (N, 8)
        d00, i00, d01, i01, d10, i10, d11, i11 = (c[:, k] for k in range(8))

        i_last = (i00 * (1 - au) * (1 - av) + i01 * au * (1 - av)
                  + i10 * (1 - au) * av + i11 * au * av)
        # nearest-corner depth (the reference rounds, reduce.cu:1032)
        near_u = au > 0.5
        near_v = av > 0.5
        d0 = jnp.where(
            near_v,
            jnp.where(near_u, d11, d10),
            jnp.where(near_u, d01, d00),
        )

    i_next = next_image.reshape(n_pix)
    depth_ok = (d0 > 0) & (jnp.abs(td1 - d0) <= cfg.max_depth_delta_rgb) & (i_last != 0)
    valid = static_valid & in_last & depth_ok
    diff = jnp.where(valid, i_next - i_last, 0.0)
    return RGBCorres(
        u0f=u0f, v0f=v0f, d0=d0, diff=diff, valid=valid,
        sigma_sum=jnp.sum(diff * diff),
        count=jnp.sum(valid.astype(jnp.float32)),
    )


def rgb_step(
    corres: RGBCorres,
    sigma_val: jnp.ndarray,
    d_idx: jnp.ndarray, d_idy: jnp.ndarray,
    intr: CameraIntrinsics, cfg: SLAMConfig,
) -> StepResult:
    """Photometric 6-DoF normal equations (reduce.cu:697-896).  The 3-D
    cloud point at the matched LAST pixel is derived from the gathered depth
    (cloud = unproject(u0, v0, d0)) instead of gathering a cloud map."""
    valid = corres.valid
    wgt = sigma_val + jnp.abs(corres.diff)
    wgt = jnp.where(wgt > 1.19209290e-07, 1.0 / wgt, 1.0)
    wgt = jnp.where(sigma_val == -1.0, 1.0, wgt)  # rgb-only mode

    u0r = jnp.round(corres.u0f)
    v0r = jnp.round(corres.v0f)
    d0 = corres.d0
    cx = (u0r - intr.cx) * d0 / intr.fx
    cy = (v0r - intr.cy) * d0 / intr.fy
    cz = d0

    invz = 1.0 / jnp.maximum(cz, 1e-12)
    gx = d_idx.reshape(-1)   # accepts (H,W) maps or pre-subsampled (M,)
    gy = d_idy.reshape(-1)
    dix = wgt * cfg.sobel_scale * gx
    diy = wgt * cfg.sobel_scale * gy
    v0 = dix * intr.fx * invz
    v1 = diy * intr.fy * invz
    v2 = -(v0 * cx + v1 * cy) * invz
    r3 = -cz * v1 + cy * v2
    r4 = cz * v0 - cx * v2
    r5 = -cy * v0 + cx * v1
    # Residual sign: the reference stores -w*diff (reduce.cu:742) under its
    # resultRt bookkeeping; in our shared convention (rows (J | r) with the
    # update solving J x = r, identical to icp_step) the residual column is
    # +w*diff — verified by rgb-only convergence tests.
    r6 = wgt * corres.diff
    rows = jnp.stack([v0, v1, v2, r3, r4, r5, r6], axis=-1)
    rows = jnp.where(valid[:, None], rows, 0.0)

    if cfg.rgb_use_gradient_weight:
        gmag = jnp.sqrt(dix * dix + diy * diy)
        rgb_w = jnp.exp(-0.5 * (10.0 / jnp.maximum(gmag, 1e-12)) ** 2)
        weight = jnp.where(valid, rgb_w, 0.0)
    else:
        weight = valid.astype(rows.dtype)

    A, b, r2 = _gram(rows, weight)
    return StepResult(A=A, b=b, residual2=r2, count=corres.count)


# ---------------------------------------------------------------------- #
# SO(3) pre-alignment
# ---------------------------------------------------------------------- #

def so3_step(
    last_image: jnp.ndarray, next_image: jnp.ndarray,
    next_grad_rows: jnp.ndarray,    # (H*W, 3): [image, gx, gy] of next
    last_gx: jnp.ndarray, last_gy: jnp.ndarray,
    image_basis: jnp.ndarray,
    kinv: jnp.ndarray, krlr: jnp.ndarray,
):
    """3-DoF rotation pre-alignment normal equations (reduce.cu:1156-1359).
    Gradient images are precomputed per level (pack_so3); one packed gather
    fetches [image, gx, gy] at the warped pixel."""
    h, w = next_image.shape
    n_pix = h * w
    yy = (jnp.arange(n_pix, dtype=jnp.int32) // w)
    xx = (jnp.arange(n_pix, dtype=jnp.int32) % w)
    xf = xx.astype(jnp.float32)
    yf = yy.astype(jnp.float32)

    wx = image_basis[0, 0] * xf + image_basis[0, 1] * yf + image_basis[0, 2]
    wy = image_basis[1, 0] * xf + image_basis[1, 1] * yf + image_basis[1, 2]
    wz = image_basis[2, 0] * xf + image_basis[2, 1] * yf + image_basis[2, 2]
    uf = wx / wz
    vf = wy / wz
    u = jnp.round(uf).astype(jnp.int32)
    v = jnp.round(vf).astype(jnp.int32)

    valid = (
        (u >= 1) & (u < w - 1) & (v >= 1) & (v < h - 1)
        & (xx >= 1) & (xx < w - 1) & (yy >= 1) & (yy < h - 1)
    )

    flat = jnp.clip(v, 0, h - 1) * w + jnp.clip(u, 0, w - 1)
    nrows = next_grad_rows[flat]
    i_next = nrows[:, 0]
    gx = (nrows[:, 1] + last_gx.reshape(n_pix)) * 0.5
    gy = (nrows[:, 2] + last_gy.reshape(n_pix)) * 0.5

    px = kinv[0, 0] * xf + kinv[0, 1] * yf + kinv[0, 2]
    py = kinv[1, 0] * xf + kinv[1, 1] * yf + kinv[1, 2]
    pz = kinv[2, 0] * xf + kinv[2, 1] * yf + kinv[2, 2]
    z2 = pz * pz
    a_, b_, c_ = krlr[0, 0], krlr[0, 1], krlr[0, 2]
    d_, e_, f_ = krlr[1, 0], krlr[1, 1], krlr[1, 2]
    g_, h_, i_ = krlr[2, 0], krlr[2, 1], krlr[2, 2]
    lp0 = ((pz * (d_ * gy + a_ * gx)) - (gy * g_ * yf) - (gx * g_ * xf)) / z2
    lp1 = ((pz * (e_ * gy + b_ * gx)) - (gy * h_ * yf) - (gx * h_ * xf)) / z2
    lp2 = ((pz * (f_ * gy + c_ * gx)) - (gy * i_ * yf) - (gx * i_ * xf)) / z2
    lp = jnp.stack([lp0, lp1, lp2], axis=-1)
    pt = jnp.stack([px, py, pz], axis=-1)
    jac = jnp.cross(lp, pt)
    res = -(i_next - last_image.reshape(n_pix))
    rows = jnp.concatenate([jac, res[:, None]], axis=-1)
    rows = jnp.where(valid[:, None], rows, 0.0)
    S = jnp.einsum("np,nq->pq", rows, rows,
                   preferred_element_type=jnp.float32, precision=_HI)
    count = jnp.sum(valid.astype(jnp.float32))
    return S[:3, :3], S[:3, 3], S[3, 3], count


def central_gradients(img: jnp.ndarray):
    """(back - fore)/2 gradients with zero borders (reduce.cu:1172-1188)."""
    gx = (jnp.roll(img, 1, 1) - jnp.roll(img, -1, 1)) * 0.5
    gy = (jnp.roll(img, 1, 0) - jnp.roll(img, -1, 0)) * 0.5
    h, w = img.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    inner = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    return jnp.where(inner, gx, 0.0), jnp.where(inner, gy, 0.0)


def pack_so3(image: jnp.ndarray) -> jnp.ndarray:
    """(H,W) -> (H*W, 3) packed [image, gx, gy] rows."""
    gx, gy = central_gradients(image)
    P = image.size
    return jnp.stack([image.reshape(P), gx.reshape(P), gy.reshape(P)], axis=-1)


def _ldlt_solve_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Statically-unrolled LDL^T solve for tiny SPD systems (n <= 8).

    jnp.linalg.solve lowers to a pivoted LU built from ~16 dynamic-update-
    slice ops per call — at 29 solves per frame that was ~1.5 ms/frame of
    op-launch overhead (round-2 trace); the unrolled scalar graph fuses
    into one kernel.  No pivoting: the caller preconditions + damps, so A
    is SPD with unit-scale diagonal."""
    n = A.shape[0]
    a = [[A[i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k] * D[k]
        D[j] = jnp.maximum(s, 1e-12)
        for i in range(j + 1, n):
            t = a[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k] * D[k]
            L[i][j] = t / D[j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i] / D[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return jnp.stack(x)


def solve_system(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Diagonally-preconditioned dense solve (replaces Eigen ldlt on host,
    RGBDOdometry.cpp:1168-1190 — the reference casts to double; we
    precondition to keep f32 stable on TPU)."""
    d = jnp.sqrt(jnp.abs(jnp.diag(A)) + 1e-12)
    dinv = 1.0 / d
    As = A * dinv[:, None] * dinv[None, :]
    bs = b * dinv
    As = As + 1e-6 * jnp.eye(A.shape[0], dtype=A.dtype)
    if A.shape[0] <= 8:
        x = _ldlt_solve_unrolled(As, bs)
    else:
        x = jnp.linalg.solve(As, bs)
    x = x * dinv
    return jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
