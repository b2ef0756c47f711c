"""Fused tracking residual + normal-equation kernels.

TPU-native equivalents of the reference's CUDA tracking suite
(``Core/src/Cuda/reduce.cu``):
  ICPReduction::search/getProducts (l.253-573) -> :func:`icp_step`
  RGBResidual (l.942-1154)                     -> :func:`rgb_residual`
  RGBReduction (l.697-896)                     -> :func:`rgb_step`
  SO3Reduction (l.1156-1359)                   -> :func:`so3_step`

Design: instead of the CUDA warp/block JtJ tree reduction producing 27
upper-triangular floats, every pixel contributes a 7-vector
``row = [J | r]``; the whole normal-equation system is one weighted Gram
matrix ``S = (w*rows)^T rows`` computed by a single (N,7)x(N,7) matmul on
the MXU — ``S[:6,:6] = JtJ``, ``S[:6,6] = Jtb``, ``S[6,6] = sum r^2``.
The 19-iteration Gauss-Newton stays entirely on device (no 27-float
device->host downloads per iteration as in RGBDOdometry.cpp:796-1249).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig


def _gather(map2d: jnp.ndarray, vi: jnp.ndarray, ui: jnp.ndarray) -> jnp.ndarray:
    """Clamped nearest-pixel gather. map2d: (H,W[,C]); vi/ui: (N,) int32."""
    h, w = map2d.shape[:2]
    uic = jnp.clip(ui, 0, w - 1)
    vic = jnp.clip(vi, 0, h - 1)
    flat = map2d.reshape((h * w,) + map2d.shape[2:])
    return flat[vic * w + uic]


def _gather_bilinear(map2d: jnp.ndarray, vf: jnp.ndarray, uf: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather of a scalar map at float coords. The reference rounds
    to nearest (reduce.cu:1032-1033); bilinear removes the +-0.5 px intensity
    quantisation and is equally cheap on TPU."""
    h, w = map2d.shape[:2]
    u0 = jnp.floor(uf)
    v0 = jnp.floor(vf)
    au = uf - u0
    av = vf - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    m00 = _gather(map2d[..., None], v0i, u0i)[:, 0]
    m01 = _gather(map2d[..., None], v0i, u0i + 1)[:, 0]
    m10 = _gather(map2d[..., None], v0i + 1, u0i)[:, 0]
    m11 = _gather(map2d[..., None], v0i + 1, u0i + 1)[:, 0]
    return (m00 * (1 - au) * (1 - av) + m01 * au * (1 - av)
            + m10 * (1 - au) * av + m11 * au * av)


def _gram(rows: jnp.ndarray, weight: jnp.ndarray):
    """rows: (N,7), weight: (N,) -> (A (6,6), b (6,), r2_sum, count_proxy).

    Weighted Gram matrix on the MXU; exactly the quantities the CUDA
    JtJJtrSE3 reduction produces (reduce.cu:511-545)."""
    wr = rows * weight[:, None]
    S = jnp.einsum("np,nq->pq", wr, rows, preferred_element_type=jnp.float32)
    return S[:6, :6], S[:6, 6], S[6, 6]


class StepResult(NamedTuple):
    A: jnp.ndarray        # (6,6)
    b: jnp.ndarray        # (6,)
    residual2: jnp.ndarray  # scalar sum of squared residuals
    count: jnp.ndarray    # scalar inlier count


def icp_step(
    R_curr: jnp.ndarray, t_curr: jnp.ndarray,
    R_prev_inv: jnp.ndarray, t_prev: jnp.ndarray,
    vmap_curr: jnp.ndarray, nmap_curr: jnp.ndarray,
    vmap_g_prev: jnp.ndarray, nmap_g_prev: jnp.ndarray,
    icp_weight_prev: jnp.ndarray,
    intr: CameraIntrinsics, cfg: SLAMConfig,
    k1_curr: jnp.ndarray | None = None, k2_curr: jnp.ndarray | None = None,
    k1_prev: jnp.ndarray | None = None, k2_prev: jnp.ndarray | None = None,
) -> StepResult:
    """Projective-association point-to-plane ICP normal equations.

    reduce.cu:253-573.  All *curr maps are the live frame in its camera
    frame; *g_prev maps are the model prediction in WORLD frame (as uploaded
    by initICPModel, RGBDOdometry.cpp:208-247).  The returned system is in
    the PREVIOUS camera frame (rows built from s_cp/d_cp/n_cp,
    reduce.cu:474-507).

    With cfg.icp_use_correspondence_search, scores a (2R+1)^2 window with
    p = (D_p + D_n + D_c)/3 (reduce.cu:349-430); default R=0 nearest
    projective.
    """
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

    use_curv = (
        cfg.icp_use_correspondence_search
        and k1_curr is not None and k1_prev is not None
    )
    radius = cfg.icp_search_radius if cfg.icp_use_correspondence_search else 0
    offsets = [(dy, dx) for dy in range(-radius, radius + 1)
               for dx in range(-radius, radius + 1)]

    if use_curv:
        k1c = k1_curr.reshape(n_pix)
        k2c = k2_curr.reshape(n_pix)

    # pass 1: max candidate distance D_p_R for the D_p normalisation
    # (reduce.cu:394-395); single pass when R==0.
    best_p = jnp.full((n_pix,), 1e8)
    best_v = jnp.zeros((n_pix, 3))
    best_n = jnp.zeros((n_pix, 3))
    best_w = jnp.zeros((n_pix,))
    found = jnp.zeros((n_pix,), bool)

    if cfg.icp_use_correspondence_search:
        d_p_r = jnp.full((n_pix,), -1e8)
        for dy, dx in offsets:
            vp = _gather(vmap_g_prev, v + dy, u + dx)
            np_ = _gather(nmap_g_prev, v + dy, u + dx)
            ok = (
                in_img
                & (v + dy >= 0) & (v + dy < h) & (u + dx >= 0) & (u + dx < w)
                & (vp[:, 2] != 0)
                & (jnp.sum(np_ * np_, axis=-1) > 1e-6)
            )
            dist = jnp.linalg.norm(vp - vcurr_g, axis=-1)
            sine = jnp.linalg.norm(jnp.cross(ncurr_g, np_), axis=-1)
            ok &= (sine <= cfg.angle_threshold) & (dist <= cfg.dist_threshold)
            d_p_r = jnp.where(ok, jnp.maximum(d_p_r, dist), d_p_r)
    else:
        d_p_r = None

    for dy, dx in offsets:
        vi, ui = v + dy, u + dx
        vp = _gather(vmap_g_prev, vi, ui)
        np_ = _gather(nmap_g_prev, vi, ui)
        wp = _gather(icp_weight_prev[..., None], vi, ui)[:, 0]
        ok = (
            in_img
            & (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
            & (vp[:, 2] != 0)
            & (jnp.sum(np_ * np_, axis=-1) > 1e-6)
        )
        dist = jnp.linalg.norm(vp - vcurr_g, axis=-1)
        sine = jnp.linalg.norm(jnp.cross(ncurr_g, np_), axis=-1)
        ok &= (sine <= cfg.angle_threshold) & (dist <= cfg.dist_threshold)
        if use_curv:
            k1p = _gather(k1_prev[..., None], vi, ui)[:, 0]
            k2p = _gather(k2_prev[..., None], vi, ui)[:, 0]
            ckmax = jnp.maximum(jnp.abs(k1p), jnp.abs(k2p))
            d_n = 1.0 - jnp.sum(np_ * ncurr_g, axis=-1)
            d_c = 1.0 - jnp.exp(-jnp.abs(k1p - k1c) / jnp.maximum(ckmax, 1e-6)) * \
                jnp.exp(-jnp.abs(k2p - k2c) / jnp.maximum(ckmax, 1e-6))
            d_p = dist / jnp.maximum(d_p_r, 1e-12)
            p = (d_p + d_n + d_c) / 3.0
        elif cfg.icp_use_correspondence_search:
            p = dist / jnp.maximum(d_p_r, 1e-12)
        else:
            p = dist  # single candidate (R=0); any deterministic score works
        better = ok & (p < best_p)
        best_p = jnp.where(better, p, best_p)
        best_v = jnp.where(better[:, None], vp, best_v)
        best_n = jnp.where(better[:, None], np_, best_n)
        best_w = jnp.where(better, wp, best_w)
        found = found | ok

    found &= valid_curr

    # rows in the previous camera frame (reduce.cu:474-507)
    s_cp = (vcurr_g - t_prev) @ R_prev_inv.T
    d_cp = (best_v - t_prev) @ R_prev_inv.T
    n_cp = best_n @ R_prev_inv.T
    r = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate(
        [n_cp, jnp.cross(s_cp, n_cp), r[:, None]], axis=-1
    )
    rows = jnp.where(found[:, None], rows, 0.0)

    if cfg.icp_use_weighted:
        weight = jnp.where(found & jnp.isfinite(best_w), best_w, 0.0)
        weight = jnp.where(found & ~jnp.isfinite(best_w), 0.0, weight)
    else:
        weight = found.astype(rows.dtype)

    A, b, r2 = _gram(rows, weight)
    count = jnp.sum(found.astype(jnp.float32))
    return StepResult(A=A, b=b, residual2=r2, count=count)


class RGBCorres(NamedTuple):
    u0: jnp.ndarray      # (N,) matched pixel in last image
    v0: jnp.ndarray
    diff: jnp.ndarray    # (N,) intensity difference next - last
    valid: jnp.ndarray   # (N,) bool
    sigma_sum: jnp.ndarray  # scalar sum diff^2
    count: jnp.ndarray   # scalar inlier count


def rgb_residual(
    krkinv: jnp.ndarray, kt: jnp.ndarray,
    d_idx: jnp.ndarray, d_idy: jnp.ndarray,
    last_depth: jnp.ndarray, next_depth: jnp.ndarray,
    last_image: jnp.ndarray, next_image: jnp.ndarray,
    min_scale: float, cfg: SLAMConfig,
) -> RGBCorres:
    """Photometric correspondences + residual statistics
    (reduce.cu:942-1154).  Pixels of the NEXT image with strong gradient are
    warped into the LAST image with the current relative transform
    (K R K^-1, K t)."""
    h, w = next_image.shape
    n_pix = h * w
    yy = (jnp.arange(n_pix, dtype=jnp.int32) // w)
    xx = (jnp.arange(n_pix, dtype=jnp.int32) % w)
    xf = xx.astype(jnp.float32)
    yf = yy.astype(jnp.float32)

    in_range = (xx < w - 5) & (yy < h - 1)

    # "not isolated": 4x4 window [i-2..i+1] x [j-2..j+1] of nextImage > 0
    not_isolated = jnp.ones((n_pix,), bool)
    for dy in range(-2, 2):
        for dx in range(-2, 2):
            vi = jnp.clip(yy + dy, 0, h - 1)
            ui = jnp.clip(xx + dx, 0, w - 1)
            not_isolated &= _gather(next_image[..., None], vi, ui)[:, 0] > 0

    gx = d_idx.reshape(n_pix)
    gy = d_idy.reshape(n_pix)
    strong = (gx * gx + gy * gy) >= min_scale

    d1 = next_depth.reshape(n_pix)
    has_depth = d1 > 0

    td1 = d1 * (krkinv[2, 0] * xf + krkinv[2, 1] * yf + krkinv[2, 2]) + kt[2]
    u0f = (d1 * (krkinv[0, 0] * xf + krkinv[0, 1] * yf + krkinv[0, 2]) + kt[0]) / td1
    v0f = (d1 * (krkinv[1, 0] * xf + krkinv[1, 1] * yf + krkinv[1, 2]) + kt[1]) / td1
    u0 = jnp.round(u0f).astype(jnp.int32)
    v0 = jnp.round(v0f).astype(jnp.int32)
    in_last = (u0 >= 0) & (v0 >= 0) & (u0 < w) & (v0 < h)

    d0 = _gather(last_depth[..., None], v0, u0)[:, 0]
    i_last = _gather_bilinear(last_image, v0f, u0f)
    i_next = next_image.reshape(n_pix)
    depth_ok = (d0 > 0) & (jnp.abs(td1 - d0) <= cfg.max_depth_delta_rgb) & (i_last != 0)

    valid = in_range & not_isolated & strong & has_depth & in_last & depth_ok
    diff = jnp.where(valid, i_next - i_last, 0.0)
    return RGBCorres(
        u0=u0, v0=v0, diff=diff, valid=valid,
        sigma_sum=jnp.sum(diff * diff),
        count=jnp.sum(valid.astype(jnp.float32)),
    )


def rgb_step(
    corres: RGBCorres,
    sigma_val: jnp.ndarray,
    last_cloud: jnp.ndarray,   # (H,W,3) lastDepth unprojected (pointClouds)
    d_idx: jnp.ndarray, d_idy: jnp.ndarray,
    intr: CameraIntrinsics, cfg: SLAMConfig,
) -> StepResult:
    """Photometric 6-DoF normal equations (reduce.cu:697-896)."""
    h, w = d_idx.shape
    n_pix = h * w
    valid = corres.valid
    wgt = sigma_val + jnp.abs(corres.diff)
    wgt = jnp.where(wgt > 1.19209290e-07, 1.0 / wgt, 1.0)
    wgt = jnp.where(sigma_val == -1.0, 1.0, wgt)  # rgb-only mode

    cloud = _gather(last_cloud, corres.v0, corres.u0)
    invz = 1.0 / jnp.maximum(cloud[:, 2], 1e-12)
    gx = d_idx.reshape(n_pix)
    gy = d_idy.reshape(n_pix)
    dix = wgt * cfg.sobel_scale * gx
    diy = wgt * cfg.sobel_scale * gy
    v0 = dix * intr.fx * invz
    v1 = diy * intr.fy * invz
    v2 = -(v0 * cloud[:, 0] + v1 * cloud[:, 1]) * invz
    r3 = -cloud[:, 2] * v1 + cloud[:, 1] * v2
    r4 = cloud[:, 2] * v0 - cloud[:, 0] * v2
    r5 = -cloud[:, 1] * v0 + cloud[:, 0] * v1
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


def so3_step(
    last_image: jnp.ndarray, next_image: jnp.ndarray,
    image_basis: jnp.ndarray,   # K R K^-1 (3,3)
    kinv: jnp.ndarray, krlr: jnp.ndarray,
):
    """3-DoF rotation pre-alignment normal equations (reduce.cu:1156-1359).
    Returns (A (3,3), b (3,), residual2, count)."""
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

    def grad(img, vi, ui):
        # (back+actu)/2 - (fore+actu)/2  == (back - fore)/2  (reduce.cu:1172)
        b_x = _gather(img[..., None], vi, ui - 1)[:, 0]
        f_x = _gather(img[..., None], vi, ui + 1)[:, 0]
        b_y = _gather(img[..., None], vi - 1, ui)[:, 0]
        f_y = _gather(img[..., None], vi + 1, ui)[:, 0]
        return (b_x - f_x) * 0.5, (b_y - f_y) * 0.5

    gnx, gny = grad(next_image, v, u)
    glx, gly = grad(last_image, yy, xx)
    gx = (gnx + glx) * 0.5
    gy = (gny + gly) * 0.5

    # point = K^-1 (x,y,1)
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
    i_next = _gather_bilinear(next_image, vf, uf)
    i_last = last_image.reshape(n_pix)
    res = -(i_next - i_last)
    rows = jnp.concatenate([jac, res[:, None]], axis=-1)
    rows = jnp.where(valid[:, None], rows, 0.0)
    S = jnp.einsum("np,nq->pq", rows, rows, preferred_element_type=jnp.float32)
    count = jnp.sum(valid.astype(jnp.float32))
    return S[:3, :3], S[:3, 3], S[3, 3], count


def solve_system(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Diagonally-preconditioned dense solve (replaces Eigen ldlt on host,
    RGBDOdometry.cpp:1168-1190 — the reference casts to double; we
    precondition to keep f32 stable on TPU)."""
    d = jnp.sqrt(jnp.abs(jnp.diag(A)) + 1e-12)
    dinv = 1.0 / d
    As = A * dinv[:, None] * dinv[None, :]
    bs = b * dinv
    # tiny Tikhonov to survive rank deficiency (flat scenes)
    As = As + 1e-6 * jnp.eye(A.shape[0], dtype=A.dtype)
    x = jnp.linalg.solve(As, bs)
    x = x * dinv
    return jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
