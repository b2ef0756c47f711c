"""Per-frame preprocessing: depth filter, vertex/normal/radius, curvature.

TPU-native replacement for the reference's GLSL full-screen passes driven by
``ComputePack`` (SURVEY §2.2):
  - ``depth_bilateral.frag``           -> :func:`bilateral_filter`
  - ``depth_metric_*.frag``            -> folded into the loaders (depth is
                                          already float meters here)
  - ``depth_vertex_normal_radius.frag``-> :func:`vertex_normal_radius`
  - ``depth_curvature_gradient.frag``  -> :func:`curvature_gradient`
  - ``depth_update_normalrad.frag``    -> the HRBF-optimised normal returned
                                          by curvature_gradient
  - ``depth_confidence_evaluation.frag``-> :func:`confidence_map`

All passes are pure (H, W) array programs; per-pixel neighbor loops become
masked patch reductions (static shapes, VPU-dense).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera
from . import hrbf
from .patches import extract_patches


def bilateral_filter(depth: jnp.ndarray, cfg: SLAMConfig) -> jnp.ndarray:
    """Bilateral filter on metric depth.

    depth_bilateral.frag: R=6 window, sigma_space=4.5 px,
    sigma_color=30 mm (=0.03 m); depths outside [0.3, depth_cutoff] are
    zeroed first.  Invalid (0) neighbors contribute weight*0 to the
    numerator but the shader *includes* them in the denominator — we
    reproduce the shader exactly (it divides by the full weight sum).
    """
    d = jnp.where((depth > cfg.depth_min) & (depth <= cfg.depth_cutoff), depth, 0.0)
    R = 6
    sigma_space2_inv_half = 0.024691358  # 0.5 / 4.5^2
    sigma_color2_inv_half = 0.000555556 * 1e6  # shader works in mm; meters^2 scale
    patches = extract_patches(d, R)  # (H, W, D*D)
    D = 2 * R + 1
    dy = (jnp.arange(D * D) // D - R).astype(d.dtype)
    dx = (jnp.arange(D * D) % D - R).astype(d.dtype)
    space2 = dy * dy + dx * dx
    color2 = (d[..., None] - patches) ** 2
    w = jnp.exp(-(space2 * sigma_space2_inv_half + color2 * sigma_color2_inv_half))
    # out-of-image neighbors: the shader clamps the loop to the image, i.e.
    # they are simply absent; zero their weight.
    inb = extract_patches(jnp.ones_like(d), R) > 0
    w = jnp.where(inb, w, 0.0)
    num = jnp.sum(patches * w, axis=-1)
    den = jnp.sum(w, axis=-1)
    out = num / jnp.maximum(den, 1e-12)
    return jnp.where(d > 0, out, 0.0)


def _smallest_eigvec_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Null-ish eigenvector of symmetric 3x3 matrices (…,3,3) via the
    closed-form eigenvalue (Smith's trigonometric method, the same algorithm
    as geometry.glsl computeRoots:72-146) + cross-product null space
    (geometry.glsl:219-240)."""
    a00 = A[..., 0, 0]; a01 = A[..., 0, 1]; a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]; a12 = A[..., 1, 2]; a22 = A[..., 2, 2]
    c0 = (a00 * a11 * a22 + 2 * a01 * a02 * a12
          - a00 * a12 * a12 - a11 * a02 * a02 - a22 * a01 * a01)
    c1 = (a00 * a11 - a01 * a01 + a00 * a22 - a02 * a02 + a11 * a22 - a12 * a12)
    c2 = a00 + a11 + a22
    inv3 = 1.0 / 3.0
    c2o3 = c2 * inv3
    ao3 = jnp.minimum((c1 - c2 * c2o3) * inv3, 0.0)
    half_b = 0.5 * (c0 + c2o3 * (2.0 * c2o3 * c2o3 - c1))
    q = jnp.minimum(half_b * half_b + ao3 * ao3 * ao3, 0.0)
    rho = jnp.sqrt(-ao3)
    theta = jnp.arctan2(jnp.sqrt(-q), half_b) * inv3
    lam_min = c2o3 - rho * (jnp.cos(theta) + jnp.sqrt(3.0) * jnp.sin(theta))
    lam_min = jnp.minimum(lam_min, c2o3 - rho * (jnp.cos(theta) - jnp.sqrt(3.0) * jnp.sin(theta)))
    lam_min = jnp.minimum(lam_min, c2o3 + 2.0 * rho * jnp.cos(theta))
    B = A - lam_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    v1 = jnp.cross(r0, r1)
    v2 = jnp.cross(r0, r2)
    v3 = jnp.cross(r1, r2)
    l1 = jnp.sum(v1 * v1, -1); l2 = jnp.sum(v2 * v2, -1); l3 = jnp.sum(v3 * v3, -1)
    v = jnp.where((l1 >= l2)[..., None] & (l1 >= l3)[..., None], v1,
                  jnp.where((l2 >= l3)[..., None], v2, v3))
    n = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    return n


def surfel_radius(z: jnp.ndarray, n_z: jnp.ndarray, intr: CameraIntrinsics) -> jnp.ndarray:
    """surfels.glsl:19-34: r = sqrt2 * z / meanFocal, slanted by 1/|n_z|,
    clamped at 2x."""
    mf = camera.mean_focal(intr)
    base = z * (1.41421356237 / mf)
    slant = base / jnp.maximum(jnp.abs(n_z), 1e-6)
    return jnp.minimum(2.0 * base, slant)


def normal_pca(vertex_f: jnp.ndarray, cfg: SLAMConfig) -> jnp.ndarray:
    """PCA normal estimation over a 7x7 window (geometry.glsl:190-244):
    neighbors gated by z>0.3 and |dz|<0.05, need >=8 points, smallest
    covariance eigenvector, flipped to n_z > 0."""
    R = 3  # winMultiply = 3.0 in depth_vertex_normal_radius.frag:35
    pts = extract_patches(vertex_f, R)  # (H, W, K, 3)
    z = vertex_f[..., 2]
    zn = pts[..., 2]
    valid = (zn > cfg.depth_min) & (jnp.abs(zn - z[..., None]) < 0.05)
    cnt = jnp.sum(valid, axis=-1)
    w = valid.astype(vertex_f.dtype)[..., None]
    denom = jnp.maximum(cnt, 1)[..., None].astype(vertex_f.dtype)
    mean = jnp.sum(pts * w, axis=-2) / denom
    centered = (pts - mean[..., None, :]) * w
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered) / denom[..., None]
    n = _smallest_eigvec_3x3(cov)
    n = n * jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    ok = (cnt >= 8) & (z > cfg.depth_min)
    return jnp.where(ok[..., None], n, 0.0)


def normal_central_diff(vertex_f: jnp.ndarray, depth_raw: jnp.ndarray,
                        cfg: SLAMConfig) -> jnp.ndarray:
    """Central-difference normal (geometry.glsl:35-47) with the 4-neighbor
    validity gate of utils.glsl checkNeighbours; flipped to n_z > 0 for
    consistency with the PCA path (the cross product as written yields
    camera-facing normals)."""
    xf = jnp.roll(vertex_f, -1, axis=1)
    xb = jnp.roll(vertex_f, 1, axis=1)
    yf = jnp.roll(vertex_f, -1, axis=0)
    yb = jnp.roll(vertex_f, 1, axis=0)
    del_x = (xb - xf) * 0.5
    del_y = (yb - yf) * 0.5
    n = jnp.cross(del_x, del_y)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = n * jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    dz = depth_raw
    ok = (
        (jnp.roll(dz, 1, 1) > 0) & (jnp.roll(dz, -1, 1) > 0)
        & (jnp.roll(dz, 1, 0) > 0) & (jnp.roll(dz, -1, 0) > 0)
        & (dz > 0)
    )
    # image borders invalid (roll wraps)
    h, w = dz.shape
    yy, xx = camera.pixel_grid(h, w)
    ok &= (xx >= 1) & (xx < w - 1) & (yy >= 1) & (yy < h - 1)
    return jnp.where(ok[..., None], n, 0.0)


class VertexNormalRadius(NamedTuple):
    vertex_raw: jnp.ndarray      # (H, W, 3)
    vertex_filtered: jnp.ndarray # (H, W, 3)
    normal: jnp.ndarray          # (H, W, 3), zero if invalid
    radius: jnp.ndarray          # (H, W), includes cfg.radius_multiplier
    valid: jnp.ndarray           # (H, W) bool


def vertex_normal_radius(depth_raw: jnp.ndarray, depth_filtered: jnp.ndarray,
                         intr: CameraIntrinsics, cfg: SLAMConfig) -> VertexNormalRadius:
    """depth_vertex_normal_radius.frag: unproject raw+filtered, estimate
    normal (PCA by default), init radius = multiplier * getRadius."""
    v_raw = camera.unproject(depth_raw, intr)
    v_f = camera.unproject(depth_filtered, intr)
    if cfg.normal_pca:
        if cfg.use_pallas:
            from . import pallas_kernels

            n = pallas_kernels.normal_pca(v_f, cfg)
        else:
            n = normal_pca(v_f, cfg)
    else:
        n = normal_central_diff(v_f, depth_raw, cfg)
    rad = cfg.radius_multiplier * surfel_radius(v_f[..., 2], n[..., 2], intr)
    valid = (
        (jnp.linalg.norm(n, axis=-1) >= 0.3)
        & (v_raw[..., 2] >= cfg.depth_min)
        & (v_f[..., 2] >= cfg.depth_min)
    )
    zero3 = jnp.zeros_like(v_raw)
    return VertexNormalRadius(
        vertex_raw=jnp.where(valid[..., None], v_raw, zero3),
        vertex_filtered=jnp.where(valid[..., None], v_f, zero3),
        normal=jnp.where(valid[..., None], n, zero3),
        radius=jnp.where(valid, rad, 0.0),
        valid=valid,
    )


class CurvatureResult(NamedTuple):
    k1: jnp.ndarray          # (H, W) principal curvature max (1000 = invalid)
    k2: jnp.ndarray          # (H, W)
    dir1: jnp.ndarray        # (H, W, 3)
    dir2: jnp.ndarray        # (H, W, 3)
    gradient_mag: jnp.ndarray  # (H, W)  |<grad f, n>| fitting indicator
    normal_opt: jnp.ndarray  # (H, W, 3) HRBF-optimised normal (0 if invalid)
    radius_opt: jnp.ndarray  # (H, W) radius recomputed from optimised normal
    valid: jnp.ndarray       # (H, W) bool


def curvature_gradient(pre: VertexNormalRadius, intr: CameraIntrinsics,
                       cfg: SLAMConfig, chunk: int = 16384) -> CurvatureResult:
    """The HRBF curvature/gradient pass (depth_curvature_gradient.frag:28-142).

    Per pixel: gather the (2*curv_window+1)^2 neighborhood of the filtered
    vertex map, gate by |dz|<0.10 / z>0.3 / |n|>0.8, require >15 supports,
    evaluate the HRBF gradient + Hessian at the centre vertex and convert to
    principal curvatures via the Monge-patch fundamental forms.

    Computation is chunked over pixels to bound the (pixels, K, 3, 3, 3)
    intermediates (the GLSL equivalent touches the same data through the
    texture cache).
    """
    R = cfg.curv_window
    v = pre.vertex_filtered
    n = pre.normal
    h, w = v.shape[:2]
    k = (2 * R + 1) ** 2

    nb_v = extract_patches(v, R).reshape(h * w, k, 3)
    nb_n = extract_patches(n, R).reshape(h * w, k, 3)
    nb_r = extract_patches(pre.radius, R).reshape(h * w, k)
    vc = v.reshape(h * w, 3)
    nc = n.reshape(h * w, 3)

    nb_mask = (
        (jnp.abs(nb_v[..., 2] - vc[..., 2:3]) < 0.10)
        & (nb_v[..., 2] > cfg.depth_min)
        & (jnp.linalg.norm(nb_n, axis=-1) > 0.8)
    )

    center_ok = (vc[..., 2] > cfg.depth_min) & (jnp.linalg.norm(nc, axis=-1) > 0.5)

    def block(args):
        bvc, bnc, bnb_v, bnb_n, bnb_r, bmask = args
        cnt = jnp.sum(bmask, axis=-1)
        grad = hrbf.hrbf_gradient(bvc, bnb_v, bnb_n, bnb_r, bmask)
        H = hrbf.hrbf_hessian(bvc, bnb_v, bnb_n, bnb_r, bmask)
        k1, k2, d1, d2, kvalid = hrbf.principal_curvatures(grad, H)
        gmag = jnp.abs(jnp.sum(grad * bnc, axis=-1))
        gn = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-20)
        enough = cnt > 15
        return k1, k2, d1, d2, gmag, gn, enough & kvalid

    npix = h * w
    chunk = min(chunk, npix)
    pad = (-npix) % chunk
    def padded(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)).reshape(
            (npix + pad) // chunk, chunk, *x.shape[1:]
        )

    outs = jax.lax.map(
        block,
        (padded(vc), padded(nc), padded(nb_v), padded(nb_n), padded(nb_r), padded(nb_mask)),
    )
    k1, k2, d1, d2, gmag, gn, ok = [o.reshape(-1, *o.shape[2:])[:npix] for o in outs]

    ok = ok & center_ok
    sent = jnp.float32(1000.0)
    k1 = jnp.where(ok, k1, sent).reshape(h, w)
    k2 = jnp.where(ok, k2, sent).reshape(h, w)
    d1 = jnp.where(ok[..., None], d1, 0.0).reshape(h, w, 3)
    d2 = jnp.where(ok[..., None], d2, 0.0).reshape(h, w, 3)
    gmag = jnp.where(ok, gmag, 0.0).reshape(h, w)
    gn = jnp.where(ok[..., None], gn, 0.0).reshape(h, w, 3)
    rad_opt = jnp.where(
        ok, surfel_radius(vc[..., 2], gn.reshape(-1, 3)[..., 2], intr) * cfg.radius_multiplier, 0.0
    ).reshape(h, w)
    return CurvatureResult(
        k1=k1, k2=k2, dir1=d1, dir2=d2, gradient_mag=gmag,
        normal_opt=gn, radius_opt=rad_opt, valid=ok.reshape(h, w),
    )


def update_normal_rad(pre: VertexNormalRadius, curv: CurvatureResult,
                      cfg: SLAMConfig) -> VertexNormalRadius:
    """depth_update_normalrad.frag: replace the PCA/central-diff normal with
    the HRBF-gradient normal where the curvature pass succeeded.  The radius
    keeps the original estimate (frag keeps .w from NormalRadSampler)."""
    use = curv.valid & (jnp.linalg.norm(curv.normal_opt, axis=-1) > 0.5)
    n = jnp.where(use[..., None], curv.normal_opt, pre.normal)
    return pre._replace(normal=n)


def confidence_map(pre: VertexNormalRadius, curv: CurvatureResult,
                   intr: CameraIntrinsics, cfg: SLAMConfig,
                   weighting: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """depth_confidence_evaluation.frag + surfels.glsl:37-46.

    conf = exp(-radial^2 / 0.72) * weighting, optionally *
    exp(-epsilon / sqrt(gradient_mag)) when reconstruction-indicated
    confidence is enabled.  ``weighting`` is the velocity/motion weight
    computed by the pipeline (HRBFFusion.cpp:1112-1123)."""
    h, w = pre.radius.shape
    yy, xx = camera.pixel_grid(h, w)
    max_dist = camera.max_radial_dist(intr)
    dx = xx - intr.cx
    dy = yy - intr.cy
    radial = jnp.sqrt(dx * dx + dy * dy) / max_dist
    conf = jnp.exp(-(radial * radial) / 0.72) * weighting
    if cfg.use_conf_eval:
        conf = conf * jnp.exp(
            -cfg.conf_eval_epsilon / jnp.sqrt(jnp.maximum(curv.gradient_mag, 1e-12))
        )
    return conf
