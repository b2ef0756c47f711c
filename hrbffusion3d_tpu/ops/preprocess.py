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
    covariance eigenvector, flipped to n_z > 0.

    Shifted-window moment accumulation in CENTER-RELATIVE coordinates
    (q = p_nb - p_center): per offset one padded slice adds (w, q, q q^T)
    into 1+3+6 image-sized accumulators; cov = E[q q^T] - E[q] E[q]^T is
    translation-invariant so this equals the centered patch-stack einsum,
    and q's small magnitude keeps the f32 moment subtraction
    cancellation-safe (raw world coordinates would lose ~6 digits).  No
    (H, W, 49, 3) patch tables hit HBM."""
    R = 3  # winMultiply = 3.0 in depth_vertex_normal_radius.frag:35
    h, w_ = vertex_f.shape[:2]
    D = 2 * R + 1
    vp = jnp.pad(vertex_f, [(R, R), (R, R), (0, 0)])
    z = vertex_f[..., 2]
    cnt = jnp.zeros((h, w_), jnp.int32)
    s1 = jnp.zeros((h, w_, 3), vertex_f.dtype)       # sum q
    s2 = jnp.zeros((h, w_, 6), vertex_f.dtype)       # sum qq^T (sym)
    for dy in range(D):
        for dx in range(D):
            nb = jax.lax.dynamic_slice(vp, (dy, dx, 0), (h, w_, 3))
            zn = nb[..., 2]
            valid = (zn > cfg.depth_min) & (jnp.abs(zn - z) < 0.05)
            q = jnp.where(valid[..., None], nb - vertex_f, 0.0)
            cnt += valid.astype(jnp.int32)
            s1 += q
            q0, q1, q2 = q[..., 0], q[..., 1], q[..., 2]
            s2 += jnp.stack([q0 * q0, q0 * q1, q0 * q2,
                             q1 * q1, q1 * q2, q2 * q2], axis=-1)
    denom = jnp.maximum(cnt, 1).astype(vertex_f.dtype)
    mean = s1 / denom[..., None]
    m0, m1, m2 = mean[..., 0], mean[..., 1], mean[..., 2]
    e2 = s2 / denom[..., None]
    cov6 = e2 - jnp.stack([m0 * m0, m0 * m1, m0 * m2,
                           m1 * m1, m1 * m2, m2 * m2], axis=-1)
    row0 = jnp.stack([cov6[..., 0], cov6[..., 1], cov6[..., 2]], axis=-1)
    row1 = jnp.stack([cov6[..., 1], cov6[..., 3], cov6[..., 4]], axis=-1)
    row2 = jnp.stack([cov6[..., 2], cov6[..., 4], cov6[..., 5]], axis=-1)
    cov = jnp.stack([row0, row1, row2], axis=-2)
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

    Per pixel: the (2*curv_window+1)^2 neighborhood of the filtered vertex
    map, gated by |dz|<0.10 / z>0.3 / |n|>0.8, >15 supports required; HRBF
    gradient + Hessian at the centre vertex -> principal curvatures via the
    Monge-patch fundamental forms.

    Formulated as a shifted-window accumulation: per window offset, slice
    the padded maps and add the neighbor's direct (∇f, ∇²f) contribution
    (hrbf.grad_hess_direct) into 1+3+6 image-sized accumulators — no
    (P, 49, 3) patch tables and no (P, 49, 3, 3[,3]) phi-derivative
    intermediates ever hit HBM (the previous einsum formulation streamed
    ~2 GB per frame and measured ~12 ms/frame on the chip)."""
    del chunk  # accumulators are image-sized; no pixel chunking needed
    R = cfg.curv_window
    v = pre.vertex_filtered
    n = pre.normal
    h, w = v.shape[:2]
    vc = v.reshape(h * w, 3)
    nc = n.reshape(h * w, 3)

    D = 2 * R + 1
    vp = jnp.pad(v, [(R, R), (R, R), (0, 0)])
    np_ = jnp.pad(n, [(R, R), (R, R), (0, 0)])
    rp = jnp.pad(pre.radius, [(R, R), (R, R)])

    z_c = v[..., 2]
    grad = jnp.zeros((h, w, 3), v.dtype)
    h6 = jnp.zeros((h, w, 6), v.dtype)
    cnt = jnp.zeros((h, w), jnp.int32)
    for dy in range(D):
        for dx in range(D):
            nb_v = jax.lax.dynamic_slice(vp, (dy, dx, 0), (h, w, 3))
            nb_n = jax.lax.dynamic_slice(np_, (dy, dx, 0), (h, w, 3))
            nb_r = jax.lax.dynamic_slice(rp, (dy, dx), (h, w))
            mask = (
                (jnp.abs(nb_v[..., 2] - z_c) < 0.10)
                & (nb_v[..., 2] > cfg.depth_min)
                & (jnp.sum(nb_n * nb_n, axis=-1) > 0.64)
            )
            dv = v - nb_v
            d2 = jnp.sum(dv * dv, axis=-1)
            g_c, h_c = hrbf.grad_hess_direct(dv, d2, nb_n, nb_r, mask)
            grad += g_c
            h6 += h_c
            cnt += mask.astype(jnp.int32)

    grad = grad.reshape(h * w, 3)
    H = hrbf.hess_from_h6(h6.reshape(h * w, 6))
    k1, k2, d1, d2, kvalid = hrbf.principal_curvatures(grad, H)
    gmag = jnp.abs(jnp.sum(grad * nc, axis=-1))
    gn = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-20)
    center_ok = (vc[..., 2] > cfg.depth_min) & (jnp.linalg.norm(nc, axis=-1) > 0.5)
    ok = (cnt.reshape(h * w) > 15) & kvalid & center_ok
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
