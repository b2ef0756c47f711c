"""Bundle adjustment: batched Gauss-Newton with explicit Schur complement.

TPU-native replacement for the g2o-based ``Optimizer::LocalBundleAdjustment3D``
/ ``BundleAdjustment3D`` (``Core/src/ORB_SLAM2_m/src/Optimizer.cc:1069-1351,
301-525``): 3-D point-to-point edges ``e = obs - Tcw(X)``
(``Optimizer.h:51-57`` EdgeRGBDSE3XYZ) with camera-space information matrices
built from the quadratic Kinect depth-noise model (Optimizer.cc:1216-1237),
Huber robustification (delta^2 = 7.815), and the reference's 5+10-iteration
outlier-demotion protocol.

g2o's sparse Cholesky does not map to the MXU; instead the camera-landmark
structure is exploited explicitly (SURVEY §7.3 hard part 4):
  - landmark Hessian blocks are batched 3x3 inverses,
  - the reduced camera system S = Hcc - W Hll^-1 W^T is accumulated as a
    dense (C,6,C,6) tensor via scatter-adds over per-landmark camera pairs,
  - one dense solve updates all cameras; landmarks back-substitute in batch.
This is also the unit that distributes: shard landmarks over devices and
psum S (parallel/dist_ba.py).

Problem encoding (static shapes):
  cams:      (C,4,4) Tcw (world->camera, ORB-SLAM convention)
  points:    (L,3)   world landmarks
  obs:       (E,3)   observed camera-frame 3D points
  cam_idx:   (E,)    camera of each edge
  lm_idx:    (E,)    landmark of each edge
  info:      (E,3,3) information matrices
  edge_valid:(E,)    mask (padding / culled edges)
  fixed:     (C,)    bool — gauge-fixed cameras (pose held)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie

HUBER_DELTA2 = 7.815  # Optimizer.cc: thHuberRGBD^2 (chi2 95%, 3 DoF)


class BAProblem(NamedTuple):
    cams: jnp.ndarray
    points: jnp.ndarray
    obs: jnp.ndarray
    cam_idx: jnp.ndarray
    lm_idx: jnp.ndarray
    info: jnp.ndarray
    edge_valid: jnp.ndarray
    fixed: jnp.ndarray


def depth_information(obs_cam: jnp.ndarray, fx: float, fy: float,
                      sigma_px: float = 1.0) -> jnp.ndarray:
    """Information matrix for a camera-frame 3D observation
    (Optimizer.cc:1216-1237): image-space covariance diag(s_px^2, s_px^2,
    s_z^2) with s_z = 0.00273 z^2 + 0.00074 z - 0.00058, pushed through the
    unprojection Jacobian J = [[z/fx,0,x/z],[0,z/fy,y/z],[0,0,1]]."""
    x, y, z = obs_cam[..., 0], obs_cam[..., 1], obs_cam[..., 2]
    sz = 0.00273 * z * z + 0.00074 * z - 0.00058
    sz = jnp.maximum(sz, 1e-5)
    zero = jnp.zeros_like(z)
    J = jnp.stack([
        jnp.stack([z / fx, zero, x / jnp.maximum(z, 1e-6)], -1),
        jnp.stack([zero, z / fy, y / jnp.maximum(z, 1e-6)], -1),
        jnp.stack([zero, zero, jnp.ones_like(z)], -1),
    ], -2)
    cov_img = jnp.zeros(obs_cam.shape[:-1] + (3, 3))
    cov_img = cov_img.at[..., 0, 0].set(sigma_px ** 2)
    cov_img = cov_img.at[..., 1, 1].set(sigma_px ** 2)
    cov_img = cov_img.at[..., 2, 2].set(sz * sz)
    cov_cam = J @ cov_img @ jnp.swapaxes(J, -1, -2)
    return jnp.linalg.inv(cov_cam + 1e-10 * jnp.eye(3))


def _residuals(prob: BAProblem):
    """e = obs - Tcw X  (Optimizer.h:51-57), J_cam wrt left-multiplied
    increment exp([v,w]) Tcw: de/dv = -I, de/dw = hat(p); J_lm = -Rcw."""
    T = prob.cams[prob.cam_idx]
    X = prob.points[prob.lm_idx]
    p = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    e = prob.obs - p
    J_cam = jnp.concatenate([
        -jnp.broadcast_to(jnp.eye(3), (e.shape[0], 3, 3)),
        lie.hat(p),
    ], axis=-1)  # (E,3,6)
    J_lm = -T[:, :3, :3]  # (E,3,3)
    return e, J_cam, J_lm, p


def _robust_weight(e: jnp.ndarray, info: jnp.ndarray, robust: bool):
    chi2 = jnp.einsum("ei,eij,ej->e", e, info, e)
    if not robust:
        return jnp.ones_like(chi2), chi2
    # Huber: w = 1 for chi2 <= d2 else delta/sqrt(chi2)
    d = jnp.sqrt(HUBER_DELTA2)
    w = jnp.where(chi2 <= HUBER_DELTA2, 1.0,
                  d / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    return w, chi2


def _gn_iteration(prob: BAProblem, robust: bool, damping: float = 1e-6):
    C = prob.cams.shape[0]
    L = prob.points.shape[0]
    e, J_cam, J_lm, p = _residuals(prob)
    w, chi2 = _robust_weight(e, prob.info, robust)
    w = w * prob.edge_valid
    Iw = prob.info * w[:, None, None]

    # per-edge blocks
    Hcc_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_cam)   # (E,6,6)
    Hll_e = jnp.einsum("eai,eab,ebj->eij", J_lm, Iw, J_lm)     # (E,3,3)
    W_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_lm)      # (E,6,3)
    bc_e = -jnp.einsum("eai,eab,eb->ei", J_cam, Iw, e)         # (E,6) gradient
    bl_e = -jnp.einsum("eai,eab,eb->ei", J_lm, Iw, e)          # (E,3)

    Hcc = jnp.zeros((C, 6, 6)).at[prob.cam_idx].add(Hcc_e)
    bc = jnp.zeros((C, 6)).at[prob.cam_idx].add(bc_e)
    Hll = jnp.zeros((L, 3, 3)).at[prob.lm_idx].add(Hll_e)
    bl = jnp.zeros((L, 3)).at[prob.lm_idx].add(bl_e)

    # landmark block inverses (batched 3x3)
    Hll_inv = jnp.linalg.inv(Hll + damping * jnp.eye(3) +
                             1e-12 * jnp.eye(3))

    # Schur: S = Hcc - sum_j W_aj Hll_j^-1 W_bj^T accumulated over camera
    # pairs of each landmark: per-edge Y_e = W_e Hll_inv[lm], then
    # S[a,b] -= sum_{edges e,f sharing lm} Y_e W_f^T.  Accumulate via a
    # (C,3L) dense W matrix — fine for local BA sizes; the distributed path
    # shards L.
    Y_e = jnp.einsum("eij,ejk->eik", W_e, Hll_inv[prob.lm_idx])  # (E,6,3)

    # build dense per-(cam,lm) aggregates
    Wmat = jnp.zeros((C, L, 6, 3)).at[prob.cam_idx, prob.lm_idx].add(W_e)
    Ymat = jnp.zeros((C, L, 6, 3)).at[prob.cam_idx, prob.lm_idx].add(Y_e)
    S = jnp.zeros((C, C, 6, 6))
    S = S.at[jnp.arange(C), jnp.arange(C)].set(Hcc)
    S = S - jnp.einsum("alik,bljk->abij", Ymat, Wmat)
    rhs = bc - jnp.einsum("alik,lk->ai", Ymat, bl)

    # gauge fixing: huge diagonal on fixed cameras
    gauge = jnp.where(prob.fixed[:, None], 1e12, 0.0)
    Sd = S.at[jnp.arange(C), jnp.arange(C)].add(
        (damping + gauge)[..., None] * jnp.eye(6)
    )

    Sm = Sd.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rv = rhs.reshape(6 * C)
    # diagonal preconditioning for f32
    dpre = jnp.sqrt(jnp.abs(jnp.diag(Sm)) + 1e-10)
    x = jnp.linalg.solve(Sm / dpre[:, None] / dpre[None, :], rv / dpre) / dpre
    dx_cam = x.reshape(C, 6)
    dx_cam = jnp.where(jnp.isfinite(dx_cam), dx_cam, 0.0)
    dx_cam = jnp.where(prob.fixed[:, None], 0.0, dx_cam)

    # landmark back-substitution: dX_j = Hll_j^-1 (bl_j - W^T dxc)
    WtDx = jnp.einsum("alik,ai->lk", Wmat, dx_cam)  # (L,3)
    dx_lm = jnp.einsum("lij,lj->li", Hll_inv, bl - WtDx)
    dx_lm = jnp.where(jnp.isfinite(dx_lm), dx_lm, 0.0)

    new_cams = jax.vmap(lambda xi, T: lie.se3_exp(xi) @ T)(dx_cam, prob.cams)
    new_points = prob.points + dx_lm
    total_chi2 = jnp.sum(chi2 * prob.edge_valid)
    return prob._replace(cams=new_cams, points=new_points), total_chi2


def optimize(prob: BAProblem, iters_robust: int = 5, iters_final: int = 10,
             chi2_outlier: float = HUBER_DELTA2):
    """The reference's two-phase protocol (Optimizer.cc:1258-1291):
    ``iters_robust`` Huber iterations, demote edges with chi2 > 7.815 or
    negative depth, then ``iters_final`` plain iterations."""

    def rb(i, carry):
        prob, chi = carry
        prob, chi = _gn_iteration(prob, robust=True)
        return prob, chi

    prob, chi = jax.lax.fori_loop(0, iters_robust, rb, (prob, jnp.float32(0)))

    # outlier demotion
    e, _, _, p = _residuals(prob)
    chi2 = jnp.einsum("ei,eij,ej->e", e, prob.info, e)
    good = (chi2 <= chi2_outlier) & (p[:, 2] > 0)
    prob = prob._replace(edge_valid=prob.edge_valid * good)

    def fin(i, carry):
        prob, chi = carry
        prob, chi = _gn_iteration(prob, robust=False)
        return prob, chi

    prob, chi = jax.lax.fori_loop(0, iters_final, fin, (prob, chi))
    return prob, chi


optimize_jit = jax.jit(optimize, static_argnames=("iters_robust", "iters_final"))
