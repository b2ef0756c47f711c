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
  - the reduced camera system S = Hcc - W Hll^-1 W^T is accumulated
    edge-wise: per-landmark camera-pair contributions Y_e W_f^T are
    scatter-added into (C,C,6,6) (``solver="dense"``, exact, O(E + P + C^2)
    memory where P = sum_l deg_l^2 — never the O(C*L) dense W of g2o's
    textbook form), and one dense solve updates all cameras;
  - for large C the solve is matrix-free: block-Jacobi-preconditioned CG on
    S where each matvec is two edge gathers + two segment sums
    (``solver="cg"``, O(E) memory, no C^2 tensor at all).
Landmarks back-substitute in batch either way.  This is also the unit that
distributes: shard landmarks over devices and psum the camera system
(parallel/dist_ba.py).

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
from . import reduce_plan as rp

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


class BAPairs(NamedTuple):
    """Edge-pair index lists for the exact dense-S build: for every landmark
    l and every ordered pair of edges (e, f) observing l, S[cam_e, cam_f]
    receives -Y_e W_f^T.  P = sum_l deg_l^2; built host-side once per
    problem (indices are optimisation-invariant — demoted edges zero out
    through their robust weight)."""

    e: jnp.ndarray  # (P,)
    f: jnp.ndarray  # (P,)


def build_pairs(cam_idx, lm_idx) -> BAPairs:
    """Host-side pair-list construction (vectorized NumPy, O(E log E) —
    reduce_plan.build_pairs_np; the old per-landmark Python loop cost
    ~0.35 s per call at P=262k)."""
    e, f = rp.build_pairs_np(lm_idx)
    return BAPairs(jnp.asarray(e.astype("int32")),
                   jnp.asarray(f.astype("int32")))


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


def _edge_blocks(prob: BAProblem, robust: bool, damping: float,
                 plans: rp.SchurPlans | None = None):
    """Per-edge Schur ingredients shared by both solvers.

    With ``plans`` the segment reductions run as deterministic gather-sums
    (reduce_plan.py) instead of colliding scatter-adds — fixed accumulation
    order on every backend (the TPU scatter-order ATE penalty, NOTES_R3)
    and vectorized on XLA CPU (where colliding scatters serialize)."""
    C = prob.cams.shape[0]
    L = prob.points.shape[0]
    e, J_cam, J_lm, p = _residuals(prob)
    w, chi2 = _robust_weight(e, prob.info, robust)
    w = w * prob.edge_valid
    Iw = prob.info * w[:, None, None]

    Hcc_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_cam)   # (E,6,6)
    Hll_e = jnp.einsum("eai,eab,ebj->eij", J_lm, Iw, J_lm)     # (E,3,3)
    W_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_lm)      # (E,6,3)
    bc_e = -jnp.einsum("eai,eab,eb->ei", J_cam, Iw, e)         # (E,6) gradient
    bl_e = -jnp.einsum("eai,eab,eb->ei", J_lm, Iw, e)          # (E,3)

    if plans is not None:
        Hcc = rp.apply_plan(plans.cam, Hcc_e, C)
        bc = rp.apply_plan(plans.cam, bc_e, C)
        Hll = rp.apply_plan(plans.lm, Hll_e, L)
        bl = rp.apply_plan(plans.lm, bl_e, L)
    else:
        Hcc = jnp.zeros((C, 6, 6)).at[prob.cam_idx].add(Hcc_e)
        bc = jnp.zeros((C, 6)).at[prob.cam_idx].add(bc_e)
        Hll = jnp.zeros((L, 3, 3)).at[prob.lm_idx].add(Hll_e)
        bl = jnp.zeros((L, 3)).at[prob.lm_idx].add(bl_e)

    # landmark block inverses (batched 3x3)
    Hll_inv = jnp.linalg.inv(Hll + damping * jnp.eye(3) + 1e-12 * jnp.eye(3))
    Y_e = jnp.einsum("eij,ejk->eik", W_e, Hll_inv[prob.lm_idx])  # (E,6,3)

    # reduced gradient: rhs_a = bc_a - sum_{e: cam=a} Y_e bl[lm_e]
    ybl = jnp.einsum("eik,ek->ei", Y_e, bl[prob.lm_idx])
    if plans is not None:
        rhs = bc - rp.apply_plan(plans.cam, ybl, C)
    else:
        rhs = bc - jnp.zeros((C, 6)).at[prob.cam_idx].add(ybl)
    total_chi2 = jnp.sum(chi2 * prob.edge_valid)
    return W_e, Y_e, Hcc, Hll_inv, bl, rhs, total_chi2


def _solve_dense(prob, pairs: BAPairs | None, W_e, Y_e, Hcc, rhs, damping,
                 plans: rp.SchurPlans | None = None):
    """Exact reduced camera system S[a,b] = Hcc δ_ab - Σ_{(e,f)} Y_e W_f^T.

    With ``plans``: per-cell batched matmuls over the bucketed pair tables
    (deterministic, MXU-shaped, no (P,6,6) intermediate).  Fallback: the
    explicit pair-list scatter (O(P·36) colliding scatter-add)."""
    C = prob.cams.shape[0]
    if plans is not None and plans.cell.tables:
        S = -rp.apply_cell_plan(plans.cell, Y_e, W_e, C)
    else:
        contrib = jnp.einsum("pik,pjk->pij", Y_e[pairs.e], W_e[pairs.f])
        S = jnp.zeros((C, C, 6, 6)).at[
            prob.cam_idx[pairs.e], prob.cam_idx[pairs.f]].add(-contrib)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)

    # gauge fixing: huge diagonal on fixed cameras
    gauge = jnp.where(prob.fixed[:, None], 1e12, 0.0)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        (damping + gauge)[..., None] * jnp.eye(6))

    Sm = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rv = rhs.reshape(6 * C)
    # diagonal preconditioning for f32
    dpre = jnp.sqrt(jnp.abs(jnp.diag(Sm)) + 1e-10)
    x = jnp.linalg.solve(Sm / dpre[:, None] / dpre[None, :], rv / dpre) / dpre
    return x.reshape(C, 6)


def _solve_cg(prob, W_e, Y_e, Hcc, rhs, damping, cg_iters, cg_tol=1e-8,
              plans: rp.SchurPlans | None = None):
    """Matrix-free block-Jacobi PCG on the reduced camera system.  A matvec
    is S x = Hcc x - Y (segsum_lm W^T x[cam]) gathered back — two edge
    gathers + one landmark segment sum + one camera scatter, O(E) memory.
    Fixed (gauge) cameras are projected out of the Krylov space."""
    C = prob.cams.shape[0]
    L = prob.points.shape[0]
    free = (~prob.fixed.astype(bool))[:, None]  # (C,1)

    # block-Jacobi preconditioner: diag blocks of S.  The e==f pair terms
    # give the exact diagonal when each camera observes a landmark at most
    # once (always true for keypoint edges); duplicate observations only
    # soften the preconditioner, never correctness.
    D = Hcc.at[prob.cam_idx].add(
        -jnp.einsum("eik,ejk->eij", Y_e, W_e))
    D = D + damping * jnp.eye(6)
    D = jnp.where(free[:, :, None], D, jnp.eye(6))
    Dinv = jnp.linalg.inv(D + 1e-10 * jnp.eye(6))

    def matvec(x):  # x (C,6)
        xm = jnp.where(free, x, 0.0)
        t = jnp.einsum("eki,ek->ei", W_e, xm[prob.cam_idx])   # W^T x, (E,3)
        if plans is not None:
            s = rp.apply_plan(plans.lm, t, L)
            v = rp.apply_plan(
                plans.cam, jnp.einsum("eik,ek->ei", Y_e, s[prob.lm_idx]), C)
        else:
            s = jnp.zeros((L, 3)).at[prob.lm_idx].add(t)
            v = jnp.zeros((C, 6)).at[prob.cam_idx].add(
                jnp.einsum("eik,ek->ei", Y_e, s[prob.lm_idx]))
        out = jnp.einsum("cij,cj->ci", Hcc, xm) - v + damping * xm
        return jnp.where(free, out, 0.0)

    b = jnp.where(free, rhs, 0.0)
    x0 = jnp.zeros_like(b)
    r0 = b  # x0 = 0
    z0 = jnp.einsum("cij,cj->ci", Dinv, r0)
    bs = jnp.sum(b * b)

    def cond(carry):
        i, x, r, z, p, rz = carry
        return (i < cg_iters) & (jnp.sum(r * r) > cg_tol * cg_tol * bs)

    def body(carry):
        i, x, r, z, p, rz = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("cij,cj->ci", Dinv, r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, z, p, rz_new

    _, x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, z0, z0, jnp.sum(r0 * z0)))
    return x


def _gn_iteration(prob: BAProblem, robust: bool, damping: float = 1e-6,
                  pairs: BAPairs | None = None, solver: str = "dense",
                  cg_iters: int = 100, plans: rp.SchurPlans | None = None):
    W_e, Y_e, Hcc, Hll_inv, bl, rhs, total_chi2 = _edge_blocks(
        prob, robust, damping, plans=plans)

    if solver == "dense":
        dx_cam = _solve_dense(prob, pairs, W_e, Y_e, Hcc, rhs, damping,
                              plans=plans)
    else:
        dx_cam = _solve_cg(prob, W_e, Y_e, Hcc, rhs, damping, cg_iters,
                           plans=plans)
    dx_cam = jnp.where(jnp.isfinite(dx_cam), dx_cam, 0.0)
    dx_cam = jnp.where(prob.fixed[:, None], 0.0, dx_cam)

    # landmark back-substitution: dX_j = Hll_j^-1 (bl_j - W^T dxc)
    L = prob.points.shape[0]
    wtdx_e = jnp.einsum("eki,ek->ei", W_e, dx_cam[prob.cam_idx])
    if plans is not None:
        WtDx = rp.apply_plan(plans.lm, wtdx_e, L)
    else:
        WtDx = jnp.zeros((L, 3)).at[prob.lm_idx].add(wtdx_e)
    dx_lm = jnp.einsum("lij,lj->li", Hll_inv, bl - WtDx)
    dx_lm = jnp.where(jnp.isfinite(dx_lm), dx_lm, 0.0)

    new_cams = jax.vmap(lambda xi, T: lie.se3_exp(xi) @ T)(dx_cam, prob.cams)
    new_points = prob.points + dx_lm
    return prob._replace(cams=new_cams, points=new_points), total_chi2


def _next_bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def pad_problem(prob: BAProblem, lo: int = 64,
                collapse_pad_lms: bool = False,
                min_edges: int = 0, min_lms: int = 0,
                min_cams: int = 0) -> BAProblem:
    """Pad edge/landmark/camera counts to power-of-two buckets so repeated
    BA calls reuse compiled executables (every raw shape is a fresh jit
    specialisation — ruinous through the serialized remote TPU compiler).
    Padding edges are invalid (zero weight) and each points at its own
    padding landmark, so Schur pair lists grow by O(E_pad), not O(E_pad²);
    padding cameras are gauge-fixed identities.

    ``collapse_pad_lms``: all padding edges share ONE padding landmark,
    keeping the landmark bucket at ~L instead of ~E.  Only safe with the
    reduction-plan path (plans exclude padding edges entirely); the legacy
    pair-list path would explode on the shared landmark's O(E_pad²) pairs."""
    E, L, C = prob.obs.shape[0], prob.points.shape[0], prob.cams.shape[0]
    # E+1: guarantee at least one invalid edge exists (pad_pairs aliases
    # padding pairs to it).  ``min_*`` pre-size the buckets: a growing run
    # otherwise recompiles the optimizer at every new power-of-2 bucket —
    # each a multi-minute stall on a busy 2-core host that starves the
    # async worker (r4 async run: only 11/21 keyframes inserted)
    Eb = _next_bucket(max(E + 1, min_edges), lo)
    Cb = _next_bucket(max(C, min_cams), 8)
    Lb = _next_bucket(max(L + (1 if collapse_pad_lms else Eb - E), min_lms),
                      lo)

    def pade(x, fill=0.0):
        pad = [(0, Eb - E)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    if collapse_pad_lms:
        pad_lms = jnp.full((Eb - E,), L, dtype=prob.lm_idx.dtype)
    else:
        pad_lms = L + jnp.arange(Eb - E, dtype=prob.lm_idx.dtype)
    return BAProblem(
        cams=jnp.concatenate(
            [prob.cams, jnp.broadcast_to(jnp.eye(4, dtype=prob.cams.dtype),
                                         (Cb - C, 4, 4))]),
        points=jnp.pad(prob.points, ((0, Lb - L), (0, 0))),
        obs=jnp.pad(prob.obs, ((0, Eb - E), (0, 0)),
                    constant_values=1.0),   # z=1: demotion's p_z>0 untouched
        cam_idx=pade(prob.cam_idx),
        lm_idx=jnp.concatenate([prob.lm_idx, pad_lms]),
        info=jnp.pad(prob.info, ((0, Eb - E), (0, 0), (0, 0))),
        edge_valid=pade(prob.edge_valid),
        fixed=jnp.pad(prob.fixed, (0, Cb - C), constant_values=True),
    )


def pad_pairs(pairs: BAPairs, invalid_edge: int, lo: int = 256) -> BAPairs:
    """Pad a pair list to a power-of-two bucket; padding pairs alias an
    INVALID edge (zero robust weight -> zero Schur contribution)."""
    P = pairs.e.shape[0]
    Pb = _next_bucket(P, lo)
    fill = jnp.full((Pb - P,), invalid_edge, pairs.e.dtype)
    return BAPairs(jnp.concatenate([pairs.e, fill]),
                   jnp.concatenate([pairs.f, fill]))


# above this camera count the dense (C,C,6,6) build + O((6C)^3) solve is
# replaced by matrix-free PCG (VERDICT r1 item 4: global BA at 300 KFs must
# run in bounded memory)
DENSE_SOLVER_MAX_CAMS = 96


def build_plans(prob: BAProblem, solver: str = "dense",
                n_real: int | None = None,
                shape_cache: dict | None = None) -> rp.SchurPlans:
    """Host-side reduction-plan build for a concrete problem (pass the
    PADDED problem so plan shapes ride the same buckets; ``n_real`` = the
    pre-padding edge count so zero-weight padding edges never enter a
    gather table).

    ``shape_cache``: caller-owned dict carried across calls — pads every
    plan table to session-sticky shapes (rp.pad_plan_sticky) so the jitted
    optimizer is NOT respecialized per call as the degree distribution
    drifts (without it a growing keyframe run recompiled local BA every
    single keyframe, ~3.5-4.4 s each on 2 host cores)."""
    C, L, E = prob.cams.shape[0], prob.points.shape[0], prob.obs.shape[0]
    plans = rp.build_schur_plans(prob.cam_idx, prob.lm_idx, C, L,
                                 with_cell=(solver == "dense"),
                                 n_real=n_real)
    if shape_cache is not None:
        plans = rp.SchurPlans(
            cam=rp.pad_plan_sticky(plans.cam,
                                   shape_cache.setdefault("cam", {}), C, E,
                                   full_width=True),
            lm=rp.pad_plan_sticky(plans.lm,
                                  shape_cache.setdefault("lm", {}), L, E,
                                  full_width=True),
            cell=(rp.pad_cell_plan_sticky(
                plans.cell, shape_cache.setdefault("cell", {}), C * C,
                E) if plans.cell.tables or shape_cache.get("cell")
                else plans.cell),
        )
    return plans


def optimize(prob: BAProblem, iters_robust: int = 5, iters_final: int = 10,
             chi2_outlier: float = HUBER_DELTA2, solver: str = "auto",
             pairs: BAPairs | None = None, cg_iters: int = 200,
             plans: rp.SchurPlans | None = None):
    """(All matmuls/einsums trace at float32 precision — the TPU default
    decomposes f32 contractions into bf16 passes, which costs millimetres
    in the Schur Hessians: the on-chip 211-frame run measured ATE 31 mm vs
    the CPU backend's 14 mm before this pin; g2o is full f64.)

    The reference's two-phase protocol (Optimizer.cc:1258-1291):
    ``iters_robust`` Huber iterations, demote edges with chi2 > 7.815 or
    negative depth, then ``iters_final`` plain iterations.

    ``solver="auto"`` picks the exact dense Schur solve for small camera
    counts and block-Jacobi PCG above ``DENSE_SOLVER_MAX_CAMS``.

    ``plans`` (reduce_plan.build_schur_plans / ba.build_plans): precomputed
    deterministic gather-sum reduction plans — the default when the index
    arrays are concrete.  Without plans the legacy colliding-scatter path
    runs (the only option when index arrays are tracers and no plans were
    prebuilt; its TPU accumulation order costs accuracy, NOTES_R3)."""
    if solver == "auto":
        solver = ("dense" if prob.cams.shape[0] <= DENSE_SOLVER_MAX_CAMS
                  else "cg")
    if plans is None and pairs is None:
        if not isinstance(prob.cam_idx, jax.core.Tracer):
            plans = build_plans(prob, solver)
        elif solver == "dense":
            raise ValueError("dense BA solver under jit needs precomputed "
                             "plans=ba.build_plans(prob) (or legacy pairs)")

    with jax.default_matmul_precision("float32"):
        return _optimize_body(prob, iters_robust, iters_final, chi2_outlier,
                              solver, pairs, cg_iters, plans)


def _optimize_body(prob, iters_robust, iters_final, chi2_outlier, solver,
                   pairs, cg_iters, plans=None):

    def rb(i, carry):
        prob, chi = carry
        prob, chi = _gn_iteration(prob, robust=True, pairs=pairs,
                                  solver=solver, cg_iters=cg_iters,
                                  plans=plans)
        return prob, chi

    prob, chi = jax.lax.fori_loop(0, iters_robust, rb, (prob, jnp.float32(0)))

    # outlier demotion
    e, _, _, p = _residuals(prob)
    chi2 = jnp.einsum("ei,eij,ej->e", e, prob.info, e)
    good = (chi2 <= chi2_outlier) & (p[:, 2] > 0)
    prob = prob._replace(edge_valid=prob.edge_valid * good)

    def fin(i, carry):
        prob, chi = carry
        prob, chi = _gn_iteration(prob, robust=False, pairs=pairs,
                                  solver=solver, cg_iters=cg_iters,
                                  plans=plans)
        return prob, chi

    prob, chi = jax.lax.fori_loop(0, iters_final, fin, (prob, chi))
    return prob, chi


optimize_jit = jax.jit(optimize, static_argnames=(
    "iters_robust", "iters_final", "solver", "cg_iters"))
