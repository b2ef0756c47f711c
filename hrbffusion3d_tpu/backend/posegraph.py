"""Pose-graph / essential-graph optimization over SE(3).

TPU-native replacement for ``Optimizer::OptimizeEssentialGraph``
(``Core/src/ORB_SLAM2_m/src/Optimizer.cc:1352-1619``, g2o Sim3 with fixed
scale s=1 for RGB-D — ``LoopClosing.cc:74``): batched Gauss-Newton over
relative-pose edges

    e_ij = log( Z_ij^-1 T_i^-1 T_j )            (6-vector, [v|w])

with analytic SE(3) Jacobians (right-perturbation convention
``T' = T exp(xi)``): de/dxi_j = Jr^-1(e) ~ I, de/dxi_i = -Ad(T_j^-1 T_i).
The dense (K,6,K,6) system is tiny for keyframe counts in the hundreds and
solves on-device in one shot — g2o's sparse LM machinery is unnecessary.
Poses here are world<-keyframe (Twc); callers convert from/to Tcw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class PoseGraph(NamedTuple):
    poses: jnp.ndarray     # (K,4,4) Twc
    edge_i: jnp.ndarray    # (E,) int32
    edge_j: jnp.ndarray    # (E,)
    meas: jnp.ndarray      # (E,4,4) Z_ij = measured T_i^-1 T_j
    info: jnp.ndarray      # (E,6,6) information (often w * I)
    edge_valid: jnp.ndarray  # (E,)
    fixed: jnp.ndarray     # (K,) bool


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for the [v|w] tangent ordering: (…,6,6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    top = jnp.concatenate([R, lie.hat(t) @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _linearize(g: PoseGraph):
    """Per-edge residuals and Jacobians: e (E,6), Ji/Jj (E,6,6), Iw (E,6,6)."""
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]
    rel = jnp.linalg.inv(Ti) @ Tj
    err_T = jnp.linalg.inv(g.meas) @ rel
    e = jax.vmap(lie.se3_log)(err_T)                        # (E,6)
    Jj = jnp.broadcast_to(jnp.eye(6), (e.shape[0], 6, 6))   # ~ Jr^-1(e)
    Ji = -adjoint(jnp.linalg.inv(rel))                      # de/dxi_i
    Iw = g.info * g.edge_valid[:, None, None]
    return e, Ji, Jj, Iw


def _solve_dense(g: PoseGraph, e, Ji, Jj, Iw, damping: float):
    K = g.poses.shape[0]
    H = jnp.zeros((K, K, 6, 6))
    b = jnp.zeros((K, 6))

    Hii = jnp.einsum("eai,eab,ebj->eij", Ji, Iw, Ji)
    Hjj = jnp.einsum("eai,eab,ebj->eij", Jj, Iw, Jj)
    Hij = jnp.einsum("eai,eab,ebj->eij", Ji, Iw, Jj)
    bi = -jnp.einsum("eai,eab,eb->ei", Ji, Iw, e)
    bj = -jnp.einsum("eai,eab,eb->ei", Jj, Iw, e)

    H = H.at[g.edge_i, g.edge_i].add(Hii)
    H = H.at[g.edge_j, g.edge_j].add(Hjj)
    H = H.at[g.edge_i, g.edge_j].add(Hij)
    H = H.at[g.edge_j, g.edge_i].add(jnp.swapaxes(Hij, -1, -2))
    b = b.at[g.edge_i].add(bi).at[g.edge_j].add(bj)

    gauge = jnp.where(g.fixed[:, None], 1e12, 0.0)
    H = H.at[jnp.arange(K), jnp.arange(K)].add(
        (damping + gauge)[..., None] * jnp.eye(6)
    )

    Hm = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    bv = b.reshape(6 * K)
    d = jnp.sqrt(jnp.abs(jnp.diag(Hm)) + 1e-10)
    x = jnp.linalg.solve(Hm / d[:, None] / d[None, :], bv / d) / d
    return x.reshape(K, 6)


def _solve_pcg(g: PoseGraph, e, Ji, Jj, Iw, damping: float, cg_iters: int):
    """Matrix-free block-Jacobi PCG (VERDICT r2 next-7): never materialises
    the (6K,6K) Hessian — each matvec is two edge gathers + two segment
    scatters, O(E) memory, so thousands of keyframes fit where the dense
    path walls at a few hundred (the same structure as backend/ba.py's
    reduced-camera CG)."""
    K = g.poses.shape[0]
    gauge = damping + jnp.where(g.fixed, 1e12, 0.0)         # (K,)

    # rhs b = -J^T W e  and block-diagonal preconditioner
    bi = -jnp.einsum("eai,eab,eb->ei", Ji, Iw, e)
    bj = -jnp.einsum("eai,eab,eb->ei", Jj, Iw, e)
    b = (jnp.zeros((K, 6)).at[g.edge_i].add(bi).at[g.edge_j].add(bj))

    Hii = jnp.einsum("eai,eab,ebj->eij", Ji, Iw, Ji)
    Hjj = jnp.einsum("eai,eab,ebj->eij", Jj, Iw, Jj)
    Dk = (jnp.zeros((K, 6, 6)).at[g.edge_i].add(Hii)
          .at[g.edge_j].add(Hjj))
    Dk = Dk + gauge[:, None, None] * jnp.eye(6)
    Minv = jnp.linalg.inv(
        Dk + 1e-8 * jnp.eye(6))                             # (K,6,6)

    def matvec(x):                                          # x (K,6)
        u = (jnp.einsum("eij,ej->ei", Ji, x[g.edge_i])
             + jnp.einsum("eij,ej->ei", Jj, x[g.edge_j]))
        v = jnp.einsum("eij,ej->ei", Iw, u)
        y = (jnp.zeros((K, 6))
             .at[g.edge_i].add(jnp.einsum("eji,ej->ei", Ji, v))
             .at[g.edge_j].add(jnp.einsum("eji,ej->ei", Jj, v)))
        return y + gauge[:, None] * x

    x0 = jnp.zeros((K, 6))
    r0 = b
    z0 = jnp.einsum("kij,kj->ki", Minv, r0)
    p0 = z0

    def body(_, carry):
        x, r, z, p = carry
        Ap = matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r2 = r - alpha * Ap
        z2 = jnp.einsum("kij,kj->ki", Minv, r2)
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-30)
        return x, r2, z2, z2 + beta * p

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x0, r0, z0, p0))
    return x


def _iteration(g: PoseGraph, damping: float, use_cg: bool, cg_iters: int):
    e, Ji, Jj, Iw = _linearize(g)
    if use_cg:
        dx = _solve_pcg(g, e, Ji, Jj, Iw, damping, cg_iters)
    else:
        dx = _solve_dense(g, e, Ji, Jj, Iw, damping)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    dx = jnp.where(g.fixed[:, None], 0.0, dx)

    new_poses = jax.vmap(lambda T, xi: T @ lie.se3_exp(xi))(g.poses, dx)
    chi2 = jnp.sum(jnp.einsum("ei,eij,ej->e", e, Iw, e))
    return g._replace(poses=new_poses), chi2


# above this keyframe count the dense (6K,6K) assembly+solve switches to
# matrix-free block-Jacobi PCG (dense K=2000 would be a 576 MB Hessian)
CG_KEYFRAME_THRESHOLD = 384


def optimize(g: PoseGraph, iterations: int = 20, damping: float = 1e-6,
             cg_iters: int = 150):
    """GN iterations (the reference runs g2o LM for 20 iterations,
    Optimizer.cc:1613).  Dense solve up to CG_KEYFRAME_THRESHOLD keyframes,
    matrix-free PCG beyond (equivalence asserted in tests/test_posegraph.py).
    """
    use_cg = g.poses.shape[0] > CG_KEYFRAME_THRESHOLD

    def body(_, carry):
        g, _ = carry
        return _iteration(g, damping, use_cg, cg_iters)

    # f32-precision contractions (the TPU default's bf16 passes cost mm
    # in the Hessian — same pin as backend/ba.py; g2o is full f64)
    with jax.default_matmul_precision("float32"):
        return jax.lax.fori_loop(0, iterations, body, (g, jnp.float32(0)))


optimize_jit = jax.jit(optimize, static_argnames=("iterations", "cg_iters"))
