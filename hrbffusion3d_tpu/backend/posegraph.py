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


def _iteration(g: PoseGraph, damping: float):
    K = g.poses.shape[0]
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]
    rel = jnp.linalg.inv(Ti) @ Tj
    err_T = jnp.linalg.inv(g.meas) @ rel
    e = jax.vmap(lie.se3_log)(err_T)                       # (E,6)

    Jj = jnp.broadcast_to(jnp.eye(6), (e.shape[0], 6, 6))   # ~ Jr^-1(e)
    Ji = -adjoint(jnp.linalg.inv(rel))                      # de/dxi_i

    w = g.edge_valid
    Iw = g.info * w[:, None, None]

    # assemble dense H (K,6,K,6), b (K,6)
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
    dx = x.reshape(K, 6)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    dx = jnp.where(g.fixed[:, None], 0.0, dx)

    new_poses = jax.vmap(lambda T, xi: T @ lie.se3_exp(xi))(g.poses, dx)
    chi2 = jnp.sum(jnp.einsum("ei,eij,ej->e", e, Iw, e))
    return g._replace(poses=new_poses), chi2


def optimize(g: PoseGraph, iterations: int = 20, damping: float = 1e-6):
    """GN iterations (the reference runs g2o LM for 20 iterations,
    Optimizer.cc:1613)."""

    def body(_, carry):
        g, _ = carry
        return _iteration(g, damping)

    return jax.lax.fori_loop(0, iterations, body, (g, jnp.float32(0)))


optimize_jit = jax.jit(optimize, static_argnames=("iterations",))
