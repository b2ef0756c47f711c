"""SO(3)/SE(3) Lie-group operations, fully jittable and batched.

TPU-native replacement for the reference's Eigen/Sophus-style pose handling
(``Core/src/Utils/OdometryProvider.h`` — ``rodrigues`` and
``computeUpdateSE3`` — and g2o's SE3Quat).  Everything is pure ``jnp`` and
works under ``vmap``/``scan``; poses are represented as (R, t) pairs or as
4x4 homogeneous matrices.

Conventions: a pose T = [R|t] maps camera-frame points to world frame,
``x_w = R @ x_c + t`` (same as the reference's ``currPose``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (…,3) -> (…,3,3) skew-symmetric matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, (…,3) -> (…,3,3).

    Matches ``OdometryProvider::rodrigues`` (reference
    ``Core/src/Utils/OdometryProvider.h``); numerically safe at theta→0 via
    Taylor expansion of sin/cos coefficients.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # a = sin(t)/t, b = (1-cos(t))/t^2 with series fallbacks.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of Rodrigues: (…,3,3) -> (…,3)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    scale = jnp.where(
        jnp.abs(sin_t) < 1e-6,
        0.5 + theta * theta / 12.0,           # series of theta/(2 sin theta)
        theta / (2.0 * sin_t + _EPS),
    )
    return v * scale[..., None]


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential. xi = (…,6) as [v | w] (translation first, matching
    the reference solve order where x[0:3]=translation, x[3:6]=rotation —
    ``reduce.cu:503-507`` builds rows as [n, s×n]).  Returns (…,4,4)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * W2
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(…,4,4) -> (…,6) as [v | w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    half = 0.5 * theta
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - (theta * jnp.cos(half)) / (2.0 * jnp.sin(half) + _EPS)) / (theta2 + _EPS),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(…,3,3),(…,3) -> (…,4,4)."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def mat_to_rt(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (…,4,4) to points (…,3) (broadcasting over leading dims)."""
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], pts) + T[..., :3, 3]


def rotate_vectors(T: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", T[..., :3, :3], vecs)


def orthonormalise(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation onto SO(3) via SVD (drift control after many
    incremental updates; replaces Eigen's implicit renormalisation)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    fix = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (u * fix[..., None, :]) @ vt


def compute_update_se3(result_rt: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One GN update of the accumulated odometry transform.

    Mirrors ``OdometryProvider::computeUpdateSE3``: x=[v|w] from the 6x6
    solve; the incremental transform is exp(x) and composes on the left of
    the running estimate: ``resultRt = exp(x) * resultRt``.
    """
    return se3_exp(x) @ result_rt
