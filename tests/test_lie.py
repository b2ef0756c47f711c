import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.core import lie


def rand_xi(key, scale=1.0):
    return jax.random.normal(key, (6,)) * scale


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    for i in range(10):
        w = jax.random.normal(jax.random.fold_in(key, i), (3,)) * (0.01 + 0.3 * i)
        R = lie.so3_exp(w)
        # R is a rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        w2 = lie.so3_log(R)
        # log returns the wrapped-equivalent axis-angle; compare as rotations
        np.testing.assert_allclose(lie.so3_exp(w2), R, atol=1e-4)
        if float(jnp.linalg.norm(w)) < 3.0:  # inside the principal branch
            np.testing.assert_allclose(w, w2, atol=1e-4)


def test_so3_exp_small_angle():
    w = jnp.array([1e-9, -1e-9, 1e-9])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    for i in range(10):
        xi = rand_xi(jax.random.fold_in(key, i), 0.05 + 0.2 * i)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        # compare as transforms (rotation part may wrap beyond pi)
        np.testing.assert_allclose(lie.se3_exp(xi2), T, atol=5e-4)
        if float(jnp.linalg.norm(xi[3:])) < 3.0:
            np.testing.assert_allclose(xi, xi2, atol=2e-4)


def test_se3_inverse():
    xi = jnp.array([0.1, -0.2, 0.3, 0.05, -0.02, 0.1])
    T = lie.se3_exp(xi)
    np.testing.assert_allclose(T @ lie.se3_inverse(T), np.eye(4), atol=1e-5)


def test_se3_exp_matches_matrix_expm():
    from scipy.linalg import expm

    xi = np.array([0.2, -0.1, 0.05, 0.3, 0.2, -0.25], np.float64)
    M = np.zeros((4, 4))
    M[:3, :3] = np.array(
        [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]], [-xi[4], xi[3], 0]]
    )
    M[:3, 3] = xi[:3]
    np.testing.assert_allclose(lie.se3_exp(jnp.array(xi, jnp.float32)), expm(M), atol=1e-5)


def test_transform_points_batched():
    xi = jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, jnp.pi / 2])
    T = lie.se3_exp(xi)
    pts = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = lie.transform_points(T, pts)
    assert out.shape == (2, 3)


def test_orthonormalise():
    R = lie.so3_exp(jnp.array([0.3, 0.2, -0.1])) + 1e-3
    Rn = lie.orthonormalise(R)
    np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
