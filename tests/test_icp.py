"""Direct ops/icp.py unit tests (the odometry-level coverage lives in
test_odometry.py)."""

import jax.numpy as jnp
import numpy as np


def test_solve_system_matches_f64_reference():
    """The unrolled LDL^T path must match a float64 reference solve of the
    same damped, preconditioned system on realistic GN normal equations."""
    from hrbffusion3d_tpu.ops import icp as _icp

    rng = np.random.default_rng(3)
    for _ in range(20):
        J = rng.normal(size=(50, 6)).astype(np.float64)
        w = rng.uniform(0.1, 10.0, 50)
        A64 = (J.T * w) @ J
        b64 = (J.T * w) @ rng.normal(size=50)
        d = np.sqrt(np.abs(np.diag(A64)))
        As = A64 / d[:, None] / d[None, :] + 1e-6 * np.eye(6)
        x64 = np.linalg.solve(As, b64 / d) / d
        x = np.asarray(_icp.solve_system(
            jnp.asarray(A64, jnp.float32), jnp.asarray(b64, jnp.float32)))
        np.testing.assert_allclose(x, x64, rtol=2e-3, atol=2e-3)


def test_solve_system_singular_returns_zero():
    from hrbffusion3d_tpu.ops import icp as _icp

    A = jnp.zeros((6, 6))
    b = jnp.ones((6,))
    x = np.asarray(_icp.solve_system(A, b))
    assert np.isfinite(x).all()
