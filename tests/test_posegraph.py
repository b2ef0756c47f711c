"""Pose-graph optimization tests: loop-closure correction of accumulated
drift (the OptimizeEssentialGraph scenario)."""

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.backend import posegraph as pg
from hrbffusion3d_tpu.core import lie


def _chain_problem(key, n=12, drift=0.02, loop=True):
    """Ground truth: poses around a circle.  Odometry edges measured exactly;
    initial estimates integrate drifty odometry; one exact loop edge."""
    gt = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        xi = jnp.array([0.5 * np.cos(ang), 0.5 * np.sin(ang), 0.0,
                        0.0, 0.0, ang])
        gt.append(lie.se3_exp(xi))
    gt = jnp.stack(gt)

    edges_i, edges_j, meas = [], [], []
    for i in range(n - 1):
        edges_i.append(i)
        edges_j.append(i + 1)
        meas.append(jnp.linalg.inv(gt[i]) @ gt[i + 1])
    if loop:
        edges_i.append(n - 1)
        edges_j.append(0)
        meas.append(jnp.linalg.inv(gt[n - 1]) @ gt[0])

    # drifty initial guess: integrate odometry with per-step error
    keys = jax.random.split(key, n)
    est = [gt[0]]
    for i in range(n - 1):
        noise = lie.se3_exp(drift * jax.random.normal(keys[i], (6,)))
        est.append(est[-1] @ meas[i] @ noise)
    est = jnp.stack(est)

    E = len(edges_i)
    g = pg.PoseGraph(
        poses=est,
        edge_i=jnp.array(edges_i, jnp.int32),
        edge_j=jnp.array(edges_j, jnp.int32),
        meas=jnp.stack(meas),
        info=jnp.tile(jnp.eye(6)[None], (E, 1, 1)),
        edge_valid=jnp.ones((E,)),
        fixed=jnp.zeros((n,), bool).at[0].set(True),
    )
    return g, gt


def _max_err(poses, gt):
    errs = []
    for i in range(poses.shape[0]):
        errs.append(float(jnp.linalg.norm(lie.se3_log(jnp.linalg.inv(gt[i]) @ poses[i]))))
    return max(errs)


def test_posegraph_closes_loop():
    g, gt = _chain_problem(jax.random.PRNGKey(0))
    before = _max_err(g.poses, gt)
    out, chi = pg.optimize(g, iterations=25)
    after = _max_err(out.poses, gt)
    assert before > 0.02
    assert after < 1e-3, (before, after)


def test_posegraph_no_loop_keeps_consistency():
    """Without a loop edge the chain just reproduces the odometry exactly
    (measurements are consistent -> chi2 -> 0)."""
    g, gt = _chain_problem(jax.random.PRNGKey(1), loop=False)
    out, chi = pg.optimize(g, iterations=25)
    # all odometry edges satisfied
    Ti = out.poses[g.edge_i]
    Tj = out.poses[g.edge_j]
    rel = jnp.linalg.inv(Ti) @ Tj
    res = jax.vmap(lie.se3_log)(jnp.linalg.inv(g.meas) @ rel)
    assert float(jnp.abs(res).max()) < 1e-4


def test_posegraph_fixed_pose_untouched():
    g, gt = _chain_problem(jax.random.PRNGKey(2))
    out, _ = pg.optimize(g, iterations=10)
    np.testing.assert_allclose(out.poses[0], g.poses[0], atol=1e-6)


def test_adjoint_identity():
    T = lie.se3_exp(jnp.array([0.3, -0.2, 0.5, 0.1, 0.2, -0.3]))
    xi = jnp.array([0.01, 0.02, -0.01, 0.005, -0.01, 0.02])
    # Ad property: T exp(xi) T^-1 == exp(Ad(T) xi)
    lhs = T @ lie.se3_exp(xi) @ jnp.linalg.inv(T)
    rhs = lie.se3_exp(pg.adjoint(T) @ xi)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_cg_matches_dense_small_graph():
    """The matrix-free PCG path must reproduce the dense solve (same GN
    trajectory) on a graph small enough to run both."""
    g, gt = _chain_problem(jax.random.PRNGKey(3), n=16)
    e, Ji, Jj, Iw = pg._linearize(g)
    dx_dense = pg._solve_dense(g, e, Ji, Jj, Iw, 1e-6)
    dx_cg = pg._solve_pcg(g, e, Ji, Jj, Iw, 1e-6, cg_iters=200)
    dx_dense = jnp.where(g.fixed[:, None], 0.0, dx_dense)
    dx_cg = jnp.where(g.fixed[:, None], 0.0, dx_cg)
    assert float(jnp.max(jnp.abs(dx_dense - dx_cg))) < 1e-4


def test_large_posegraph_cg_converges():
    """2k-keyframe ring with odometry + sparse loop edges optimises through
    the CG path in seconds and closes the drift (VERDICT r2 next-7)."""
    import time

    n = 2000
    ang = 2 * np.pi * np.arange(n) / n
    gt = []
    for i in range(n):
        xi = jnp.array([3.0 * np.cos(ang[i]), 3.0 * np.sin(ang[i]), 0.0,
                        0.0, 0.0, ang[i]])
        gt.append(lie.se3_exp(xi))
    gt = jnp.stack(gt)

    rng = np.random.default_rng(0)
    ei = list(range(n - 1))
    ej = list(range(1, n))
    meas = [jnp.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]
    # loop edges every 100 kfs across the ring
    for k in range(100, n, 100):
        j = (k + n // 2) % n
        i2, j2 = min(k, j), max(k, j)
        ei.append(i2)
        ej.append(j2)
        meas.append(jnp.linalg.inv(gt[i2]) @ gt[j2])

    # drifty init
    est = [np.asarray(gt[0])]
    for i in range(n - 1):
        noise = lie.se3_exp(jnp.asarray(
            0.004 * rng.standard_normal(6), jnp.float32))
        est.append(est[-1] @ np.asarray(meas[i] @ noise))
    est = jnp.asarray(np.stack(est), jnp.float32)

    E = len(ei)
    g = pg.PoseGraph(
        poses=est,
        edge_i=jnp.array(ei, jnp.int32), edge_j=jnp.array(ej, jnp.int32),
        meas=jnp.stack(meas),
        info=jnp.tile(jnp.eye(6)[None], (E, 1, 1)),
        edge_valid=jnp.ones((E,)),
        fixed=jnp.zeros((n,), bool).at[0].set(True),
    )
    err0 = _max_err(est, gt)
    t0 = time.perf_counter()
    # chain-dominated graphs need the information to propagate end-to-end:
    # ~K/cg_iters GN iterations (measured: 30x300 -> 0.06, 40x600 -> 2e-5)
    g2, _ = pg.optimize_jit(g, iterations=30, cg_iters=300)
    g2.poses.block_until_ready()
    dt = time.perf_counter() - t0
    err1 = _max_err(g2.poses, gt)
    assert err1 < 0.1 * err0, (err0, err1)
    assert dt < 120.0, dt
