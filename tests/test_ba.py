"""Bundle-adjustment golden tests: synthetic camera/landmark problems with
known ground truth (validates the Schur-complement GN against the semantics
of Optimizer::LocalBundleAdjustment3D)."""

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.backend import ba
from hrbffusion3d_tpu.core import lie


def _make_problem(key, n_cams=6, n_lms=60, noise=0.0, perturb=0.05,
                  fix_first_two=True):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # cameras along a small arc, all near origin looking +z
    gt_cams = []
    for i in range(n_cams):
        xi = jnp.array([0.1 * i, 0.02 * i, 0.0, 0.0, 0.05 * i, 0.0])
        gt_cams.append(lie.se3_exp(xi))  # Twc-ish; use as Tcw directly (GT arbitrary)
    gt_cams = jnp.stack(gt_cams)
    gt_points = jax.random.uniform(
        k1, (n_lms, 3), minval=jnp.array([-1.5, -1.0, 1.5]),
        maxval=jnp.array([1.5, 1.0, 3.5])
    )
    # every camera observes every landmark
    cam_idx = jnp.repeat(jnp.arange(n_cams), n_lms)
    lm_idx = jnp.tile(jnp.arange(n_lms), n_cams)
    T = gt_cams[cam_idx]
    obs = jnp.einsum("eij,ej->ei", T[:, :3, :3], gt_points[lm_idx]) + T[:, :3, 3]
    obs = obs + noise * jax.random.normal(k2, obs.shape)
    info = ba.depth_information(obs, fx=500.0, fy=500.0)

    # perturb initial estimates (keep fixed cameras exact)
    dx = perturb * jax.random.normal(k3, (n_cams, 6))
    fixed = jnp.zeros((n_cams,), bool).at[0].set(True)
    if fix_first_two:
        fixed = fixed.at[1].set(True)
    dx = jnp.where(fixed[:, None], 0.0, dx)
    cams0 = jax.vmap(lambda x, t: lie.se3_exp(x) @ t)(dx, gt_cams)
    points0 = gt_points + perturb * jax.random.normal(k4, (n_lms, 3))

    prob = ba.BAProblem(
        cams=cams0, points=points0, obs=obs, cam_idx=cam_idx, lm_idx=lm_idx,
        info=info, edge_valid=jnp.ones((obs.shape[0],)), fixed=fixed,
    )
    return prob, gt_cams, gt_points


def _cam_err(cams, gt):
    errs = []
    for i in range(cams.shape[0]):
        e = np.asarray(lie.se3_log(jnp.linalg.inv(gt[i]) @ cams[i]))
        errs.append(np.linalg.norm(e))
    return np.max(errs)


def test_ba_recovers_exact():
    prob, gt_cams, gt_points = _make_problem(jax.random.PRNGKey(0))
    assert _cam_err(prob.cams, gt_cams) > 0.01  # perturbed start
    out, chi = ba.optimize(prob, iters_robust=5, iters_final=10)
    assert _cam_err(out.cams, gt_cams) < 1e-3
    assert float(jnp.abs(out.points - gt_points).max()) < 1e-3


def test_ba_noisy_converges():
    prob, gt_cams, gt_points = _make_problem(jax.random.PRNGKey(1), noise=0.005)
    out, chi = ba.optimize(prob)
    assert _cam_err(out.cams, gt_cams) < 0.01


def test_ba_outlier_rejection():
    """A few wildly-wrong observations must be demoted, not corrupt poses."""
    prob, gt_cams, gt_points = _make_problem(jax.random.PRNGKey(2), noise=0.002)
    obs = prob.obs.at[::37].add(jnp.array([1.0, -2.0, 1.5]))
    prob = prob._replace(obs=obs)
    out, chi = ba.optimize(prob)
    assert _cam_err(out.cams, gt_cams) < 0.02
    # demoted edges
    assert float(jnp.sum(out.edge_valid)) < prob.obs.shape[0]


def test_ba_respects_fixed_cameras():
    prob, gt_cams, _ = _make_problem(jax.random.PRNGKey(3), noise=0.001)
    out, _ = ba.optimize(prob)
    np.testing.assert_allclose(out.cams[0], prob.cams[0], atol=1e-6)
    np.testing.assert_allclose(out.cams[1], prob.cams[1], atol=1e-6)


def test_ba_masked_edges_ignored():
    prob, gt_cams, _ = _make_problem(jax.random.PRNGKey(4))
    # corrupt half the observations but mask them out
    obs = prob.obs.at[::2].add(100.0)
    valid = jnp.ones((prob.obs.shape[0],)).at[::2].set(0.0)
    prob = prob._replace(obs=obs, edge_valid=valid)
    out, _ = ba.optimize(prob)
    assert _cam_err(out.cams, gt_cams) < 5e-3


def test_depth_information_sane():
    obs = jnp.array([[0.2, -0.1, 1.0], [0.5, 0.3, 3.0]])
    info = ba.depth_information(obs, 500.0, 500.0)
    # symmetric positive definite; far points less certain in z
    scale = float(jnp.abs(info).max())
    np.testing.assert_allclose(
        info, jnp.swapaxes(info, -1, -2), atol=1e-5 * scale
    )
    assert float(info[0, 2, 2]) > float(info[1, 2, 2])
    evs = np.linalg.eigvalsh(np.asarray(info))
    assert (evs > 0).all()
