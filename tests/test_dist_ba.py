"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver (SURVEY §4 fake-mesh protocol)."""

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.backend import ba
from hrbffusion3d_tpu.parallel import dist_ba, sharding
from tests.test_ba import _cam_err, _make_problem


def test_partition_preserves_edges():
    prob, _, _ = _make_problem(jax.random.PRNGKey(0), n_cams=4, n_lms=16)
    sb = dist_ba.partition_problem(prob, 8)
    assert float(jnp.sum(sb.edge_valid)) == float(jnp.sum(prob.edge_valid))
    # every original edge appears exactly once with consistent data
    tot = sb.obs.reshape(-1, 3)
    ev = sb.edge_valid.reshape(-1) > 0
    assert np.allclose(np.sort(np.asarray(tot[ev])[:, 2]),
                       np.sort(np.asarray(prob.obs)[:, 2]), atol=1e-6)


def test_distributed_matches_single_device():
    mesh = sharding.make_mesh(8)
    prob, gt_cams, gt_points = _make_problem(
        jax.random.PRNGKey(1), n_cams=5, n_lms=64, noise=0.003)
    # single-device reference
    out_s, _ = ba.optimize(prob)
    # distributed
    sb = dist_ba.partition_problem(prob, 8)
    run = dist_ba.make_optimizer(mesh)
    cams_d, points_d, chi = run(sb)
    err_single = _cam_err(np.asarray(out_s.cams), gt_cams)
    err_dist = _cam_err(np.asarray(cams_d), gt_cams)
    assert err_dist < 0.01, err_dist
    # same quality as the single-device path
    assert err_dist < 2.0 * err_single + 1e-3, (err_single, err_dist)
    pts = dist_ba.gather_points(points_d, 64)
    assert np.abs(pts - np.asarray(gt_points)).max() < 0.02


def test_distributed_exact_recovery():
    mesh = sharding.make_mesh(8)
    prob, gt_cams, gt_points = _make_problem(
        jax.random.PRNGKey(2), n_cams=6, n_lms=48, noise=0.0)
    sb = dist_ba.partition_problem(prob, 8)
    run = dist_ba.make_optimizer(mesh)
    cams_d, points_d, chi = run(sb)
    assert _cam_err(np.asarray(cams_d), gt_cams) < 1e-3
    assert float(chi) < 1e-4
