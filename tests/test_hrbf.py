"""Golden-value tests of the HRBF kernel against JAX autodiff and analytic
surfaces (SURVEY §4: 'HRBF phi/grad/hess vs autodiff, curvature vs analytic
spheres/planes')."""

import jax
import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.ops import hrbf


def _rand_neighbors(key, k=12, support=0.35):
    kp, kn, ks = jax.random.split(key, 3)
    pos = jax.random.uniform(kp, (k, 3), minval=-0.2, maxval=0.2)
    n = jax.random.normal(kn, (k, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    # flip to n_z > 0 (map convention)
    n = n * jnp.where(n[:, 2:3] < 0, -1.0, 1.0)
    sup = jnp.full((k,), support) * jax.random.uniform(ks, (k,), minval=0.8, maxval=1.2)
    mask = jnp.ones((k,), bool)
    return pos, n, sup, mask


def test_phi_basic_values():
    # phi(0) = 1, phi(support boundary) = 0, monotone decreasing
    sup = jnp.float32(0.5)
    assert float(hrbf.phi(jnp.float32(0.0), sup)) == 1.0
    assert float(hrbf.phi(sup * sup, sup)) == 0.0
    d = jnp.linspace(0, 0.25, 50)
    vals = hrbf.phi(d, sup)
    assert (jnp.diff(vals) <= 1e-7).all()


def test_grad_phi_matches_autodiff():
    sup = jnp.float32(0.4)

    def f(v):
        return hrbf.phi(jnp.sum(v * v), sup)

    for seed in range(5):
        v = jax.random.uniform(jax.random.PRNGKey(seed), (3,), minval=-0.2, maxval=0.2)
        got = hrbf.grad_phi(v, jnp.sum(v * v), sup)
        want = jax.grad(f)(v)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_hess_phi_matches_autodiff():
    sup = jnp.float32(0.4)

    def g(v):
        return hrbf.grad_phi(v, jnp.sum(v * v), sup)

    for seed in range(5):
        v = jax.random.uniform(jax.random.PRNGKey(seed + 10), (3,), minval=-0.2, maxval=0.2)
        got = hrbf.hess_phi(v, jnp.sum(v * v), sup)
        want = jax.jacfwd(g)(v)
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_third_phi_matches_autodiff():
    sup = jnp.float32(0.4)

    def h(v):
        return hrbf.hess_phi(v, jnp.sum(v * v), sup)

    for seed in range(5):
        v = jax.random.uniform(jax.random.PRNGKey(seed + 20), (3,), minval=-0.15, maxval=0.15)
        got = hrbf.third_phi(v, jnp.sum(v * v), sup)
        want = jax.jacfwd(h)(v)  # d H_ij / d v_c -> (3,3,3) [i,j,c]
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-3)


def test_hess_phi_at_zero():
    sup = jnp.float32(0.5)
    H = hrbf.hess_phi(jnp.zeros(3), jnp.float32(0.0), sup)
    np.testing.assert_allclose(H, -20.0 / 0.25 * np.eye(3), atol=1e-4)


def test_hrbf_gradient_matches_autodiff_of_value():
    pos, n, sup, mask = _rand_neighbors(jax.random.PRNGKey(3))

    def f(x):
        return hrbf.hrbf_value(x, pos, n, sup, mask)[0]

    # keep the query away from the exact neighbor locations (kink at r=0)
    x = jnp.array([0.03, -0.02, 0.05])
    got = hrbf.hrbf_gradient(x, pos, n, sup, mask)
    want = jax.grad(f)(x)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-3)


def test_hrbf_hessian_matches_autodiff_of_gradient():
    pos, n, sup, mask = _rand_neighbors(jax.random.PRNGKey(4))
    x = jnp.array([0.02, 0.01, -0.04])
    got = hrbf.hrbf_hessian(x, pos, n, sup, mask)
    want = jax.jacfwd(lambda q: hrbf.hrbf_gradient(q, pos, n, sup, mask))(x)
    np.testing.assert_allclose(got, want, atol=5e-1, rtol=1e-3)
    # symmetric
    np.testing.assert_allclose(got, got.T, atol=1e-3)


def test_hrbf_zero_level_set_on_plane():
    """Surfels sampled on the plane z=1 with normals +z: f(z=1)=0,
    f(z<1)<0 (camera side), f(z>1)>0."""
    xs, ys = jnp.meshgrid(jnp.linspace(-0.3, 0.3, 7), jnp.linspace(-0.3, 0.3, 7))
    pos = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(49)], axis=-1)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (49, 1))
    sup = jnp.full((49,), 0.3)
    mask = jnp.ones((49,), bool)
    f_on, ns = hrbf.hrbf_value(jnp.array([0.0, 0.0, 1.0]), pos, n, sup, mask)
    f_front, _ = hrbf.hrbf_value(jnp.array([0.0, 0.0, 0.95]), pos, n, sup, mask)
    f_behind, _ = hrbf.hrbf_value(jnp.array([0.0, 0.0, 1.05]), pos, n, sup, mask)
    assert int(ns) > 5
    assert abs(float(f_on)) < 1e-3
    assert float(f_front) < -1e-3
    assert float(f_behind) > 1e-3


def test_hrbf_gradient_direction_on_plane():
    xs, ys = jnp.meshgrid(jnp.linspace(-0.3, 0.3, 7), jnp.linspace(-0.3, 0.3, 7))
    pos = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(49)], axis=-1)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (49, 1))
    sup = jnp.full((49,), 0.3)
    mask = jnp.ones((49,), bool)
    g = hrbf.hrbf_gradient(jnp.array([0.02, -0.01, 1.0]), pos, n, sup, mask)
    g = g / jnp.linalg.norm(g)
    np.testing.assert_allclose(g, [0, 0, 1], atol=0.05)


def _sphere_patch(radius=0.5, center=(0.0, 0.0, 2.0), grid=9, extent=0.25):
    """Surfels on the camera-facing cap of a sphere; normals with n_z>0 point
    away from the camera = inward (towards centre+beyond), matching the map
    convention where curvature of a convex-towards-camera sphere is positive
    1/R with inward normals... sign checked in test."""
    c = jnp.asarray(center)
    us, vs = jnp.meshgrid(
        jnp.linspace(-extent, extent, grid), jnp.linspace(-extent, extent, grid)
    )
    # points on sphere nearest the camera: z = cz - sqrt(r^2 - x^2 - y^2)
    x = us.ravel()
    y = vs.ravel()
    r2 = radius * radius - x * x - y * y
    ok = r2 > 0
    z = c[2] - jnp.sqrt(jnp.maximum(r2, 1e-9))
    pos = jnp.stack([x + c[0], y + c[1], z], axis=-1)
    outward = (pos - c) / radius  # points towards camera, n_z < 0
    n = -outward  # map convention n_z > 0
    sup = jnp.full((grid * grid,), 0.35)
    return pos, n, sup, ok


def test_curvature_of_sphere():
    """Principal curvatures at the sphere cap centre should be ~ +1/R with
    the inward-normal convention (gradient points inward, away from camera)."""
    radius = 0.5
    pos, n, sup, mask = _sphere_patch(radius=radius)
    x = jnp.array([0.0, 0.0, 2.0 - radius])
    g = hrbf.hrbf_gradient(x, pos, n, sup, mask)
    H = hrbf.hrbf_hessian(x, pos, n, sup, mask)
    k1, k2, d1, d2, valid = hrbf.principal_curvatures(g, H)
    assert bool(valid)
    np.testing.assert_allclose(float(k1), 1.0 / radius, rtol=0.15)
    np.testing.assert_allclose(float(k2), 1.0 / radius, rtol=0.15)


def test_curvature_of_plane_is_zero():
    xs, ys = jnp.meshgrid(jnp.linspace(-0.4, 0.4, 9), jnp.linspace(-0.4, 0.4, 9))
    pos = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(81)], axis=-1)
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (81, 1))
    sup = jnp.full((81,), 0.4)
    mask = jnp.ones((81,), bool)
    x = jnp.array([0.0, 0.0, 1.0])
    g = hrbf.hrbf_gradient(x, pos, n, sup, mask)
    H = hrbf.hrbf_hessian(x, pos, n, sup, mask)
    k1, k2, *_ = hrbf.principal_curvatures(g, H)
    assert abs(float(k1)) < 0.1
    assert abs(float(k2)) < 0.1


def test_masking():
    pos, n, sup, _ = _rand_neighbors(jax.random.PRNGKey(7), k=8)
    x = jnp.array([0.0, 0.0, 0.0])
    mask_all = jnp.ones((8,), bool)
    mask_half = jnp.arange(8) < 4
    f_all, _ = hrbf.hrbf_value(x, pos, n, sup, mask_all)
    f_half, _ = hrbf.hrbf_value(x, pos, n, sup, mask_half)
    f_manual, _ = hrbf.hrbf_value(x, pos[:4], n[:4], sup[:4], jnp.ones((4,), bool))
    np.testing.assert_allclose(float(f_half), float(f_manual), rtol=1e-5)
    assert abs(float(f_all) - float(f_half)) > 1e-9  # masked ones mattered


def test_batched_shapes():
    pos, n, sup, mask = _rand_neighbors(jax.random.PRNGKey(8), k=16)
    xs = jax.random.uniform(jax.random.PRNGKey(9), (5, 7, 3), minval=-0.1, maxval=0.1)
    nb_pos = jnp.broadcast_to(pos, (5, 7, 16, 3))
    nb_n = jnp.broadcast_to(n, (5, 7, 16, 3))
    nb_s = jnp.broadcast_to(sup, (5, 7, 16))
    nb_m = jnp.broadcast_to(mask, (5, 7, 16))
    f, ns = hrbf.hrbf_value(xs, nb_pos, nb_n, nb_s, nb_m)
    assert f.shape == (5, 7) and ns.shape == (5, 7)
    g = hrbf.hrbf_gradient(xs, nb_pos, nb_n, nb_s, nb_m)
    assert g.shape == (5, 7, 3)
    H = hrbf.hrbf_hessian(xs, nb_pos, nb_n, nb_s, nb_m)
    assert H.shape == (5, 7, 3, 3)
    fv, gv, nsv = hrbf.hrbf_value_grad(xs, nb_pos, nb_n, nb_s, nb_m)
    np.testing.assert_allclose(fv, f, atol=1e-6)
    np.testing.assert_allclose(gv, g, atol=1e-6)
