"""Multi-host scaffolding (single-process degradation on the virtual CPU
mesh; real multi-process runs use the same code paths via
jax.distributed)."""

import numpy as np

import jax

from hrbffusion3d_tpu.parallel import multihost


def test_global_mesh_flat_and_two_level():
    mesh = multihost.global_mesh()
    assert mesh.axis_names == ("map",)
    assert mesh.size == len(jax.devices())

    mesh2 = multihost.global_mesh(two_level=True)
    assert mesh2.axis_names == ("host", "chip")
    assert mesh2.size == len(jax.devices())
    assert mesh2.shape["host"] == jax.process_count()


def test_host_local_batch_single_process():
    mesh = multihost.global_mesh()
    n = mesh.size
    depth = np.random.RandomState(0).rand(n, 8, 16).astype(np.float32)
    rgb = np.random.RandomState(1).rand(n, 8, 16, 3).astype(np.float32)
    fi = multihost.host_local_batch(mesh, depth, rgb)
    assert fi.depth.shape == (n, 8, 16)
    np.testing.assert_allclose(np.asarray(fi.depth), depth)
    assert multihost.is_coordinator()
