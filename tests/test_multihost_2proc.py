"""Real 2-process jax.distributed fake cluster (VERDICT r1 item 6): two
subprocesses, each with 4 virtual CPU devices, form one 8-device global mesh
and run the landmark-sharded distributed BA; the result must match the
single-process 8-device run of the identical problem."""

import importlib.util
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _load_worker_module():
    spec = importlib.util.spec_from_file_location("multihost_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_two_process_dist_ba_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "proc0.npz"
    procs = []
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--port", str(port), "--nproc", "2",
             "--pid", str(pid), "--devices", "4", "--out", str(out)],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode())
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-3000:]
    assert out.exists(), outputs[0][-3000:]
    got = np.load(out)

    # single-process reference on an 8-device local mesh, same problem
    import jax

    from hrbffusion3d_tpu.parallel import dist_ba, multihost

    mod = _load_worker_module()
    prob = mod.make_problem()
    mesh = multihost.global_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices
    sb = dist_ba.partition_problem(prob, mesh.size)
    sbg = multihost.globalize_sharded_ba(sb, mesh)
    cams, points, chi = dist_ba.make_optimizer(mesh)(sbg)
    cams, points = np.asarray(cams), np.asarray(points)

    np.testing.assert_allclose(got["cams"], cams, atol=2e-5)
    np.testing.assert_allclose(got["points"], points, atol=2e-5)
    np.testing.assert_allclose(float(got["chi"]), float(chi), rtol=1e-4)
