"""Worker process for the 2-process jax.distributed fake cluster
(tests/test_multihost_2proc.py, scripts/multihost_bench.py).

Each process hosts N virtual CPU devices; jax.distributed stitches them into
one global mesh and the landmark-sharded distributed BA
(parallel/dist_ba.py) runs over it unchanged — the psum of the reduced
camera system is the cross-process (DCN-analogue) collective.  The BASELINE
2-host target (BASELINE.md config 4) is measured with this same harness on
real hosts.

Usage (spawned by the test/bench, one per process):
  python scripts/multihost_worker.py --port 9xxx --nproc 2 --pid 0 \
      --devices 4 --out /tmp/out0.npz [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(seed: int = 0, n_cams: int = 12, n_lms: int = 400):
    """Deterministic BA problem (identical on every process)."""
    import numpy as np

    import jax.numpy as jnp

    from hrbffusion3d_tpu.backend import ba
    from hrbffusion3d_tpu.core import lie

    rng = np.random.default_rng(seed)
    gt_cams = []
    for i in range(n_cams):
        xi = jnp.array([0.08 * i, 0.015 * i, 0.0, 0.0, 0.03 * i, 0.0])
        gt_cams.append(lie.se3_exp(xi))
    gt_cams = jnp.stack(gt_cams)
    first = rng.integers(0, n_cams - 4, n_lms)
    z = rng.uniform(1.5, 3.5, n_lms)
    p_cam = np.stack([rng.uniform(-0.4, 0.4, n_lms) * z,
                      rng.uniform(-0.3, 0.3, n_lms) * z, z], -1).astype(np.float32)
    Twc = np.linalg.inv(np.asarray(gt_cams))[first]
    gt_points = jnp.asarray(
        np.einsum("lij,lj->li", Twc[:, :3, :3], p_cam) + Twc[:, :3, 3])
    cam_idx = jnp.asarray((first[:, None] + np.arange(4)[None]).reshape(-1)
                          .astype(np.int32))
    lm_idx = jnp.asarray(np.repeat(np.arange(n_lms), 4).astype(np.int32))
    T = gt_cams[cam_idx]
    obs = jnp.einsum("eij,ej->ei", T[:, :3, :3], gt_points[lm_idx]) + T[:, :3, 3]
    obs = obs + 0.003 * jnp.asarray(rng.normal(size=obs.shape).astype(np.float32))
    info = ba.depth_information(obs, fx=500.0, fy=500.0)
    fixed = jnp.zeros((n_cams,), bool).at[0].set(True).at[1].set(True)
    dx = 0.03 * jnp.asarray(rng.normal(size=(n_cams, 6)).astype(np.float32))
    dx = jnp.where(fixed[:, None], 0.0, dx)
    import jax

    cams0 = jax.vmap(lambda x, t: lie.se3_exp(x) @ t)(dx, gt_cams)
    pts0 = gt_points + 0.03 * jnp.asarray(
        rng.normal(size=(n_lms, 3)).astype(np.float32))
    return ba.BAProblem(cams=cams0, points=pts0, obs=obs, cam_idx=cam_idx,
                        lm_idx=lm_idx, info=info,
                        edge_valid=jnp.ones((obs.shape[0],)), fixed=fixed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--lms", type=int, default=400)
    ap.add_argument("--cpu", type=int, default=-1,
                    help="pin this process to the given CPU (sched_setaffinity)")
    args = ap.parse_args()

    if args.cpu >= 0:
        os.sched_setaffinity(0, {args.cpu})

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")

    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")

    from jax.experimental import multihost_utils

    from hrbffusion3d_tpu.parallel import dist_ba, multihost

    multihost.initialize(coordinator_address=f"localhost:{args.port}",
                         num_processes=args.nproc, process_id=args.pid)
    assert jax.process_count() == args.nproc
    mesh = multihost.global_mesh()
    assert mesh.size == args.nproc * args.devices

    prob = make_problem(n_cams=args.cams, n_lms=args.lms)
    sb = dist_ba.partition_problem(prob, mesh.size)
    sbg = multihost.globalize_sharded_ba(sb, mesh)
    run = dist_ba.make_optimizer(mesh)

    cams, points, chi = run(sbg)  # compile + first run
    t0 = time.perf_counter()
    for _ in range(args.reps):
        cams, points, chi = run(sbg)
    _ = np.asarray(cams)
    elapsed = time.perf_counter() - t0

    points_full = multihost_utils.process_allgather(points, tiled=True)
    if jax.process_index() == 0:
        np.savez(args.out, cams=np.asarray(cams),
                 points=np.asarray(points_full), chi=float(chi),
                 elapsed=elapsed, reps=args.reps)
        print(f"proc0: chi={float(chi):.3f} elapsed={elapsed:.3f}s", flush=True)


if __name__ == "__main__":
    main()
