"""Distributed-BA device-count scaling sweep (VERDICT r4 next-8): the same
fixed Schur BA problem solved on 1/2/4/8-device meshes (virtual CPU devices
via --xla_force_host_platform_device_count), reporting per-solve wall time,
the psum payload, and the solution agreement across mesh sizes.

On this 2-core host the virtual devices share cores, so WALL TIME cannot
improve with device count — the table isolates the partition/collective
overhead of the landmark-sharded solver (the quantity that rides ICI on
real multi-chip hardware, where per-device work shrinks by 1/D).  The
cross-mesh agreement check is the load-bearing part: the solution must be
invariant to the decomposition.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/dist_ba_scaling.py [--cams 24] [--lms 2000] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

# sitecustomize pins the platform to the TPU tunnel via jax.config in every
# process — the env var alone does NOT stick; hard-override like
# tests/conftest.py or the "1-device" pass silently runs on the real chip.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.backend import ba
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.parallel import dist_ba, sharding as sh


def make_problem(n_cams: int, n_lms: int, obs_per_lm: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    gt_cams = jnp.stack([lie.se3_exp(jnp.asarray(
        0.08 * rng.standard_normal(6), jnp.float32)) for _ in range(n_cams)])
    pts = jnp.asarray(rng.uniform([-1.5, -1.0, 1.5], [1.5, 1.0, 3.5],
                                  (n_lms, 3)).astype(np.float32))
    lm_idx = np.repeat(np.arange(n_lms), obs_per_lm)
    cam_idx = rng.integers(0, n_cams, lm_idx.shape[0])
    T = gt_cams[cam_idx]
    obs = jnp.einsum("eij,ej->ei", T[:, :3, :3], pts[lm_idx]) + T[:, :3, 3]
    fixed = np.zeros((n_cams,), bool)
    fixed[:2] = True
    dx = 0.02 * rng.standard_normal((n_cams, 6)).astype(np.float32)
    dx[fixed] = 0.0
    cams0 = jax.vmap(lambda x, t: lie.se3_exp(x) @ t)(jnp.asarray(dx), gt_cams)
    return ba.BAProblem(
        cams=cams0, points=pts + 0.02, obs=obs,
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        info=ba.depth_information(obs, fx=500.0, fy=500.0),
        edge_valid=jnp.ones((obs.shape[0],)),
        fixed=jnp.asarray(fixed))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=24)
    ap.add_argument("--lms", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    prob = make_problem(args.cams, args.lms)
    E = int(prob.obs.shape[0])
    rows = []
    sols = {}
    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            break
        mesh = sh.make_mesh(nd)
        t0 = time.perf_counter()
        sb = dist_ba.partition_problem(prob, nd)
        t_part = time.perf_counter() - t0
        opt = dist_ba.make_optimizer(mesh)
        t0 = time.perf_counter()
        cams_d, points_d, chi = opt(sb)
        jax.block_until_ready(cams_d)
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            cams_d, points_d, chi = opt(sb)
            jax.block_until_ready(cams_d)
            times.append(time.perf_counter() - t0)
        sols[nd] = (np.asarray(cams_d), float(chi))
        # psum payload per GN iteration: S (C,C,6,6) + rhs (C,6) + chi2
        payload_mb = (args.cams ** 2 * 36 + args.cams * 6 + 1) * 4 / 1e6
        rows.append({
            "devices": nd,
            "partition_s": round(t_part, 3),
            "first_solve_s": round(t_compile, 2),
            "solve_ms": round(1000 * float(np.median(times)), 1),
            "psum_payload_mb_per_iter": round(payload_mb, 3),
            "chi2": float(chi),
        })
        print(rows[-1], flush=True)

    # decomposition invariance: every mesh size must agree with 1-device
    ref = sols[1][0]
    for nd, (cams_d, _) in sols.items():
        dmax = float(np.abs(cams_d - ref).max())
        print(f"devices {nd}: max |cams - cams_1dev| = {dmax:.2e}")
        assert dmax < 5e-5, (nd, dmax)

    print(json.dumps({"problem": {"cams": args.cams, "lms": args.lms,
                                  "edges": E},
                      "sweep": rows}))


if __name__ == "__main__":
    main()
