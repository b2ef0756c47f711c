"""On-chip verification of the reduction-plan BA rewrite (VERDICT r3
next-2/next-5): run the plan-based Schur GN solver on the real TPU and on
the host CPU backend on the SAME local-BA-scale problem, and report

  * TPU-vs-CPU result agreement (the r3 scatter-order penalty check:
    the old scatter path measured ~8 mm ATE impact from TPU f32
    accumulation order; the gather-sum plans reduce in a fixed order),
  * TPU run-to-run determinism (bit-equality of two runs),
  * warm solve wall time on both backends.

Env: JAX_PLATFORMS=axon,cpu  (dense device + host CPU backend).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import numpy as np

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.backend import ba
from hrbffusion3d_tpu.core import lie

rng = np.random.default_rng(0)

# local-BA-scale problem matching the FULLSLAM protocol: ~20 cams, ~8k
# landmarks, fused-degree distribution up to 20 observations per landmark
C, L = 20, 8192
deg = np.minimum(2 + rng.geometric(0.35, L), 20)
E = int(deg.sum())
lm_idx = np.repeat(np.arange(L), deg)
cam_idx = rng.integers(0, C, E)

gt_cams = []
for i in range(C):
    xi = np.array([0.05 * i, 0.01 * i, 0.0, 0.0, 0.02 * i, 0.0], np.float32)
    gt_cams.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
gt_cams = np.stack(gt_cams)
z = rng.uniform(1.0, 3.0, L)
gt_pts = np.stack([rng.uniform(-0.6, 0.6, L) * z,
                   rng.uniform(-0.5, 0.5, L) * z, z], -1).astype(np.float32)
T = gt_cams[cam_idx]
obs = (np.einsum("eij,ej->ei", T[:, :3, :3], gt_pts[lm_idx]) + T[:, :3, 3])
obs = (obs + 0.003 * rng.normal(size=obs.shape)).astype(np.float32)
info = np.asarray(jax.device_put(
    ba.depth_information(jnp.asarray(obs), 520.0, 520.0),
    jax.devices("cpu")[0]))
fixed = np.zeros((C,), bool)
fixed[0] = True
dx = (0.02 * rng.normal(size=(C, 6))).astype(np.float32)
dx[fixed] = 0
cams0 = np.stack([np.asarray(lie.se3_exp(jnp.asarray(dx[i]))) @ gt_cams[i]
                  for i in range(C)])
pts0 = gt_pts + 0.02 * rng.normal(size=(L, 3)).astype(np.float32)

prob = ba.BAProblem(
    cams=jnp.asarray(cams0), points=jnp.asarray(pts0), obs=jnp.asarray(obs),
    cam_idx=jnp.asarray(cam_idx, jnp.int32),
    lm_idx=jnp.asarray(lm_idx, jnp.int32), info=jnp.asarray(info),
    edge_valid=jnp.ones((E,), jnp.float32), fixed=jnp.asarray(fixed))
prob = ba.pad_problem(prob, collapse_pad_lms=True)
plans = ba.build_plans(prob, "dense", n_real=E)
print(f"problem: C={C} L={L} E={E} (padded E={prob.obs.shape[0]} "
      f"L={prob.points.shape[0]})", flush=True)


def run_on(device, tag, reps=3):
    dprob = jax.device_put(prob, device)
    dplans = jax.device_put(plans, device)
    outs = []
    t_warm = None
    for r in range(reps):
        t0 = time.perf_counter()
        out, chi = ba.optimize_jit(dprob, solver="dense", plans=dplans)
        cams = np.asarray(out.cams)
        pts = np.asarray(out.points)
        dt = time.perf_counter() - t0
        if r > 0:
            t_warm = dt
        print(f"  {tag} rep{r}: {dt:.3f}s chi2={float(chi):.4f}", flush=True)
        outs.append((cams, pts))
    return outs, t_warm


cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
print(f"devices: dense={tpu.platform}, backend={cpu.platform}", flush=True)

print("CPU backend:", flush=True)
cpu_outs, cpu_warm = run_on(cpu, "cpu")
print("TPU:", flush=True)
tpu_outs, tpu_warm = run_on(tpu, "tpu")

bit_equal = (np.array_equal(tpu_outs[1][0], tpu_outs[2][0])
             and np.array_equal(tpu_outs[1][1], tpu_outs[2][1]))
cam_diff = float(np.abs(tpu_outs[-1][0][:C] - cpu_outs[-1][0][:C]).max())
pt_diff = float(np.abs(tpu_outs[-1][1][:L] - cpu_outs[-1][1][:L]).max())
# pose-space error (meters-ish): translation part of delta
t_diff = float(np.abs(tpu_outs[-1][0][:C, :3, 3]
                      - cpu_outs[-1][0][:C, :3, 3]).max())

err_gt_cpu = float(np.abs(cpu_outs[-1][0][:C, :3, 3] - np.linalg.inv(
    np.linalg.inv(gt_cams))[:C, :3, 3]).max())

import json

print(json.dumps({
    "metric": "tpu_ba_plan_verify",
    "tpu_run_to_run_bit_equal": bool(bit_equal),
    "tpu_vs_cpu_cam_maxdiff": cam_diff,
    "tpu_vs_cpu_trans_maxdiff_m": t_diff,
    "tpu_vs_cpu_pt_maxdiff": pt_diff,
    "cpu_warm_s": round(cpu_warm, 3),
    "tpu_warm_s": round(tpu_warm, 3),
}), flush=True)
