"""Profile local_ba's 3.7 s/keyframe (VERDICT r3 next-2): build a synthetic
backend state matching the FULLSLAM_r03 protocol's scale (~20 keyframes,
~1k features each, local window 5) and time each component of
SparseBackend.local_ba plus the jitted ba.optimize solve on the host CPU.

Run: JAX_PLATFORMS=cpu python scripts/profile_local_ba.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.backend import ba
from hrbffusion3d_tpu.backend.keyframes import SparseBackend, Keyframe
from hrbffusion3d_tpu.config import TUM1, SLAMConfig

rng = np.random.default_rng(0)

N_KF = int(os.environ.get("PROF_KF", "20"))
N_FEAT = 1024

intr = TUM1
cfg = SLAMConfig()
bk = SparseBackend(intr, cfg, n_features=N_FEAT)

# synthetic keyframe chain: each keyframe re-observes ~60% of the previous
# keyframe's landmarks (typical of the 211-frame loopy run) and creates the
# rest fresh.
next_lm = 0
for k in range(N_KF):
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = rng.normal(size=3) * 0.1
    xy = rng.uniform([0, 0], [intr.width - 1, intr.height - 1],
                     (N_FEAT, 2)).astype(np.float32)
    cam = np.concatenate([rng.normal(size=(N_FEAT, 2)) * 0.5,
                          rng.uniform(0.8, 3.0, (N_FEAT, 1))],
                         -1).astype(np.float32)
    desc = rng.integers(0, 2**32, (N_FEAT, 8), dtype=np.uint32)
    valid = np.ones((N_FEAT,), bool)
    lm_ids = np.full((N_FEAT,), -1, np.int64)
    if k > 0:
        prev = bk.keyframes[-1]
        reobs = rng.choice(N_FEAT, int(0.6 * N_FEAT), replace=False)
        for i in reobs:
            lid = int(prev.landmark_ids[i])
            if lid >= 0:
                lm_ids[i] = lid
                bk.lm_obs[lid].append((k, int(i)))
    for i in np.nonzero(lm_ids < 0)[0]:
        lid = next_lm
        next_lm += 1
        bk.landmarks[lid] = (pose[:3, :3] @ cam[i] + pose[:3, 3])
        bk.lm_obs[lid] = [(k, int(i))]
        lm_ids[i] = lid
    info = np.tile(np.eye(3, dtype=np.float32) * 100.0, (N_FEAT, 1, 1))
    bk.keyframes.append(Keyframe(
        kf_id=k, frame_time=k * 10, pose=pose, kp_xy=xy, kp_cam=cam,
        desc=desc, kp_valid=valid, landmark_ids=lm_ids,
        kp_level=np.zeros(N_FEAT, np.int32), kp_info=info))
bk._next_lm = next_lm

print(f"{N_KF} keyframes, {len(bk.landmarks)} landmarks")

# ---- full local_ba timing (cold then warm x3) ----
for rep in range(4):
    t0 = time.perf_counter()
    deltas = bk.local_ba()
    t1 = time.perf_counter()
    print(f"local_ba rep{rep}: {t1 - t0:.3f} s")

# ---- component breakdown (replicates local_ba's internals) ----
t0 = time.perf_counter()
win = bk.keyframes[-bk.local_window:]
win_ids = {kf.kf_id for kf in win}
lm_sel = []
for kf in win:
    for lid in kf.landmark_ids:
        if lid >= 0 and len(bk.lm_obs[lid]) >= 2:
            lm_sel.append(lid)
lm_sel = sorted(set(lm_sel))
lm_index = {lid: i for i, lid in enumerate(lm_sel)}
cam_ids = set(win_ids)
for lid in lm_sel:
    for kf_id, _ in bk.lm_obs[lid]:
        cam_ids.add(kf_id)
cam_ids = sorted(cam_ids)
cam_index = {c: i for i, c in enumerate(cam_ids)}
fixed = np.array([(c not in win_ids) or (c == min(win_ids)) for c in cam_ids])
t1 = time.perf_counter()
print(f"selection: {t1 - t0:.3f} s  ({len(lm_sel)} lms, {len(cam_ids)} cams)")

t0 = time.perf_counter()
edges_c, edges_l, obs, infos = [], [], [], []
for lid in lm_sel:
    for kf_id, kp_i in bk.lm_obs[lid]:
        kf = bk.keyframes[kf_id]
        edges_c.append(cam_index[kf_id])
        edges_l.append(lm_index[lid])
        obs.append(kf.kp_cam[kp_i])
        infos.append(bk.edge_info(kf, kp_i))
obs = np.asarray(obs, np.float32)
infos = np.stack(infos)
t1 = time.perf_counter()
print(f"edge collect: {t1 - t0:.3f} s  ({obs.shape[0]} edges)")

cams_tcw = np.stack([np.linalg.inv(bk.keyframes[c].pose)
                     for c in cam_ids]).astype(np.float32)
points = np.stack([bk.landmarks[lid] for lid in lm_sel]).astype(np.float32)
prob = ba.BAProblem(
    cams=jnp.asarray(cams_tcw), points=jnp.asarray(points),
    obs=jnp.asarray(obs),
    cam_idx=jnp.asarray(edges_c, jnp.int32),
    lm_idx=jnp.asarray(edges_l, jnp.int32),
    info=jnp.asarray(infos),
    edge_valid=jnp.ones((obs.shape[0],), jnp.float32),
    fixed=jnp.asarray(fixed))
n_edges = obs.shape[0]

t0 = time.perf_counter()
prob_p = ba.pad_problem(prob)
jax.block_until_ready(prob_p.obs)
t1 = time.perf_counter()
print(f"pad_problem: {t1 - t0:.3f} s  (E {prob_p.obs.shape[0]}, "
      f"L {prob_p.points.shape[0]}, C {prob_p.cams.shape[0]})")

t0 = time.perf_counter()
pairs = ba.build_pairs(prob_p.cam_idx, prob_p.lm_idx)
jax.block_until_ready(pairs.e)
t1 = time.perf_counter()
print(f"build_pairs: {t1 - t0:.3f} s  (P {pairs.e.shape[0]})")

t0 = time.perf_counter()
pairs_p = ba.pad_pairs(pairs, invalid_edge=n_edges)
jax.block_until_ready(pairs_p.e)
t1 = time.perf_counter()
print(f"pad_pairs: {t1 - t0:.3f} s  (P {pairs_p.e.shape[0]})")

solver = "dense" if len(cam_ids) <= ba.DENSE_SOLVER_MAX_CAMS else "cg"
print(f"solver: {solver}")
for rep in range(3):
    t0 = time.perf_counter()
    out, chi = ba.optimize_jit(prob_p, solver=solver, pairs=pairs_p)
    jax.block_until_ready(out.cams)
    t1 = time.perf_counter()
    print(f"optimize_jit rep{rep}: {t1 - t0:.3f} s")

# single GN iteration cost split
opt1 = jax.jit(lambda p, pr: ba._gn_iteration(p, robust=True, pairs=pr,
                                              solver=solver))
with jax.default_matmul_precision("float32"):
    o = opt1(prob_p, pairs_p)
    jax.block_until_ready(o[0].cams)
    t0 = time.perf_counter()
    for _ in range(3):
        o = opt1(prob_p, pairs_p)
    jax.block_until_ready(o[0].cams)
    t1 = time.perf_counter()
print(f"one GN iteration (warm): {(t1 - t0) / 3:.3f} s")
