"""In-scan per-stage cost attribution on the real TPU.

Builds scan-batched step variants that run prefixes of the SLAM stage list
(preprocess | track | render | fuse | clean | predict+fill); the timing
DELTAS between consecutive variants are the true in-scan per-frame stage
costs (standalone-stage timings overestimate: +27 ms dispatch, no donation).

Every variant keeps the full SLAMState carry so XLA cannot dead-code a
stage: outputs of the last stage run are folded into scalar state fields.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
_ = np.asarray(state0.t)
print("bootstrap done", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]


def make_step(stages: str):
    """stages: prefix of ['pre','track','render','fuse','clean','predict']"""

    def step1(state, frame):
        time_ = state.time + 1
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, cfg)
        sink = jnp.sum(depth_f) + jnp.sum(curv.k1) + jnp.sum(pre.normal)
        R, t = state.R, state.t
        m = state.map
        filled = None
        idx = None

        if "track" in stages:
            inp = odometry.build_inputs(
                next_depth=depth_f, next_intensity=intensity,
                next_vmap=pre.vertex_filtered, next_nmap=pre.normal,
                pred_vmap=state.pred_vertex, pred_nmap=state.pred_normal,
                pred_intensity=state.pred_intensity,
                icp_weight=state.pred_icp_weight,
                prev_R=state.R, prev_t=state.t,
                prev_intensity=state.prev_intensity, cfg=cfg)
            tr = odometry.track(state.R, state.t, inp, intr, cfg)
            R, t = tr.R, tr.t
        pose = lie.rt_to_mat(R, t)
        pose_inv = lie.se3_inverse(pose)

        dt = jnp.linalg.norm(t - state.t)
        w_rot = jnp.linalg.norm(lie.so3_log(state.R.T @ R))
        weighting = jnp.clip(1.0 - (dt * 5.0 + w_rot * 2.0), 0.25, 1.0)
        conf = preprocess.confidence_map(pre, curv, intr, cfg, weighting=weighting)
        meas = sm.measurement_from_preprocess(pre, curv, frame.rgb, conf)

        if "render" in stages:
            active = sm.active_from_submaps(state.map, state.active_submaps)
            idx = sm.render_index(state.map, pose_inv, intr, active=active)
            sink = sink + jnp.sum(idx).astype(jnp.float32)
        if "fuse" in stages:
            m, idx = sm.fuse(state.map, meas, pose, idx, intr, cfg,
                             time=time_, submap_idx=state.submap_idx)
            sink = sink + jnp.sum(idx).astype(jnp.float32) + m.data[0, 0]
        if "clean" in stages:
            m, remap = sm.clean_with_remap(
                m, pose, idx, intr, cfg, time=time_)
            idx = sm.remap_index_map(idx, remap)
            sink = sink + jnp.sum(idx).astype(jnp.float32) + m.data[0, 0]
        if "predict" in stages:
            pred = raycast.predict_hrbf(m, pose_inv, idx, intr, cfg,
                                        chunk=cfg.raycast_chunk)
            filled = raycast.fill_in(
                pred, pre.vertex_filtered, pre.normal, pre.radius, frame.rgb,
                conf, curv.k1, curv.k2, cfg)

        if filled is None:
            # keep prediction fields alive but unchanged
            return state._replace(
                map=m, R=R, t=t, time=time_, prev_intensity=intensity,
                last_icp_error=sink * 1e-20, last_icp_count=state.last_icp_count,
            ), t
        return slam.SLAMState(
            map=m, R=R, t=t, time=time_, submap_idx=state.submap_idx,
            prev_intensity=intensity,
            pred_vertex=filled.vertex, pred_normal=filled.normal,
            pred_intensity=pyramid.rgb_to_intensity(filled.color),
            pred_icp_weight=filled.icp_weight,
            pred_k1=filled.k1, pred_k2=filled.k2,
            active_submaps=state.active_submaps,
            last_icp_error=sink * 1e-20, last_icp_count=state.last_icp_count,
            dense_frac=jnp.mean(filled.from_model.astype(jnp.float32)),
        ), t

    @jax.jit
    def many(state, fr):
        return jax.lax.scan(step1, state, fr)

    return many


VARIANTS = [
    ("pre", "pre"),
    ("pre+track", "pre track"),
    ("pre+track+render", "pre track render"),
    ("+fuse", "pre track render fuse"),
    ("+clean", "pre track render fuse clean"),
    ("+predict (full)", "pre track render fuse clean predict"),
]

results = {}
fns = {}
for name, stages in VARIANTS:
    fn = make_step(stages)
    t0 = time.perf_counter()
    out_state, _ = fn(state0, batch)
    _ = np.asarray(out_state.t)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
    fns[name] = fn

key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (1 << 20, 24))
cidx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
canary = jax.jit(lambda t, i: t[i].sum(0))
_ = np.asarray(canary(tbl, cidx))

ROUNDS = int(os.environ.get("AB_ROUNDS", "10"))
best = {n: 1e9 for n, _ in VARIANTS}
best_canary = 1e9
for r in range(ROUNDS):
    t0 = time.perf_counter()
    _ = np.asarray(canary(tbl, cidx))
    best_canary = min(best_canary, (time.perf_counter() - t0) * 1000)
    for name, _stages in VARIANTS:
        t0 = time.perf_counter()
        out_state, _2 = fns[name](state0, batch)
        _ = np.asarray(out_state.t)
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / NF)
    print(f"round {r}: canary={best_canary:.0f} " +
          "  ".join(f"{n}={best[n]:.0f}" for n in best), flush=True)

print(f"\ncanary {best_canary:.1f} ms (healthy ~35)", flush=True)
print("--- stage deltas (ms/frame, in-scan, interleaved-min) ---", flush=True)
prev = 0.0
for name, _ in VARIANTS:
    print(f"{name:22s} {best[name]:8.1f}   delta {best[name] - prev:8.1f}",
          flush=True)
    prev = best[name]
