"""Interleaved A/B batch 2: decompose track / fuse / clean internals.

Variants are scan-batched pipelines with one internal piece toggled; the
interleaved-min protocol (see tpu_ab.py) gives usable deltas.
"""

import os
import sys
import time
import dataclasses

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
from hrbffusion3d_tpu.ops import preprocess, pyramid
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2)

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


def scan_of(step1):
    @jax.jit
    def many(state, fr):
        return jax.lax.scan(step1, state, fr)

    return many


# ---------------- track probes (pre + build + track pieces) -------------- #
def track_probe(probe_cfg):
    def step1(state, frame):
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, probe_cfg)
        inp = odometry.build_inputs(
            next_depth=depth_f, next_intensity=intensity,
            next_vmap=pre.vertex_filtered, next_nmap=pre.normal,
            pred_vmap=state.pred_vertex, pred_nmap=state.pred_normal,
            pred_intensity=state.pred_intensity,
            icp_weight=state.pred_icp_weight,
            prev_R=state.R, prev_t=state.t,
            prev_intensity=state.prev_intensity, cfg=probe_cfg)
        tr = odometry.track(state.R, state.t, inp, intr, probe_cfg)
        return state._replace(R=tr.R, t=tr.t, prev_intensity=intensity,
                              time=state.time + 1), tr.t

    return scan_of(step1)


def pre_probe():
    def step1(state, frame):
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, cfg)
        sink = jnp.sum(depth_f) + jnp.sum(curv.k1) + jnp.sum(pre.normal)
        return state._replace(prev_intensity=intensity,
                              last_icp_error=sink * 1e-20,
                              time=state.time + 1), sink

    return scan_of(step1)


# ---------------- fuse probes (pre + render + fuse pieces) --------------- #
def fuse_probe(do_assoc=True, do_merge=True, do_append=True):
    def step1(state, frame):
        time_ = state.time + 1
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, cfg)
        conf = preprocess.confidence_map(pre, curv, intr, cfg, weighting=1.0)
        meas = sm.measurement_from_preprocess(pre, curv, frame.rgb, conf)
        pose = lie.rt_to_mat(state.R, state.t)
        pose_inv = lie.se3_inverse(pose)
        active = sm.active_from_submaps(state.map, state.active_submaps)
        idx = sm.render_index(state.map, pose_inv, intr, active=active)
        sink = jnp.sum(idx).astype(jnp.float32)
        m = state.map

        h, w = intr.height, intr.width
        P = (h // 2) * (w // 2)
        n_cap = m.data.shape[0]
        par = jnp.asarray(time_, jnp.int32) % 2

        def quarter(img):
            return jnp.where(par == 0, img[0::2, 0::2], img[1::2, 1::2])

        from hrbffusion3d_tpu.ops.patches import extract_patches

        meas_q = jax.tree.map(quarter, meas)
        ok_pix = sm._measurement_valid(meas_q, cfg).reshape(P)
        v_local = meas_q.vertex.reshape(P, 3)
        n_local = meas_q.normal.reshape(P, 3)
        from hrbffusion3d_tpu.core import camera

        yyq, xxq = camera.pixel_grid(h // 2, w // 2)
        gx = 2.0 * xxq + par.astype(jnp.float32)
        gy = 2.0 * yyq + par.astype(jnp.float32)
        xl = (gx.reshape(P) - intr.cx) / intr.fx
        yl = (gy.reshape(P) - intr.cy) / intr.fy
        lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
        ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
        ray_len = jnp.linalg.norm(ray, axis=-1)

        attr = sm.render_attr_image(m, idx, pose_inv)
        sink += jnp.sum(attr[..., 0])

        best_id = jnp.full((P,), -1, jnp.int32)
        if do_assoc:
            patch = quarter(extract_patches(attr, 1)).reshape(P, 9, sm.ATTR_CHANNELS)
            cand = quarter(extract_patches(idx, 1, fill=-1)).reshape(P, 9)
            has = (cand >= 0) & (patch[..., sm.A_VALID] > 0.5)
            cpos = patch[..., sm.A_POS]
            cnrm = patch[..., sm.A_NRM]
            depth_ok = jnp.abs(cpos[..., 2] * lam[:, None]
                               - (v_local[:, 2] * lam)[:, None]) < cfg.depth_consistency
            dist = jnp.linalg.norm(jnp.cross(
                jnp.broadcast_to(ray[:, None, :], cpos.shape), cpos), axis=-1) / ray_len[:, None]
            cosang = jnp.sum(cnrm * n_local[:, None, :], axis=-1)
            ang_ok = (jnp.abs(cnrm[..., 2]) < 0.75) | (
                jnp.abs(jnp.arccos(jnp.clip(cosang, -1.0, 1.0))) < cfg.fuse_angle_limit)
            good = has & depth_ok & ang_ok
            dist = jnp.where(good, dist, 1e3)
            best_tap = jnp.argmin(dist, axis=1)
            best_ok = jnp.take_along_axis(good, best_tap[:, None], axis=1)[:, 0]
            best_id = jnp.where(best_ok,
                                jnp.take_along_axis(cand, best_tap[:, None], axis=1)[:, 0],
                                -1)
        matched = ok_pix & (best_id >= 0)

        new_rows = sm._pack_frame(meas_q, pose, state.submap_idx, time_)
        if do_merge:
            pixel_ids = jnp.arange(P, dtype=jnp.int32)
            tgt = jnp.where(matched, best_id, n_cap)
            winner_tbl = jnp.full((n_cap + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
            winner_tbl = winner_tbl.at[tgt].min(
                jnp.where(matched, pixel_ids, jnp.iinfo(jnp.int32).max))
            wtbl = winner_tbl[:n_cap]
            has_winner = wtbl != jnp.iinfo(jnp.int32).max
            wpix = jnp.clip(wtbl, 0, P - 1)
            meas_rows = new_rows[wpix]
            old = m.data
            c_k = old[:, sm.CONF]
            a = meas_rows[:, sm.CONF]
            denom = jnp.maximum(c_k + a, 1e-12)
            r_ok = meas_rows[:, sm.RADIUS] < 1.5 * old[:, sm.RADIUS]
            blended = (c_k[:, None] * old + a[:, None] * meas_rows) / denom[:, None]
            nrm = blended[:, sm.NORMAL]
            nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
            blended = blended.at[:, sm.NORMAL].set(nrm)
            merged = jnp.where(r_ok[:, None], blended, old)
            merged = merged.at[:, sm.CONF].set(c_k + a)
            data = jnp.where(has_winner[:, None], merged, old)
            m = sm.SurfelMap(data=data, count=m.count)
        if do_append:
            new_mask = ok_pix & (best_id < 0)
            S = min(cfg.new_surfels_capacity, P, n_cap)
            m = sm._append(m, new_rows, new_mask, block_size=S)
        sink += m.data[0, 0] + m.count.astype(jnp.float32)
        return state._replace(map=m, time=time_,
                              last_icp_error=sink * 1e-20), sink

    return scan_of(step1)


# ---------------- clean probes ------------------------------------------- #
def clean_probe(gather_taps=True, do_compact=True):
    def step1(state, frame):
        time_ = state.time + 1
        depth_f, pre, curv, intensity = slam._preprocess(frame, intr, cfg)
        pose = lie.rt_to_mat(state.R, state.t)
        pose_inv = lie.se3_inverse(pose)
        m = state.map
        idx = sm.render_index(m, pose_inv, intr)
        sink = jnp.sum(idx).astype(jnp.float32)
        if gather_taps:
            keep = sm.clean_mask(m, pose, idx, intr, cfg, time_)
        else:
            # curvature/unstable rules only (no per-surfel patch gather)
            t = cfg.curv_valid_threshold
            k1 = m.data[:, sm.K1]
            k2 = m.data[:, sm.K2]
            curv_bad = (k1 < -t) | (k1 > t) | (k2 < -t) | (k2 > t)
            unstable_kill = ((time_ - m.data[:, sm.STAMP]) > cfg.unstable_time_limit) & \
                (m.data[:, sm.CONF] < cfg.confidence_threshold)
            keep = m.valid & ~curv_bad & ~unstable_kill
        if do_compact:
            m = sm.compact(m, keep)
        else:
            data = m.data.at[:, sm.VALID].set(jnp.where(keep, m.data[:, sm.VALID], 0.0))
            m = sm.SurfelMap(data=data, count=m.count)
        sink += m.data[0, 0] + m.count.astype(jnp.float32)
        return state._replace(map=m, time=time_,
                              last_icp_error=sink * 1e-20), sink

    return scan_of(step1)


VARIANTS = {
    "pre-only": pre_probe(),
    "track full": track_probe(cfg),
    "track no-so3": track_probe(dataclasses.replace(cfg, so3_prealign=False)),
    "track 0-iters": track_probe(dataclasses.replace(cfg, pyramid_iterations=(0, 0, 0))),
    "fuse full": fuse_probe(),
    "fuse no-merge": fuse_probe(do_merge=False),
    "fuse no-append": fuse_probe(do_append=False),
    "fuse assoc-only": fuse_probe(do_merge=False, do_append=False),
    "clean full": clean_probe(),
    "clean no-taps": clean_probe(gather_taps=False),
    "clean no-compact": clean_probe(do_compact=False),
}

for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    out = fn(state0, batch)
    _ = np.asarray(jax.tree.leaves(out)[0])
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = fn(state0, batch)
        _ = np.asarray(jax.tree.leaves(out)[0])
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / NF)
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL", flush=True)
for n in best:
    print(f"  {n:20s} {best[n]:8.1f} ms/frame", flush=True)
