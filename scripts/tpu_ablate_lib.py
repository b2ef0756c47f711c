"""Shared stage-ablation step factory (see tpu_ablate.py for the method)."""

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.core import lie
from hrbffusion3d_tpu.map import surfel_map as sm
from hrbffusion3d_tpu.ops import preprocess, pyramid, raycast
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry


def make_step(stages: str, intr, cfg):
    """stages: subset of 'pre track render fuse clean predict' (prefix)."""

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
            return state._replace(
                map=m, R=R, t=t, time=time_, prev_intensity=intensity,
                last_icp_error=sink * 1e-20,
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
