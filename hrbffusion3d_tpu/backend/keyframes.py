"""Keyframe / submap backend: sparse map, local BA, dense-map correction.

TPU-native replacement for the reference's ORB_SLAM2_m LocalMapping thread +
the submap machinery in HRBFFusion (SURVEY §2.9):
  - ``NeedNewSubMap`` (HRBFFusion.cpp:289-335): keyframe every
    ``keyframe_period`` frames;
  - ``ConstructSubmaps`` (l.337-446): match new keyframe against the last
    keyframes, create landmarks from depth;
  - ``LocalMapping::Run`` + ``Optimizer::LocalBundleAdjustment3D``: local BA
    over a window of recent keyframes with 3-D edges (backend/ba.py);
  - ``UpdateDenseGlobalModel`` (l.448-506): per-submap rigid delta
    transforms handed to ``surfel_map.apply_submap_deltas``.

Threading model: the reference blocks the tracking thread on a condvar until
LocalMapping finishes BA (HRBFFusion.cpp:1154-1157).  Here the backend is an
explicit host-side object invoked synchronously between track and fuse;
the matching matrix and BA iterations are jitted device work, the (tiny)
landmark bookkeeping is numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from . import ba, features


@dataclasses.dataclass
class Keyframe:
    kf_id: int
    frame_time: int
    pose: np.ndarray                 # (4,4) Twc (world <- camera)
    kp_xy: np.ndarray                # (N,2)
    kp_cam: np.ndarray               # (N,3) camera-frame 3D (depth unproject)
    desc: np.ndarray                 # (N,8) uint32
    kp_valid: np.ndarray             # (N,) bool (has descriptor + depth)
    landmark_ids: np.ndarray         # (N,) int64, -1 = none


class SparseBackend:
    """Keyframe graph + landmark store + local BA driver."""

    def __init__(self, intr: CameraIntrinsics, cfg: SLAMConfig,
                 n_features: int = 1024, local_window: int = 5,
                 fast_threshold: float = 12.0, sigma_px: float = 1.0,
                 mesh=None):
        self.intr = intr
        self.cfg = cfg
        self.n_features = n_features
        self.local_window = local_window
        self.fast_threshold = fast_threshold
        # keypoint localisation noise fed to the information matrices; the
        # reference uses the ORB octave sigma (Optimizer.cc:1217)
        self.sigma_px = sigma_px
        # optional jax.sharding.Mesh: run local BA with the landmark-sharded
        # distributed Schur solver (parallel/dist_ba.py) instead of the
        # single-device one
        self.mesh = mesh
        self._dist_opt = None
        self.keyframes: list[Keyframe] = []
        self.landmarks: dict[int, np.ndarray] = {}      # id -> world (3,)
        self.lm_obs: dict[int, list[tuple[int, int]]] = {}  # id -> [(kf, kp)]
        self._next_lm = 0

    # ------------------------------------------------------------------ #
    def need_new_keyframe(self, time: int) -> bool:
        """NeedNewSubMap: every cfg.keyframe_period frames
        (HRBFFusion.cpp:289-335; the adaptive motion rule is commented out
        there too)."""
        if not self.keyframes:
            return True
        return (time - self.keyframes[-1].frame_time) >= self.cfg.keyframe_period

    # ------------------------------------------------------------------ #
    def _extract(self, intensity: jnp.ndarray, depth: jnp.ndarray):
        kp = features.detect_and_describe(
            intensity, n_per_level=self.n_features // 4,
            threshold=self.fast_threshold,
        )
        xy = np.asarray(kp.xy)
        valid = np.asarray(kp.valid)
        d = np.asarray(depth)
        # bilinear depth at the sub-pixel keypoint (reference re-reads depths
        # from the filtered GPU depth map, HRBFFusion.cpp:578-594)
        x0 = np.clip(np.floor(xy[:, 0]).astype(int), 0, self.intr.width - 2)
        y0 = np.clip(np.floor(xy[:, 1]).astype(int), 0, self.intr.height - 2)
        ax = np.clip(xy[:, 0] - x0, 0, 1)
        ay = np.clip(xy[:, 1] - y0, 0, 1)
        d00, d01 = d[y0, x0], d[y0, x0 + 1]
        d10, d11 = d[y0 + 1, x0], d[y0 + 1, x0 + 1]
        z = (d00 * (1 - ax) * (1 - ay) + d01 * ax * (1 - ay)
             + d10 * (1 - ax) * ay + d11 * ax * ay)
        all_pos = (d00 > 0) & (d01 > 0) & (d10 > 0) & (d11 > 0)
        z = np.where(all_pos, z, d[np.round(xy[:, 1]).astype(int).clip(0, self.intr.height - 1),
                                   np.round(xy[:, 0]).astype(int).clip(0, self.intr.width - 1)])
        has_depth = (z > self.cfg.depth_min) & (z <= self.cfg.depth_cutoff)
        cam = np.stack([
            (xy[:, 0] - self.intr.cx) * z / self.intr.fx,
            (xy[:, 1] - self.intr.cy) * z / self.intr.fy,
            z,
        ], axis=-1)
        return kp, xy, cam, valid & has_depth

    # ------------------------------------------------------------------ #
    def insert_keyframe(self, intensity: jnp.ndarray, depth: jnp.ndarray,
                        pose: np.ndarray, time: int) -> int:
        """ConstructSubmaps: extract, associate to the previous keyframe's
        landmarks, create new landmarks from depth (HRBFFusion.cpp:383-438).
        Returns the new keyframe id (== submap index)."""
        kp, xy, cam, valid = self._extract(intensity, depth)
        kf_id = len(self.keyframes)
        lm_ids = np.full((xy.shape[0],), -1, np.int64)

        # match against the last few keyframes (SearchInNeighbors,
        # LocalMapping.cc:78) so new keyframes tie directly to older,
        # well-constrained poses instead of only chaining through the last
        for prev in self.keyframes[-3:][::-1]:
            m = features.match(
                kp,
                features.Keypoints(
                    xy=jnp.asarray(prev.kp_xy), score=jnp.zeros(prev.kp_xy.shape[0]),
                    angle=jnp.zeros(prev.kp_xy.shape[0]),
                    level=jnp.zeros(prev.kp_xy.shape[0], jnp.int32),
                    desc=jnp.asarray(prev.desc),
                    valid=jnp.asarray(prev.kp_valid),
                ),
            )
            midx = np.asarray(m.idx2)
            mval = np.asarray(m.valid) & valid & (lm_ids < 0)
            for i in np.nonzero(mval)[0]:
                j = midx[i]
                lid = prev.landmark_ids[j]
                if lid >= 0:
                    lm_ids[i] = lid
                    self.lm_obs[lid].append((kf_id, int(i)))

        # new landmarks from depth for unmatched valid keypoints
        R, t = pose[:3, :3], pose[:3, 3]
        for i in np.nonzero(valid & (lm_ids < 0))[0]:
            lid = self._next_lm
            self._next_lm += 1
            self.landmarks[lid] = R @ cam[i] + t
            self.lm_obs[lid] = [(kf_id, int(i))]
            lm_ids[i] = lid

        self.keyframes.append(Keyframe(
            kf_id=kf_id, frame_time=time, pose=pose.copy(),
            kp_xy=xy, kp_cam=cam, desc=np.asarray(kp.desc),
            kp_valid=valid, landmark_ids=lm_ids,
        ))
        return kf_id

    # ------------------------------------------------------------------ #
    def local_ba(self) -> Optional[np.ndarray]:
        """Local bundle adjustment over the last ``local_window`` keyframes
        (earlier ones fixed), returning per-submap delta transforms
        delta_k = pose_new_k @ pose_old_k^-1 (UpdateDenseGlobalModel
        semantics, HRBFFusion.cpp:457-499) or None if not enough data."""
        if len(self.keyframes) < 2:
            return None
        win = self.keyframes[-self.local_window:]
        win_ids = {kf.kf_id for kf in win}

        # collect landmarks observed by the window with >= 2 observations
        lm_sel = []
        for kf in win:
            for lid in kf.landmark_ids:
                if lid >= 0 and len(self.lm_obs[lid]) >= 2:
                    lm_sel.append(lid)
        lm_sel = sorted(set(lm_sel))
        if len(lm_sel) < 8:
            return None
        lm_index = {lid: k for k, lid in enumerate(lm_sel)}

        # cameras: window + any fixed keyframe observing a selected landmark
        cam_ids = set(win_ids)
        for lid in lm_sel:
            for kf_id, _ in self.lm_obs[lid]:
                cam_ids.add(kf_id)
        cam_ids = sorted(cam_ids)
        cam_index = {c: k for k, c in enumerate(cam_ids)}
        # gauge: fix everything outside the window, and the oldest window KF
        fixed = np.array([
            (c not in win_ids) or (c == min(win_ids)) for c in cam_ids
        ])
        if fixed.all():
            return None

        edges_c, edges_l, obs = [], [], []
        for lid in lm_sel:
            for kf_id, kp_i in self.lm_obs[lid]:
                kf = self.keyframes[kf_id]
                edges_c.append(cam_index[kf_id])
                edges_l.append(lm_index[lid])
                obs.append(kf.kp_cam[kp_i])
        obs = np.asarray(obs, np.float32)

        # Tcw for the solver (ORB-SLAM convention)
        cams_tcw = np.stack([
            np.linalg.inv(self.keyframes[c].pose) for c in cam_ids
        ]).astype(np.float32)
        points = np.stack([self.landmarks[lid] for lid in lm_sel]).astype(np.float32)

        prob = ba.BAProblem(
            cams=jnp.asarray(cams_tcw),
            points=jnp.asarray(points),
            obs=jnp.asarray(obs),
            cam_idx=jnp.asarray(edges_c, jnp.int32),
            lm_idx=jnp.asarray(edges_l, jnp.int32),
            info=ba.depth_information(jnp.asarray(obs), self.intr.fx,
                                      self.intr.fy, sigma_px=self.sigma_px),
            edge_valid=jnp.ones((obs.shape[0],), jnp.float32),
            fixed=jnp.asarray(fixed),
        )
        if self.mesh is not None:
            from ..parallel import dist_ba

            if self._dist_opt is None:
                self._dist_opt = dist_ba.make_optimizer(self.mesh)
            sb = dist_ba.partition_problem(prob, self.mesh.devices.size)
            cams_d, points_d, _ = self._dist_opt(sb)
            new_tcw = np.asarray(cams_d)
            new_points = dist_ba.gather_points(points_d, len(lm_sel))
        else:
            out, _ = ba.optimize(prob)
            new_tcw = np.asarray(out.cams)
            new_points = np.asarray(out.points)

        # write back + build dense-map deltas
        deltas = np.tile(np.eye(4, dtype=np.float32),
                         (len(self.keyframes), 1, 1))
        for c, k in cam_index.items():
            old_pose = self.keyframes[c].pose
            new_pose = np.linalg.inv(new_tcw[k])
            deltas[c] = (new_pose @ np.linalg.inv(old_pose)).astype(np.float32)
            self.keyframes[c].pose = new_pose
        for lid, k in lm_index.items():
            self.landmarks[lid] = new_points[k]
        return deltas

    # ------------------------------------------------------------------ #
    def covisible_keyframes(self, kf_id: int, min_shared: int = 15) -> list[int]:
        """Covisibility neighbours (KeyFrame::GetVectorCovisibleKeyFrames):
        keyframes sharing >= min_shared landmarks — the active-submap set
        that masks dense fusion/cleaning (HRBFFusion.cpp:1160-1170)."""
        counts: dict[int, int] = {}
        kf = self.keyframes[kf_id]
        for lid in kf.landmark_ids:
            if lid < 0:
                continue
            for other, _ in self.lm_obs[lid]:
                if other != kf_id:
                    counts[other] = counts.get(other, 0) + 1
        return [k for k, c in sorted(counts.items()) if c >= min_shared]

    def active_submap_mask(self, kf_id: int, max_submaps: int) -> np.ndarray:
        active = np.zeros((max_submaps,), bool)
        active[kf_id] = True
        for k in self.covisible_keyframes(kf_id):
            active[k] = True
        return active

    def keyframe_trajectory(self):
        """(times, poses) for SaveKeyFrameTrajectoryTUM parity."""
        return (
            [kf.frame_time for kf in self.keyframes],
            np.stack([kf.pose for kf in self.keyframes])
            if self.keyframes else np.zeros((0, 4, 4)),
        )
