"""Loop closing: detection, geometric verification, correction.

TPU-native replacement for ``LoopClosing::Run``
(``Core/src/ORB_SLAM2_m/src/LoopClosing.cc``): BoW candidate scoring
(DetectLoop, l.107-234), 3D-3D robust alignment instead of Sim3 RANSAC
(ComputeSim3, l.236-405 — for RGB-D the scale is fixed s=1, l.74, so the
problem is plain SE(3) Horn alignment + inlier iteration), and CorrectLoop
(l.407-599): add the loop edge, optimise the essential/pose graph, then run
global BA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax.numpy as jnp

from ..core import lie
from . import ba, bow, features, posegraph
from .keyframes import SparseBackend


class LoopCandidate(NamedTuple):
    query_kf: int
    match_kf: int
    score: float
    rel_pose: np.ndarray     # T_match_query: query camera -> match camera
    n_inliers: int


def horn_se3(p: np.ndarray, q: np.ndarray):
    """Closed-form rigid alignment q ~ R p + t (Horn/Umeyama, scale 1)."""
    mp = p.mean(0)
    mq = q.mean(0)
    H = (q - mq).T @ (p - mp)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mq - R @ mp
    return R, t


def robust_se3_3d3d(p: np.ndarray, q: np.ndarray, iters: int = 4,
                    inlier_thresh: float = 0.08):
    """Iterative Horn with inlier re-selection (the RGB-D stand-in for the
    Sim3 RANSAC; correspondences come pre-matched by descriptors)."""
    if p.shape[0] < 6:
        return None
    mask = np.ones(p.shape[0], bool)
    R, t = np.eye(3), np.zeros(3)
    for _ in range(iters):
        if mask.sum() < 6:
            return None
        R, t = horn_se3(p[mask], q[mask])
        res = np.linalg.norm(q - (p @ R.T + t), axis=1)
        mask = res < inlier_thresh
    if mask.sum() < 12:
        return None
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = t
    return T, int(mask.sum())


class LoopCloser:
    """Host-side loop-closure driver over a SparseBackend keyframe graph."""

    def __init__(self, backend: SparseBackend, n_words: int = 512,
                 min_score: float = 0.10, min_inliers: int = 20,
                 consistency: int = 1):
        self.backend = backend
        self.db = bow.BowDatabase(n_words)
        self.min_score = min_score
        self.min_inliers = min_inliers
        # DetectLoop requires the candidate region to be re-detected over
        # ``mnCovisibilityConsistencyTh`` consecutive keyframes
        # (LoopClosing.cc:169-234); consistency=1 disables the wait.
        self.consistency = consistency
        self._consistent_hits: dict[int, int] = {}
        self.loop_edges: list[tuple[int, int, np.ndarray]] = []

    # ------------------------------------------------------------------ #
    def add_keyframe(self, kf_id: int) -> Optional[LoopCandidate]:
        """DetectLoop for the given (already inserted) keyframe; returns a
        verified candidate or None."""
        kf = self.backend.keyframes[kf_id]
        assert self.db.add(jnp.asarray(kf.desc), jnp.asarray(kf.kp_valid)) == kf_id
        scores = self.db.query(kf_id)
        if scores.size == 0:
            return None
        best = int(np.argmax(scores))
        if scores[best] < self.min_score:
            self._consistent_hits.clear()
            return None
        # consistency check over consecutive detections of the same region
        region = best // 3  # coarse region bucket (covisibility stand-in)
        hits = self._consistent_hits.get(region, 0) + 1
        self._consistent_hits = {region: hits}
        if hits < self.consistency:
            return None
        cand = self.backend.keyframes[best]

        # geometric verification: descriptor matches -> 3D-3D alignment
        m = features.match(
            features.Keypoints(
                xy=jnp.asarray(kf.kp_xy), score=jnp.zeros(kf.kp_xy.shape[0]),
                angle=jnp.zeros(kf.kp_xy.shape[0]),
                level=jnp.zeros(kf.kp_xy.shape[0], jnp.int32),
                desc=jnp.asarray(kf.desc), valid=jnp.asarray(kf.kp_valid),
            ),
            features.Keypoints(
                xy=jnp.asarray(cand.kp_xy), score=jnp.zeros(cand.kp_xy.shape[0]),
                angle=jnp.zeros(cand.kp_xy.shape[0]),
                level=jnp.zeros(cand.kp_xy.shape[0], jnp.int32),
                desc=jnp.asarray(cand.desc), valid=jnp.asarray(cand.kp_valid),
            ),
        )
        sel = np.asarray(m.valid) & kf.kp_valid
        idx2 = np.asarray(m.idx2)
        sel &= cand.kp_valid[idx2]
        if sel.sum() < 12:
            return None
        p = kf.kp_cam[sel]
        q = cand.kp_cam[idx2[sel]]
        fit = robust_se3_3d3d(p, q, inlier_thresh=0.08)
        if fit is None:
            return None
        T_cq, n_in = fit           # query-camera point -> candidate-camera
        if n_in < self.min_inliers:
            return None
        return LoopCandidate(
            query_kf=kf_id, match_kf=best, score=float(scores[best]),
            rel_pose=T_cq, n_inliers=n_in,
        )

    # ------------------------------------------------------------------ #
    def correct(self, cand: LoopCandidate, run_global_ba: bool = True):
        """CorrectLoop: pose-graph optimisation with the loop edge, then
        global BA; returns per-keyframe delta transforms for the dense map
        (same contract as SparseBackend.local_ba)."""
        be = self.backend
        K = len(be.keyframes)
        old_poses = np.stack([kf.pose for kf in be.keyframes])

        edges_i, edges_j, meas = [], [], []
        # odometry chain edges from current estimates
        for i in range(K - 1):
            edges_i.append(i)
            edges_j.append(i + 1)
            meas.append(np.linalg.inv(old_poses[i]) @ old_poses[i + 1])
        # loop edge: measured relative pose between match and query cameras.
        # T_match_world^-1 T_query_world == inv(rel) since rel maps query-cam
        # points into match-cam coords: T_mq = T_match^-1 T_query = rel^-1...
        # rel_pose maps q_query -> q_match => T_match_cam<-query_cam = rel
        # and pose_match^-1 @ pose_query should equal rel^-1.
        edges_i.append(cand.match_kf)
        edges_j.append(cand.query_kf)
        meas.append(np.linalg.inv(cand.rel_pose))

        E = len(edges_i)
        info = np.tile(np.eye(6, dtype=np.float32)[None], (E, 1, 1))
        info[-1] *= 10.0  # trust the verified loop edge strongly

        g = posegraph.PoseGraph(
            poses=jnp.asarray(old_poses.astype(np.float32)),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            meas=jnp.asarray(np.stack(meas).astype(np.float32)),
            info=jnp.asarray(info),
            edge_valid=jnp.ones((E,)),
            fixed=jnp.zeros((K,), bool).at[0].set(True),
        )
        g_opt, _ = posegraph.optimize(g, iterations=25)
        new_poses = np.asarray(g_opt.poses)

        # propagate to landmarks (CorrectLoop pose propagation l.450-525):
        # move each landmark with its reference (first-observing) keyframe
        for lid, obs in be.lm_obs.items():
            ref = obs[0][0]
            d = new_poses[ref] @ np.linalg.inv(old_poses[ref])
            X = be.landmarks[lid]
            be.landmarks[lid] = (d[:3, :3] @ X + d[:3, 3]).astype(np.float32)
        for k, kf in enumerate(be.keyframes):
            kf.pose = new_poses[k].astype(np.float32)

        self.loop_edges.append((cand.match_kf, cand.query_kf, cand.rel_pose))

        if run_global_ba:
            deltas_ba = self._global_ba(old_poses)
            if deltas_ba is not None:
                return deltas_ba
        deltas = np.einsum(
            "kij,kjl->kil", new_poses, np.linalg.inv(old_poses)
        ).astype(np.float32)
        return deltas

    # ------------------------------------------------------------------ #
    def _global_ba(self, original_poses: np.ndarray):
        """RunGlobalBundleAdjustment (LoopClosing.cc:659-769): BA over all
        keyframes/landmarks; deltas are vs the poses before pose-graph
        correction (the dense map still sits at those)."""
        be = self.backend
        lm_sel = [lid for lid, obs in be.lm_obs.items() if len(obs) >= 2]
        if len(lm_sel) < 16:
            return None
        lm_index = {lid: k for k, lid in enumerate(lm_sel)}
        K = len(be.keyframes)

        edges_c, edges_l, obs = [], [], []
        for lid in lm_sel:
            for kf_id, kp_i in be.lm_obs[lid]:
                edges_c.append(kf_id)
                edges_l.append(lm_index[lid])
                obs.append(be.keyframes[kf_id].kp_cam[kp_i])
        obs = np.asarray(obs, np.float32)

        cams_tcw = np.stack([np.linalg.inv(kf.pose) for kf in be.keyframes]
                            ).astype(np.float32)
        points = np.stack([be.landmarks[lid] for lid in lm_sel]).astype(np.float32)
        fixed = np.zeros((K,), bool)
        fixed[0] = True

        prob = ba.BAProblem(
            cams=jnp.asarray(cams_tcw), points=jnp.asarray(points),
            obs=jnp.asarray(obs),
            cam_idx=jnp.asarray(edges_c, jnp.int32),
            lm_idx=jnp.asarray(edges_l, jnp.int32),
            info=ba.depth_information(jnp.asarray(obs), be.intr.fx, be.intr.fy,
                                      sigma_px=be.sigma_px),
            edge_valid=jnp.ones((obs.shape[0],), jnp.float32),
            fixed=jnp.asarray(fixed),
        )
        out, _ = ba.optimize(prob)
        new_tcw = np.asarray(out.cams)
        new_points = np.asarray(out.points)

        deltas = np.zeros((K, 4, 4), np.float32)
        for k in range(K):
            new_pose = np.linalg.inv(new_tcw[k])
            deltas[k] = (new_pose @ np.linalg.inv(original_poses[k])).astype(np.float32)
            be.keyframes[k].pose = new_pose
        for lid, k in lm_index.items():
            be.landmarks[lid] = new_points[k]
        return deltas
