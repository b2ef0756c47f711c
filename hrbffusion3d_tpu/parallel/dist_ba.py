"""Distributed bundle adjustment: landmark-sharded Schur complement with
psum-reduced camera systems.

The north-star distribution component (BASELINE.json / SURVEY §2.14): g2o's
single-threaded sparse Cholesky (Optimizer.cc) becomes, per GN iteration:
  1. each device owns a shard of landmarks + all edges touching them,
  2. locally eliminates its landmark blocks (batched 3x3 inverses) and
     accumulates its partial reduced camera system S_d and gradient rhs_d,
  3. ``lax.psum`` over the mesh combines S = sum_d S_d (the only
     communication: O(C^2 * 36) floats per iteration, riding ICI),
  4. every device solves the (replicated) reduced system and
     back-substitutes its own landmarks locally.

Edges must be pre-partitioned by landmark owner (``partition_problem``);
cameras are replicated (they are tiny).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import ba
from ..core import lie


class ShardedBA(NamedTuple):
    """Landmark-sharded BA problem: leading axes are (D*Ls) / (D*Es) laid
    out device-contiguously; shard_map's P("map") splits them per device."""

    cams: jnp.ndarray        # (C,4,4) replicated
    points: jnp.ndarray      # (D*Ls, 3) sharded landmarks
    obs: jnp.ndarray         # (D*Es, 3)
    cam_idx: jnp.ndarray     # (D*Es,)
    lm_idx: jnp.ndarray      # (D*Es,) LOCAL landmark index within the shard
    info: jnp.ndarray        # (D*Es, 3, 3)
    edge_valid: jnp.ndarray  # (D*Es,)
    fixed: jnp.ndarray       # (C,) replicated
    pair_e: jnp.ndarray      # (D*Ps,) LOCAL edge index of Schur pair lhs
    pair_f: jnp.ndarray      # (D*Ps,) LOCAL edge index of Schur pair rhs
    pair_valid: jnp.ndarray  # (D*Ps,) padding mask (padded pairs alias edge 0)


def partition_problem(prob: ba.BAProblem, n_devices: int) -> ShardedBA:
    """Host-side: block-partition landmarks, route each edge to its
    landmark's owner, pad everything to equal per-device sizes."""
    L = prob.points.shape[0]
    Ls = -(-L // n_devices)
    lm_np = np.asarray(prob.lm_idx)
    owner = lm_np // Ls
    local = lm_np % Ls

    E = lm_np.shape[0]
    counts = np.bincount(owner, minlength=n_devices)
    Es = int(counts.max()) if E else 1

    def padded(arr, fill=0):
        out = np.full((n_devices, Es) + arr.shape[1:], fill, arr.dtype)
        slots = np.zeros(n_devices, int)
        for e in range(E):
            d = owner[e]
            out[d, slots[d]] = arr[e]
            slots[d] += 1
        return out

    pts = np.zeros((n_devices, Ls, 3), np.float32)
    flat = np.asarray(prob.points)
    pts.reshape(-1, 3)[:L] = flat

    # per-shard Schur pair lists over LOCAL edge slots (ba.build_pairs on
    # each shard), padded to a common Ps with pairs aliasing edge 0
    lm_local = padded(local.astype(np.int32))
    valid = padded(np.asarray(prob.edge_valid).astype(np.float32))
    shard_pairs = []
    for d in range(n_devices):
        n_live = int(counts[d]) if d < counts.shape[0] else 0
        pr = ba.build_pairs(np.zeros(n_live, np.int32), lm_local[d, :n_live])
        shard_pairs.append((np.asarray(pr.e), np.asarray(pr.f)))
    Ps = max(1, max(p[0].shape[0] for p in shard_pairs))
    pe = np.zeros((n_devices, Ps), np.int32)
    pf = np.zeros((n_devices, Ps), np.int32)
    pv = np.zeros((n_devices, Ps), np.float32)
    for d, (e_, f_) in enumerate(shard_pairs):
        pe[d, :e_.shape[0]] = e_
        pf[d, :f_.shape[0]] = f_
        pv[d, :e_.shape[0]] = 1.0

    # flatten the device axis: shard_map's P("map") splits the leading
    # axis, so per-device blocks are stored contiguously
    return ShardedBA(
        cams=prob.cams,
        points=jnp.asarray(pts.reshape(n_devices * Ls, 3)),
        obs=jnp.asarray(padded(np.asarray(prob.obs)).reshape(n_devices * Es, 3)),
        cam_idx=jnp.asarray(padded(np.asarray(prob.cam_idx)).reshape(-1)),
        lm_idx=jnp.asarray(padded(local.astype(np.int32)).reshape(-1)),
        info=jnp.asarray(padded(np.asarray(prob.info)).reshape(n_devices * Es, 3, 3)),
        edge_valid=jnp.asarray(valid.reshape(-1)),
        fixed=prob.fixed,
        pair_e=jnp.asarray(pe.reshape(-1)),
        pair_f=jnp.asarray(pf.reshape(-1)),
        pair_valid=jnp.asarray(pv.reshape(-1)),
    )


def _local_iteration(cams, points, obs, cam_idx, lm_idx, info, edge_valid,
                     fixed, pair_e, pair_f, pair_valid, robust: bool,
                     damping: float = 1e-6):
    """Runs inside shard_map: everything except ``cams``/``fixed`` is the
    device-local shard (Ls landmarks, Es edges)."""
    C = cams.shape[0]
    Ls = points.shape[0]

    T = cams[cam_idx]
    X = points[lm_idx]
    p = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    e = obs - p
    J_cam = jnp.concatenate([
        -jnp.broadcast_to(jnp.eye(3), (e.shape[0], 3, 3)), lie.hat(p)
    ], axis=-1)
    J_lm = -T[:, :3, :3]

    chi2 = jnp.einsum("ei,eij,ej->e", e, info, e)
    if robust:
        d = jnp.sqrt(ba.HUBER_DELTA2)
        w = jnp.where(chi2 <= ba.HUBER_DELTA2, 1.0,
                      d / jnp.sqrt(jnp.maximum(chi2, 1e-12)))
    else:
        w = jnp.ones_like(chi2)
    w = w * edge_valid
    Iw = info * w[:, None, None]

    Hcc_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_cam)
    Hll_e = jnp.einsum("eai,eab,ebj->eij", J_lm, Iw, J_lm)
    W_e = jnp.einsum("eai,eab,ebj->eij", J_cam, Iw, J_lm)
    bc_e = -jnp.einsum("eai,eab,eb->ei", J_cam, Iw, e)
    bl_e = -jnp.einsum("eai,eab,eb->ei", J_lm, Iw, e)

    Hcc = jnp.zeros((C, 6, 6)).at[cam_idx].add(Hcc_e)
    bc = jnp.zeros((C, 6)).at[cam_idx].add(bc_e)
    Hll = jnp.zeros((Ls, 3, 3)).at[lm_idx].add(Hll_e)
    bl = jnp.zeros((Ls, 3)).at[lm_idx].add(bl_e)
    Hll_inv = jnp.linalg.inv(Hll + (damping + 1e-12) * jnp.eye(3))

    # edge-pair Schur accumulation (same structure as backend/ba.py
    # _solve_dense): no (C, Ls) dense tensors, O(Ps) per shard
    Y_e = jnp.einsum("eij,ejk->eik", W_e, Hll_inv[lm_idx])  # (Es,6,3)
    contrib = jnp.einsum("pik,pjk->pij", Y_e[pair_e],
                         W_e[pair_f]) * pair_valid[:, None, None]
    S_local = jnp.zeros((C, C, 6, 6)).at[
        cam_idx[pair_e], cam_idx[pair_f]].add(-contrib)
    S_local = S_local.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
    rhs_local = bc - jnp.zeros((C, 6)).at[cam_idx].add(
        jnp.einsum("eik,ek->ei", Y_e, bl[lm_idx]))

    # ---- THE collective: combine partial camera systems over the mesh ----
    S = jax.lax.psum(S_local, "map")
    rhs = jax.lax.psum(rhs_local, "map")
    chi2_total = jax.lax.psum(jnp.sum(chi2 * edge_valid), "map")

    gauge = jnp.where(fixed[:, None], 1e12, 0.0)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        (damping + gauge)[..., None] * jnp.eye(6))
    Sm = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rv = rhs.reshape(6 * C)
    dpre = jnp.sqrt(jnp.abs(jnp.diag(Sm)) + 1e-10)
    x = jnp.linalg.solve(Sm / dpre[:, None] / dpre[None, :], rv / dpre) / dpre
    dx_cam = x.reshape(C, 6)
    dx_cam = jnp.where(jnp.isfinite(dx_cam), dx_cam, 0.0)
    dx_cam = jnp.where(fixed[:, None], 0.0, dx_cam)

    # local landmark back-substitution
    WtDx = jnp.zeros((Ls, 3)).at[lm_idx].add(
        jnp.einsum("eki,ek->ei", W_e, dx_cam[cam_idx]))
    dx_lm = jnp.einsum("lij,lj->li", Hll_inv, bl - WtDx)
    dx_lm = jnp.where(jnp.isfinite(dx_lm), dx_lm, 0.0)

    new_cams = jax.vmap(lambda xi, t: lie.se3_exp(xi) @ t)(dx_cam, cams)
    return new_cams, points + dx_lm, chi2_total


def make_optimizer(mesh: Mesh, iters_robust: int = 5, iters_final: int = 10):
    """Build the jitted shard_map optimizer for a given mesh."""
    rep = P()
    shd = P("map")

    @jax.jit
    def run(sb: ShardedBA):
        # f32-precision contractions (same pin as backend/ba.py)
        with jax.default_matmul_precision("float32"):
            return _run_body(sb)

    def _run_body(sb: ShardedBA):
        def inner(cams, points, obs, cam_idx, lm_idx, info, edge_valid, fixed,
                  pair_e, pair_f, pair_valid):
            def rb(_, carry):
                cams, points, chi = carry
                cams, points, chi = _local_iteration(
                    cams, points, obs, cam_idx, lm_idx, info, edge_valid,
                    fixed, pair_e, pair_f, pair_valid, robust=True)
                return cams, points, chi

            cams, points, chi = jax.lax.fori_loop(
                0, iters_robust, rb, (cams, points, jnp.float32(0)))

            # outlier demotion (local)
            T = cams[cam_idx]
            p = jnp.einsum("eij,ej->ei", T[:, :3, :3], points[lm_idx]) + T[:, :3, 3]
            e = obs - p
            chi2 = jnp.einsum("ei,eij,ej->e", e, info, e)
            ev = edge_valid * ((chi2 <= ba.HUBER_DELTA2) & (p[:, 2] > 0))

            def fin(_, carry):
                cams, points, chi = carry
                cams, points, chi = _local_iteration(
                    cams, points, obs, cam_idx, lm_idx, info, ev, fixed,
                    pair_e, pair_f, pair_valid, robust=False)
                return cams, points, chi

            cams, points, chi = jax.lax.fori_loop(
                0, iters_final, fin, (cams, points, chi))
            return cams, points, chi

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(rep, shd, shd, shd, shd, shd, shd, rep, shd, shd, shd),
            out_specs=(rep, shd, rep),
            check_vma=False,
        )(sb.cams, sb.points, sb.obs, sb.cam_idx, sb.lm_idx, sb.info,
          sb.edge_valid, sb.fixed, sb.pair_e, sb.pair_f, sb.pair_valid)

    return run


def gather_points(points_sharded: jnp.ndarray, n_landmarks: int) -> np.ndarray:
    return np.asarray(points_sharded).reshape(-1, 3)[:n_landmarks]
