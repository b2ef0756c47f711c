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

Numerics (VERDICT r3 next-5): every within-shard segment reduction uses the
same deterministic gather-sum plans as the single-device solver
(backend/reduce_plan.py) — per-shard plans are built host-side, padded to
IDENTICAL shapes across shards (two-pass shared sticky cache), and sharded
over the mesh alongside the edge data, so the only remaining ordering
choice is the ``psum`` tree, which XLA fixes per topology.  The solution is
bit-stable run-to-run on every backend.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..backend import ba, reduce_plan as rp
from ..core import lie


class ShardedBA(NamedTuple):
    """Landmark-sharded BA problem: leading axes are (D*Ls) / (D*Es) laid
    out device-contiguously; shard_map's P("map") splits them per device.
    ``plans``: per-shard deterministic reduction plans (rp.SchurPlans),
    every table stacked device-contiguously on its leading axis."""

    cams: jnp.ndarray        # (C,4,4) replicated
    points: jnp.ndarray      # (D*Ls, 3) sharded landmarks
    obs: jnp.ndarray         # (D*Es, 3)
    cam_idx: jnp.ndarray     # (D*Es,)
    lm_idx: jnp.ndarray      # (D*Es,) LOCAL landmark index within the shard
    info: jnp.ndarray        # (D*Es, 3, 3)
    edge_valid: jnp.ndarray  # (D*Es,)
    fixed: jnp.ndarray       # (C,) replicated
    plans: rp.SchurPlans


def _build_shard_plans(cam_local, lm_local, counts, C, Ls, Es,
                       n_devices) -> rp.SchurPlans:
    """Per-shard Schur plans with IDENTICAL table shapes across shards:
    pass 1 grows a shared sticky-shape cache over every shard, pass 2
    re-pads each shard's plans to the final cache, then tables are stacked
    device-contiguously so shard_map's P('map') hands each device its own
    plan."""
    # the raw plans (incl. build_pairs_np's O(sum d^2) pair enumeration,
    # ~0.35 s at 262k pairs) are shard-invariant across the two passes;
    # only the cheap sticky re-pad runs twice (pass 1 grows the shared
    # shape cache, pass 2 re-pads to its final state) — ADVICE r4
    caches: dict = {}
    raw = []
    for d in range(n_devices):
        n_live = int(counts[d]) if d < len(counts) else 0
        raw.append(rp.build_schur_plans(cam_local[d], lm_local[d], C, Ls,
                                        with_cell=True, n_real=n_live))
    per_pass = []
    for _ in range(2):
        per_pass = [rp.SchurPlans(
            cam=rp.pad_plan_sticky(plans.cam,
                                   caches.setdefault("cam", {}), C, Es,
                                   full_width=True),
            lm=rp.pad_plan_sticky(plans.lm,
                                  caches.setdefault("lm", {}), Ls, Es,
                                  full_width=True),
            cell=rp.pad_cell_plan_sticky(
                plans.cell, caches.setdefault("cell", {}), C * C, Es),
        ) for plans in raw]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *per_pass)


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

    cam_local = padded(np.asarray(prob.cam_idx).astype(np.int32))
    lm_local = padded(local.astype(np.int32))
    valid = padded(np.asarray(prob.edge_valid).astype(np.float32))
    C = prob.cams.shape[0]
    plans = _build_shard_plans(cam_local, lm_local, counts, C, Ls, Es,
                               n_devices)

    # flatten the device axis: shard_map's P("map") splits the leading
    # axis, so per-device blocks are stored contiguously
    return ShardedBA(
        cams=prob.cams,
        points=jnp.asarray(pts.reshape(n_devices * Ls, 3)),
        obs=jnp.asarray(padded(np.asarray(prob.obs)).reshape(n_devices * Es, 3)),
        cam_idx=jnp.asarray(cam_local.reshape(-1)),
        lm_idx=jnp.asarray(lm_local.reshape(-1)),
        info=jnp.asarray(padded(np.asarray(prob.info)).reshape(n_devices * Es, 3, 3)),
        edge_valid=jnp.asarray(valid.reshape(-1)),
        fixed=prob.fixed,
        plans=plans,
    )


def _local_iteration(cams, points, obs, cam_idx, lm_idx, info, edge_valid,
                     fixed, plans: rp.SchurPlans, robust: bool,
                     damping: float = 1e-6):
    """Runs inside shard_map: everything except ``cams``/``fixed`` is the
    device-local shard (Ls landmarks, Es edges, this shard's plans).  All
    segment reductions are deterministic plan applications — no colliding
    scatters anywhere (same numerics as backend/ba.py's single-device
    path)."""
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

    Hcc = rp.apply_plan(plans.cam, Hcc_e, C)
    bc = rp.apply_plan(plans.cam, bc_e, C)
    Hll = rp.apply_plan(plans.lm, Hll_e, Ls)
    bl = rp.apply_plan(plans.lm, bl_e, Ls)
    Hll_inv = jnp.linalg.inv(Hll + (damping + 1e-12) * jnp.eye(3))

    # camera-pair Schur cells as batched matmuls over the cell plan (no
    # (P,6,6) contribution tensor, fixed reduction order)
    Y_e = jnp.einsum("eij,ejk->eik", W_e, Hll_inv[lm_idx])  # (Es,6,3)
    S_local = -rp.apply_cell_plan(plans.cell, Y_e, W_e, C)
    S_local = S_local.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
    rhs_local = bc - rp.apply_plan(
        plans.cam, jnp.einsum("eik,ek->ei", Y_e, bl[lm_idx]), C)

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

    # local landmark back-substitution (deterministic lm-plan reduction)
    WtDx = rp.apply_plan(
        plans.lm, jnp.einsum("eki,ek->ei", W_e, dx_cam[cam_idx]), Ls)
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
        def inner(cams, points, obs, cam_idx, lm_idx, info, edge_valid,
                  fixed, plans):
            def rb(_, carry):
                cams, points, chi = carry
                cams, points, chi = _local_iteration(
                    cams, points, obs, cam_idx, lm_idx, info, edge_valid,
                    fixed, plans, robust=True)
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
                    plans, robust=False)
                return cams, points, chi

            cams, points, chi = jax.lax.fori_loop(
                0, iters_final, fin, (cams, points, chi))
            return cams, points, chi

        plan_spec = jax.tree.map(lambda _: shd, sb.plans)
        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(rep, shd, shd, shd, shd, shd, shd, rep, plan_spec),
            out_specs=(rep, shd, rep),
            check_vma=False,
        )(sb.cams, sb.points, sb.obs, sb.cam_idx, sb.lm_idx, sb.info,
          sb.edge_valid, sb.fixed, sb.plans)

    return run


def gather_points(points_sharded: jnp.ndarray, n_landmarks: int) -> np.ndarray:
    return np.asarray(points_sharded).reshape(-1, 3)[:n_landmarks]
