"""Deterministic gather-sum reduction plans for bundle adjustment.

Replaces every colliding ``.at[idx].add`` scatter in the Schur-complement
builds (backend/ba.py) with host-precomputed *padded gather tables*: for a
reduction from E sources to T targets, targets are bucketed by in-degree
into a power-of-4 ladder; each bucket is a dense (Tb, D) table of source
indices (padded with a sentinel that points at an appended all-zero row).
The device-side reduction is then  gather -> sum(axis=1) -> unique-index
scatter — a fixed-order, collision-free computation.

Why this exists (VERDICT r3 next-2 and next-5, one mechanism):
  * XLA CPU lowers colliding scatter-adds to a serial loop — the (P,6,6)
    Schur pair scatter measured ~120 ms per GN iteration at P=512k on this
    2-core host (~1.8 s per warm local BA solve, the dominant share of the
    3.7 s/keyframe VERDICT item).  Gather + axis-sum is vectorized and
    streams at memory bandwidth.
  * TPU f32 scatter-add accumulation order cost ~8 mm ATE vs the CPU f32
    backend on the 211-frame protocol (NOTES_R3) — the reason BA was pinned
    to the host.  A gather-sum reduces every segment in a fixed tree order
    on both backends, making on-device BA numerically reproducible.

Reference: the g2o sparse solver this replaces builds the same reduced
camera system with sequential CPU loops (Optimizer.cc:1069-1351); here the
per-landmark elimination structure is preserved but laid out for wide
vector units / the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

# in-degree ladder: bucket D values (power-of-2 keeps gather padding < 2x)
LADDER = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
          32768, 65536, 131072, 262144, 524288, 1048576)


def _pow2(n: int) -> int:
    return max(1, 1 << (int(n - 1).bit_length())) if n > 0 else 1


class ReducePlan(NamedTuple):
    """Bucketed gather tables for one reduction (a pytree of arrays).

    ``tables``: tuple of (idx (Tb,D) int32 into sources [E = zero row],
                          rows (Tb,) int32 into targets [T = dropped]).
    """

    tables: tuple


def build_reduce_plan(ids: np.ndarray, n_targets: int,
                      n_sources: int) -> ReducePlan:
    """Host-side plan build (vectorized NumPy, O(E log E)).

    ``ids``: (R,) target id per *live* source row with R <= n_sources —
    callers pass only the real (non-padding) rows so zero-weight padding
    never inflates bucket widths; table entries index the full padded
    source array.  Sources with the same id are gathered in stable sorted
    order — the reduction order is a pure function of the problem
    structure, identical on every backend."""
    ids = np.asarray(ids)
    order = np.argsort(ids, kind="stable").astype(np.int64)
    counts = np.bincount(ids, minlength=n_targets)
    if counts.shape[0] > n_targets:
        raise ValueError("ids exceed n_targets")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cmax = int(counts.max()) if counts.size else 0
    tables = []
    prev = 0
    for D in LADDER:
        sel = np.flatnonzero((counts > prev) & (counts <= D))
        prev = D
        Tb = _pow2(sel.size)
        ar = np.arange(D)
        if sel.size:
            gpos = (starts[sel][:, None]
                    + np.minimum(ar[None, :], (counts[sel] - 1)[:, None]))
            vals = order[gpos]
            idx = np.where(ar[None, :] < counts[sel][:, None], vals,
                           n_sources)
        else:
            idx = np.zeros((0, D), np.int64)
        idx_p = np.full((Tb, D), n_sources, np.int64)
        idx_p[: sel.size] = idx
        rows = np.full((Tb,), n_targets, np.int64)
        rows[: sel.size] = sel
        tables.append((jnp.asarray(idx_p.astype(np.int32)),
                       jnp.asarray(rows.astype(np.int32))))
        if D >= cmax:
            break
    return ReducePlan(tables=tuple(tables))


def apply_plan(plan: ReducePlan, data: jnp.ndarray, n_targets: int):
    """Deterministic segment reduction: (E, *block) -> (T, *block).

    Each target's sources are summed in a fixed order (gather + axis sum);
    the final scatter has unique target rows (padding rows drop).

    The gather runs on FLATTENED rows: a (6,6) or (6,3) block gather tiles
    both minor dims to the TPU's (8,128) layout — up to ~21x padding — while
    a flat 36-wide row gather pads once to 128 (the NOTES_R4 rule: never
    gather tiny-minor-dim multi-axis blocks; gather flat rows and slice).
    Summation order is unchanged (reshape is bitwise-neutral), so CPU/TPU
    numerics and the bit-stability guarantees are untouched."""
    block = data.shape[1:]
    flat = data.reshape(data.shape[0], -1)
    z = jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), data.dtype)])
    out = jnp.zeros((n_targets, flat.shape[1]), data.dtype)
    for idx, rows in plan.tables:
        out = out.at[rows].add(z[idx].sum(axis=1), mode="drop",
                               unique_indices=True)
    return out.reshape((n_targets,) + block)


class CellPlan(NamedTuple):
    """Schur camera-pair reduction plan: for every camera-pair cell (a,b),
    the (e,f) edge pairs contributing Y_e W_f^T, as bucketed gather tables
    over EDGE indices (so the (P,6,6) contribution tensor is never
    materialized — the pair product contracts inside a batched matmul).

    ``tables``: tuple of (pe (Tb,D), pf (Tb,D), rows (Tb,) int32 cell ids).
    """

    tables: tuple


def build_cell_plan(cam_idx: np.ndarray, lm_idx: np.ndarray,
                    n_cams: int, n_edges: int,
                    n_real: int | None = None) -> CellPlan:
    """Pairs (e,f) share a landmark; cell id = cam[e] * C + cam[f].
    Only the first ``n_real`` edges generate pairs (padding edges carry
    zero weight and would otherwise bloat cell (0,0))."""
    if n_real is not None:
        cam_idx = np.asarray(cam_idx)[:n_real]
        lm_idx = np.asarray(lm_idx)[:n_real]
    pe, pf = build_pairs_np(lm_idx)
    cam = np.asarray(cam_idx).astype(np.int64)
    cells = cam[pe] * n_cams + cam[pf]
    plan = build_reduce_plan(cells, n_cams * n_cams, pe.shape[0])
    pe_ext = np.concatenate([pe, [n_edges]]).astype(np.int32)
    pf_ext = np.concatenate([pf, [n_edges]]).astype(np.int32)
    tables = []
    for idx, rows in plan.tables:
        idx_np = np.asarray(idx)
        tables.append((jnp.asarray(pe_ext[idx_np]),
                       jnp.asarray(pf_ext[idx_np]), rows))
    return CellPlan(tables=tuple(tables))


def apply_cell_plan(cell: CellPlan, Y_e: jnp.ndarray, W_e: jnp.ndarray,
                    n_cams: int):
    """S_off[a,b] = sum_{(e,f) in cell} Y_e W_f^T as batched matmuls:
    (Tb, 6, 3D) @ (Tb, 3D, 6) per bucket — MXU-shaped on TPU, vectorized
    on CPU, deterministic reduction order everywhere."""
    # flat-row gathers (18-wide), reshaped to blocks only for the einsum —
    # a direct (6,3)-block gather tiles both minor dims to (8,128) on TPU
    # (see apply_plan; summation order unchanged)
    Yz = jnp.concatenate([Y_e.reshape(-1, 18),
                          jnp.zeros((1, 18), Y_e.dtype)])
    Wz = jnp.concatenate([W_e.reshape(-1, 18),
                          jnp.zeros((1, 18), W_e.dtype)])
    S = jnp.zeros((n_cams * n_cams, 6, 6), Y_e.dtype)
    for pe, pf, rows in cell.tables:
        Yg = Yz[pe].reshape(pe.shape + (6, 3))   # (Tb, D, 6, 3)
        Wg = Wz[pf].reshape(pf.shape + (6, 3))
        Sc = jnp.einsum("tdik,tdjk->tij", Yg, Wg)
        S = S.at[rows].add(Sc, mode="drop", unique_indices=True)
    return S.reshape(n_cams, n_cams, 6, 6)


def build_pairs_np(lm_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered edge pairs sharing a landmark — vectorized NumPy
    (replaces the per-landmark Python loop of the old ba.build_pairs,
    which cost ~0.35 s at P=262k)."""
    lm = np.asarray(lm_idx).astype(np.int64)
    E = lm.shape[0]
    if E == 0:
        return (np.zeros((0,), np.int64),) * 2
    order = np.argsort(lm, kind="stable")
    lm_sorted = lm[order]
    is_start = np.r_[True, lm_sorted[1:] != lm_sorted[:-1]]
    starts = np.flatnonzero(is_start)
    d = np.diff(np.r_[starts, E])                       # group sizes
    reps = d * d
    P = int(reps.sum())
    g = np.repeat(np.arange(d.shape[0]), reps)          # group of each pair
    base = np.repeat(np.cumsum(reps) - reps, reps)
    p_local = np.arange(P) - base
    dg = d[g]
    sg = starts[g]
    e = order[sg + p_local // dg]
    f = order[sg + p_local % dg]
    return e, f


def pad_plan_sticky(plan: ReducePlan, cache: dict, n_targets: int,
                    n_sources: int, full_width: bool = False) -> ReducePlan:
    """Pad a plan's tables to session-sticky shapes (VERDICT r3 next-2,
    production form): the raw bucket shapes (rung set, per-rung Tb) are a
    function of the live degree distribution, so a growing keyframe run
    changed them EVERY call — and since plan arrays are jit inputs, their
    shapes key the compiled optimizer: local BA recompiled per keyframe
    (~3.5-4.4 s/kf measured on the 2-core host; the warm solve itself is
    0.17 s).  This pads every table up to the session maximum seen so far
    (``cache``: dict D -> Tb, owned by the caller), and emits empty tables
    for previously-seen rungs — shapes grow monotonically and converge, so
    compiles happen only on growth (a handful per run).

    Padding rows gather the appended zero source row (idx = n_sources) and
    scatter out of bounds (row = n_targets, dropped by mode='drop').

    ``full_width``: pad every rung's Tb straight to pow2(n_targets) — the
    strongest stickiness (shape depends only on the rung set and the
    target bucket).  Use where n_targets is small (camera/landmark plans:
    the padded rows gather the zero source row, ~free); the cell plan's
    n_targets = C^2 makes this too wasteful there."""
    rungs = {int(idx.shape[1]): (idx, rows) for idx, rows in plan.tables}
    tb_full = _pow2(n_targets)
    for D, (idx, rows) in rungs.items():
        cache[D] = (tb_full if full_width
                    else max(cache.get(D, 0), idx.shape[0]))
    tables = []
    for D in sorted(cache):
        Tb = cache[D]
        if D in rungs:
            idx, rows = rungs[D]
            pad = Tb - idx.shape[0]
            if pad > 0:
                idx = jnp.concatenate(
                    [idx, jnp.full((pad, D), n_sources, jnp.int32)])
                rows = jnp.concatenate(
                    [rows, jnp.full((pad,), n_targets, jnp.int32)])
        else:
            idx = jnp.full((Tb, D), n_sources, jnp.int32)
            rows = jnp.full((Tb,), n_targets, jnp.int32)
        tables.append((idx, rows))
    return ReducePlan(tables=tuple(tables))


def pad_cell_plan_sticky(cell: CellPlan, cache: dict, n_cells: int,
                         n_edges: int, min_tb: int = 64) -> CellPlan:
    """Sticky-shape padding for the camera-pair cell plan (see
    pad_plan_sticky); padding pairs alias the appended zero edge row and
    scatter out of bounds.  ``min_tb`` floors every rung's Tb: the cell
    counts per rung start tiny (1, 2, 4 ...) and their pow2 buckets flipped
    on nearly every keyframe — the floor absorbs that churn at the price of
    <=min_tb*D zero-row pair products per rung (cheap batched matmuls)."""
    rungs = {int(pe.shape[1]): (pe, pf, rows) for pe, pf, rows in cell.tables}
    for D, (pe, _, _) in rungs.items():
        cache[D] = max(cache.get(D, 0), pe.shape[0], min_tb)
    tables = []
    for D in sorted(cache):
        Tb = cache[D]
        if D in rungs:
            pe, pf, rows = rungs[D]
            pad = Tb - pe.shape[0]
            if pad > 0:
                pe = jnp.concatenate(
                    [pe, jnp.full((pad, D), n_edges, jnp.int32)])
                pf = jnp.concatenate(
                    [pf, jnp.full((pad, D), n_edges, jnp.int32)])
                rows = jnp.concatenate(
                    [rows, jnp.full((pad,), n_cells, jnp.int32)])
        else:
            pe = jnp.full((Tb, D), n_edges, jnp.int32)
            pf = jnp.full((Tb, D), n_edges, jnp.int32)
            rows = jnp.full((Tb,), n_cells, jnp.int32)
        tables.append((pe, pf, rows))
    return CellPlan(tables=tuple(tables))


class SchurPlans(NamedTuple):
    """Everything ba.optimize needs for scatter-free GN: per-camera and
    per-landmark reduction plans, plus the camera-pair cell plan (dense
    solver only; ``cell.tables`` is empty for the CG path)."""

    cam: ReducePlan
    lm: ReducePlan
    cell: CellPlan


def build_schur_plans(cam_idx, lm_idx, n_cams: int, n_lms: int,
                      with_cell: bool = True,
                      n_real: int | None = None) -> SchurPlans:
    """``n_real``: number of live (non-padding) edges — padding rows are
    excluded from every gather table (their contributions are zero)."""
    cam_np = np.asarray(cam_idx)
    lm_np = np.asarray(lm_idx)
    E = cam_np.shape[0]
    R = E if n_real is None else n_real
    cell = (build_cell_plan(cam_np, lm_np, n_cams, E, n_real=R)
            if with_cell else CellPlan(tables=()))
    return SchurPlans(
        cam=build_reduce_plan(cam_np[:R], n_cams, E),
        lm=build_reduce_plan(lm_np[:R], n_lms, E),
        cell=cell,
    )
