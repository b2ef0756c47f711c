"""Pallas TPU kernels for the stencil-heavy preprocessing passes.

The XLA formulations in ops/preprocess.py materialise (H, W, taps)
patch tensors in HBM (bilateral: 169 taps -> ~200 MB of traffic; measured
~55 ms on a v5e chip).  These kernels keep the window entirely in VMEM:
inputs are overlap-expanded into row blocks with halos on the XLA side
(one cheap strided copy), each grid step loads its (BH + 2R, W) block into
VMEM once and accumulates all taps from there — traffic drops to ~the
image size.

Kernel structure note: Mosaic requires statically-provable sublane
alignment for dynamic slices (dynamic ``pl.ds`` row starts fail with
"cannot statically prove that index ... is a multiple of 8"), so the
window loops are fully static — the compiler handles arbitrary static
offsets via sublane rotations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera
from . import hrbf
from .preprocess import CurvatureResult, VertexNormalRadius, _smallest_eigvec_3x3, surfel_radius

_BH = 8  # rows per grid block (Mosaic stack-allocates unrolled-tap temps; 16 rows x 49-tap x 10 accumulators exceeded the 16 MB scoped VMEM)


def _expand_rows(x: jnp.ndarray, bh: int, r: int) -> jnp.ndarray:
    """(H + 2r, W[, C]) padded input -> (NB, bh + 2r, W[, C]) overlapping row
    blocks (the halo copy XLA performs once, so BlockSpecs stay disjoint)."""
    h = x.shape[0] - 2 * r
    nb = -(-h // bh)
    pad_rows = nb * bh + 2 * r - x.shape[0]
    if pad_rows:
        x = jnp.pad(x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1))
    return jnp.stack([x[i * bh: i * bh + bh + 2 * r] for i in range(nb)])


def _unexpand(y: jnp.ndarray, h: int) -> jnp.ndarray:
    """(NB, bh, W[, C]) -> (H, W[, C])."""
    nb, bh = y.shape[0], y.shape[1]
    return y.reshape((nb * bh,) + y.shape[2:])[:h]


# ---------------------------------------------------------------------- #
# bilateral filter
# ---------------------------------------------------------------------- #

def _bilateral_kernel(din_ref, out_ref, *, R, W, SS, SC):
    D = 2 * R + 1
    bh = out_ref.shape[1]
    d = din_ref[0, R:R + bh, R:R + W]

    num = jnp.zeros((bh, W), jnp.float32)
    den = jnp.zeros((bh, W), jnp.float32)
    for dy in range(D):
        row = din_ref[0, dy:dy + bh, :]
        for dx in range(D):
            nb = row[:, dx:dx + W]
            space2 = float((dy - R) ** 2 + (dx - R) ** 2)
            w = jnp.exp(-(space2 * SS + (d - nb) ** 2 * SC)) * (nb > 0)
            num = num + nb * w
            den = den + w
    out_ref[0, :, :] = jnp.where(d > 0, num / jnp.maximum(den, 1e-12), 0.0)


def bilateral_filter(depth: jnp.ndarray, cfg: SLAMConfig,
                     interpret: bool = False) -> jnp.ndarray:
    """depth_bilateral.frag semantics (see preprocess.bilateral_filter).

    Matches the XLA version except that invalid (zero) neighbors are
    excluded from the denominator via the (nb > 0) mask — out-of-image
    padding and invalid depths are both zero here, which also reproduces
    the shader's clamped loop."""
    R = 6
    h, w = depth.shape
    d = jnp.where((depth > cfg.depth_min) & (depth <= cfg.depth_cutoff), depth, 0.0)
    blocks = _expand_rows(jnp.pad(d, R), _BH, R)
    nb = blocks.shape[0]
    kern = functools.partial(_bilateral_kernel, R=R, W=w,
                             SS=0.024691358, SC=555.556)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, _BH + 2 * R, w + 2 * R),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _BH, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _BH, w), jnp.float32),
        interpret=interpret,
    )(blocks)
    return _unexpand(out, h)


# ---------------------------------------------------------------------- #
# PCA normals
# ---------------------------------------------------------------------- #

def _pca_kernel(vin_ref, out_ref, *, R, W, depth_min):
    D = 2 * R + 1
    bh = out_ref.shape[1]
    cz = vin_ref[0, 2, R:R + bh, R:R + W]

    zero = jnp.zeros((bh, W), jnp.float32)
    (sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, cnt) = (zero,) * 10
    for dy in range(D):
        rx = vin_ref[0, 0, dy:dy + bh, :]
        ry = vin_ref[0, 1, dy:dy + bh, :]
        rz = vin_ref[0, 2, dy:dy + bh, :]
        for dx in range(D):
            nx = rx[:, dx:dx + W]
            ny = ry[:, dx:dx + W]
            nz = rz[:, dx:dx + W]
            ok = (nz > depth_min) & (jnp.abs(nz - cz) < 0.05)
            m = ok.astype(jnp.float32)
            sx += nx * m
            sy += ny * m
            sz += nz * m
            sxx += nx * nx * m
            sxy += nx * ny * m
            sxz += nx * nz * m
            syy += ny * ny * m
            syz += ny * nz * m
            szz += nz * nz * m
            cnt += m
    # emit the raw moment sums; the eigen solve (atan2 — not lowered by
    # Mosaic) runs as cheap elementwise XLA outside the kernel
    for i, val in enumerate((sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, cnt)):
        out_ref[0, :, :, i] = val


def normal_pca(vertex_f: jnp.ndarray, cfg: SLAMConfig,
               interpret: bool = False) -> jnp.ndarray:
    """PCA normal estimation (geometry.glsl:190-244), Pallas version of
    preprocess.normal_pca."""
    R = 3
    h, w = vertex_f.shape[:2]
    # channels-first so each channel is a clean 2-D VMEM plane
    vcf = jnp.moveaxis(jnp.pad(vertex_f, [(R, R), (R, R), (0, 0)]), -1, 0)
    blocks = jnp.stack([
        _expand_rows(vcf[c], _BH, R) for c in range(3)
    ], axis=1)  # (NB, 3, BH+2R, W+2R)
    nb = blocks.shape[0]
    kern = functools.partial(_pca_kernel, R=R, W=w, depth_min=cfg.depth_min)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 3, _BH + 2 * R, w + 2 * R),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _BH, w, 10), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _BH, w, 10), jnp.float32),
        interpret=interpret,
    )(blocks)
    acc = _unexpand(out, h)
    sx, sy, sz = acc[..., 0], acc[..., 1], acc[..., 2]
    sxx, sxy, sxz = acc[..., 3], acc[..., 4], acc[..., 5]
    syy, syz, szz = acc[..., 6], acc[..., 7], acc[..., 8]
    cnt = acc[..., 9]
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    mx, my, mz = sx * inv, sy * inv, sz * inv
    A = jnp.stack([
        jnp.stack([sxx * inv - mx * mx, sxy * inv - mx * my, sxz * inv - mx * mz], -1),
        jnp.stack([sxy * inv - mx * my, syy * inv - my * my, syz * inv - my * mz], -1),
        jnp.stack([sxz * inv - mx * mz, syz * inv - my * mz, szz * inv - mz * mz], -1),
    ], -2)
    n = _smallest_eigvec_3x3(A)
    n = n * jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    cz = vertex_f[..., 2]
    ok = (cnt >= 8) & (cz > cfg.depth_min)
    return jnp.where(ok[..., None], n, 0.0)


# ---------------------------------------------------------------------- #
# HRBF raycast (predict_hrbf.frag) — fused ladder + bisection + gradient
# ---------------------------------------------------------------------- #

def _ring_taps(radius: int):
    """Window offsets in ring (Chebyshev) order — must match
    raycast._ring_offsets exactly (frag's ring-by-ring collection)."""
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)]
    offs.sort(key=lambda o: (max(abs(o[0]), abs(o[1])), o[0], o[1]))
    return offs


def _raycast_kernel(attr_ref, out_ref, *, R, W, BH, K, KMIN, CONF_T,
                    STEPS, STEP, BIS, FX, FY, CX, CY, TAPSTACK=True,
                    G_OFFS=None, KSEC_B=1, KSEC_P=0, FP=0):
    """Per-block HRBF raycast with the neighbor window in VMEM.

    attr channels (channels-first): 0:3 pos | 3:6 nrm | 6 conf | 7 radius
    | 8 valid.  Outputs (channels-first): 0:3 p_surf | 3:6 grad-normal
    (unnormalised) | 6 nearest ring-tap index | 7 found.

    The XLA path (ops/raycast.predict_hrbf) re-reads the (P, 49, 12)
    neighbor patches from HBM for every ladder level and bisection
    iteration (~61x, ~44 GB of traffic per frame); here each grid block
    reads its (BH+2R, W+2R, 9) halo once and every evaluation hits VMEM.
    """
    taps = _ring_taps(R)
    pid = pl.program_id(0)

    def ch(c, dy, dx):
        return attr_ref[0, c, R + dy:R + dy + BH, R + dx:R + dx + W]

    # ---- viewing rays (frag: unproject pixel, normalise) ----
    # (Mosaic iota must be integer-typed)
    xg = jax.lax.broadcasted_iota(jnp.int32, (BH, W), 1).astype(jnp.float32)
    yg = jax.lax.broadcasted_iota(jnp.int32, (BH, W), 0).astype(jnp.float32) \
        + (pid * BH).astype(jnp.float32)
    rx = (xg - CX) / FX
    ry = (yg - CY) / FY
    rn = jax.lax.rsqrt(rx * rx + ry * ry + 1.0)
    rx, ry, rz = rx * rn, ry * rn, rn

    # ---- pass 1: stability filter + ring-order K cap + t0.  With
    # TAPSTACK the per-tap channels are materialised ONCE as kernel-local
    # stacks (sublane/lane-rotated copies happen here only); otherwise every
    # f-evaluation re-slices the halo block.
    sel = []                                  # (BH, W) f32 masks per tap
    tap_px, tap_py, tap_pz = [], [], []       # position
    tap_cx, tap_cy, tap_cz = [], [], []       # normal * HERMITE_SCALE
    tap_T2, tap_iT2 = [], []                  # support^2, 1/max(support^2,eps)
    cnt = jnp.zeros((BH, W), jnp.float32)
    t0 = jnp.full((BH, W), 1e6, jnp.float32)
    for dy, dx in taps:
        px, py, pz = ch(0, dy, dx), ch(1, dy, dx), ch(2, dy, dx)
        nx, ny, nz = ch(3, dy, dx), ch(4, dy, dx), ch(5, dy, dx)
        ok = (
            (attr_ref[0, 8, R + dy:R + dy + BH, R + dx:R + dx + W] > 0.5)
            & (pz > 0.1)
            & (nx * nx + ny * ny + nz * nz > 0.01)
            & (ch(6, dy, dx) >= CONF_T)
            & (nz > 0.0)
        )
        s = ok & (cnt < K)
        cnt += ok.astype(jnp.float32)
        sel.append(s.astype(jnp.float32))
        proj = jnp.abs(px * rx + py * ry + pz * rz)
        t0 = jnp.where(s > 0, jnp.minimum(t0, proj), t0)
        if TAPSTACK:
            T = ch(7, dy, dx)
            T2 = T * T
            tap_px.append(px)
            tap_py.append(py)
            tap_pz.append(pz)
            tap_cx.append(hrbf.HERMITE_SCALE * nx)
            tap_cy.append(hrbf.HERMITE_SCALE * ny)
            tap_cz.append(hrbf.HERMITE_SCALE * nz)
            tap_T2.append(T2)
            tap_iT2.append(1.0 / jnp.maximum(T2, 1e-12))
    n_nb = sum(sel)                           # number selected (<= K)

    def tap_data(j):
        """(px, py, pz, cx, cy, cz, T2, iT2) of ring tap j."""
        if TAPSTACK:
            return (tap_px[j], tap_py[j], tap_pz[j], tap_cx[j], tap_cy[j],
                    tap_cz[j], tap_T2[j], tap_iT2[j])
        dy, dx = taps[j]
        T = ch(7, dy, dx)
        T2 = T * T
        return (ch(0, dy, dx), ch(1, dy, dx), ch(2, dy, dx),
                hrbf.HERMITE_SCALE * ch(3, dy, dx),
                hrbf.HERMITE_SCALE * ch(4, dy, dx),
                hrbf.HERMITE_SCALE * ch(5, dy, dx),
                T2, 1.0 / jnp.maximum(T2, 1e-12))

    def f_at(ts):
        """HRBF value f(ts * ray) — ts any (..., BH, W); returns same shape."""
        qx, qy, qz = ts * rx, ts * ry, ts * rz
        f = jnp.zeros(ts.shape, jnp.float32)
        for j in range(len(taps)):
            px, py, pz, cx, cy, cz, T2, iT2 = tap_data(j)
            vx = qx - px
            vy = qy - py
            vz = qz - pz
            d2 = vx * vx + vy * vy + vz * vz
            r = jnp.sqrt(d2 * iT2)
            s = jnp.maximum(1.0 - r, 0.0)
            vc = vx * cx + vy * cy + vz * cz
            m = (sel[j] > 0) & (d2 < T2)
            f += jnp.where(m, 20.0 * (s ** 3) * iT2 * vc, 0.0)
        return f

    # ---- f0 + centre support count in ONE pass over the tap stacks (both
    # evaluate at t0*ray; the support mask (sel & d2 < T2) is shared) ----
    ncnt = jnp.zeros((BH, W), jnp.float32)
    f0 = jnp.zeros((BH, W), jnp.float32)
    cxp, cyp, czp = t0 * rx, t0 * ry, t0 * rz
    for j in range(len(taps)):
        px, py, pz, cx_, cy_, cz_, T2, iT2 = tap_data(j)
        vx = cxp - px
        vy = cyp - py
        vz = czp - pz
        d2 = vx * vx + vy * vy + vz * vz
        m = (sel[j] > 0) & (d2 < T2)
        r = jnp.sqrt(d2 * iT2)
        s = jnp.maximum(1.0 - r, 0.0)
        vc = vx * cx_ + vy * cy_ + vz * cz_
        f0 += jnp.where(m, 20.0 * (s ** 3) * iT2 * vc, 0.0)
        ncnt += m.astype(jnp.float32)

    # ---- ladder: march from t0 in sign(f0) direction until the sign flips
    # (frag:153-231).  Each pixel marches only its OWN direction (the XLA
    # path evaluates all 2*STEPS+1 points), and the loop exits as soon as
    # every supported pixel in the block has bracketed — typically 2-4
    # iterations instead of 25 (the surface is near t0 = the nearest
    # neighbor's ray projection).  Exact same results as the full ladder.
    # Found flags as f32 — Mosaic cannot lower boolean select_n (i8->i1).
    enough = (n_nb > KMIN) & (ncnt > KMIN)
    go_back = f0 > 0
    sgn = jnp.where(go_back, -1.0, 1.0)       # march toward the camera if f0>0
    big = jnp.full((BH, W), 1e6, jnp.float32)
    zero = jnp.zeros((BH, W), jnp.float32)
    enough_f = enough.astype(jnp.float32)

    if G_OFFS is not None:
        # geometric ladder (raycast.ladder_offsets): a short STATIC tap
        # list — no while_loop, so one never-bracketing straggler pixel
        # cannot force the whole (BH, W) block through all 25 iterations.
        # All |G_OFFS| ladder points are evaluated in ONE batched pass over
        # the tap stacks (each tap's VMEM slices are touched once instead of
        # |G_OFFS| times); the first-crossing select over the precomputed f
        # values is cheap elementwise work.  Bracket = [previous tap,
        # hitting tap] directionally.
        ts_all = jnp.stack(
            [t0 + sgn * (off * STEP) for off in G_OFFS])     # (G, BH, W)
        fs_all = f_at(ts_all)
        fnd = zero
        t_lo = big
        t_hi = big
        f_lo = zero
        f_hi = zero
        f_prev = f0
        prev = 0.0
        for gi, off in enumerate(G_OFFS):
            t_i = ts_all[gi]
            t_p = t0 + sgn * (prev * STEP)
            fv = fs_all[gi]
            hit = (fv * sgn > 0) & (fnd < 0.5)          # sign flipped vs f0
            t_lo = jnp.where(hit, jnp.where(go_back, t_i, t_p), t_lo)
            t_hi = jnp.where(hit, jnp.where(go_back, t_p, t_i), t_hi)
            if FP > 0:
                # bracket f values ride along for false position
                f_lo = jnp.where(hit, jnp.where(go_back, fv, f_prev), f_lo)
                f_hi = jnp.where(hit, jnp.where(go_back, f_prev, fv), f_hi)
            fnd = jnp.where(hit, 1.0, fnd)
            f_prev = fv
            prev = off
        found = enough & (fnd > 0.5)
    else:
        def l_cond(carry):
            i, fnd, _ = carry
            still = jnp.max(enough_f * (1.0 - fnd))
            return (i <= STEPS) & (still > 0)

        def l_body(carry):
            i, fnd, t_hit = carry
            t_i = t0 + sgn * (i.astype(jnp.float32) * STEP)
            fv = f_at(t_i)
            hit = (fv * sgn > 0) & (fnd < 0.5)    # sign flipped vs f0
            t_hit = jnp.where(hit, t_i, t_hit)
            fnd = jnp.where(hit, 1.0, fnd)
            return i + 1, fnd, t_hit

        _, fnd, t_hit = jax.lax.while_loop(
            l_cond, l_body, (jnp.int32(1), zero, big))
        found = enough & (fnd > 0.5)
        t_lo = jnp.where(go_back, t_hit, t_hit - STEP)
        t_hi = jnp.where(go_back, t_hit + STEP, t_hit)

    # ---- root refinement (frag:236-270): sequential bisection, the
    # batched k-section variant (KSEC_B interior points per pass), or
    # false-position iterations (FP > 0: superlinear on the smooth field —
    # ~3x fewer evaluations than bisection for better accuracy) ----
    if FP > 0:
        def falsi(_, carry):
            lo, hi, flo, fhi = carry
            den = fhi - flo
            den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
            mid = lo - flo * (hi - lo) / den
            # guard: keep the iterate strictly inside the bracket
            mid = jnp.clip(mid, jnp.minimum(lo, hi), jnp.maximum(lo, hi))
            fm = f_at(mid)
            neg = fm < 0
            lo2 = jnp.where(neg, mid, lo)
            flo2 = jnp.where(neg, fm, flo)
            hi2 = jnp.where(neg, hi, mid)
            fhi2 = jnp.where(neg, fhi, fm)
            return lo2, hi2, flo2, fhi2

        t_lo, t_hi, f_lo, f_hi = jax.lax.fori_loop(
            0, FP, falsi, (t_lo, t_hi, f_lo, f_hi))
        den = f_hi - f_lo
        den = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
        t_surf = jnp.clip(t_lo - f_lo * (t_hi - t_lo) / den,
                          jnp.minimum(t_lo, t_hi), jnp.maximum(t_lo, t_hi))
    elif KSEC_B > 1:
        # pass loop ROLLED (fori): the unrolled-tap f_at body appears once
        # in the kernel — unrolling the passes too stalls Mosaic (>18 min)
        def ksec(_, carry):
            lo, hi = carry
            wdt = (hi - lo) * (1.0 / (KSEC_B + 1.0))
            ts = jnp.stack(
                [lo + wdt * float(k) for k in range(1, KSEC_B + 1)])
            fs = f_at(ts)                                  # (B, BH, W)
            # invariant f(t_lo) < 0 <= f(t_hi): crossing lies after the
            # last negative interior point
            neg = jnp.sum((fs < 0).astype(jnp.float32), axis=0)
            lo = lo + neg * wdt
            return lo, lo + wdt

        t_lo, t_hi = jax.lax.fori_loop(0, KSEC_P, ksec, (t_lo, t_hi))
    else:
        def bis(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            fm = f_at(mid)
            return jnp.where(fm < 0, mid, lo), jnp.where(fm < 0, hi, mid)

        t_lo, t_hi = jax.lax.fori_loop(0, BIS, bis, (t_lo, t_hi))
    if FP <= 0:
        t_surf = 0.5 * (t_lo + t_hi)
    sx, sy, sz = t_surf * rx, t_surf * ry, t_surf * rz

    # ---- HRBF gradient at the surface point (normal; frag:276-280) ----
    g0 = jnp.zeros((BH, W), jnp.float32)
    g1 = jnp.zeros((BH, W), jnp.float32)
    g2 = jnp.zeros((BH, W), jnp.float32)
    # nearest selected neighbor (ring-tap index) for attribute lookup
    best_d2 = jnp.full((BH, W), 1e12, jnp.float32)
    best_j = jnp.zeros((BH, W), jnp.float32)
    for j in range(len(taps)):
        px, py, pz, cxn, cyn, czn, T2r, iT2 = tap_data(j)
        vx = sx - px
        vy = sy - py
        vz = sz - pz
        d2 = vx * vx + vy * vy + vz * vz
        r = jnp.sqrt(d2 * iT2)
        safe_r = jnp.maximum(r, 1e-20)
        s = jnp.maximum(1.0 - r, 0.0)
        vc = vx * cxn + vy * cyn + vz * czn
        a = -20.0 * (s ** 3) * iT2
        b = 60.0 * (s * s / safe_r) * (iT2 * iT2)
        m = ((sel[j] > 0) & (d2 <= T2r) & (d2 > 0.0)).astype(jnp.float32)
        a0 = -20.0 * iT2 * ((sel[j] > 0) & (d2 == 0.0)).astype(jnp.float32)
        g0 -= m * (a * cxn + b * vc * vx) + a0 * cxn
        g1 -= m * (a * cyn + b * vc * vy) + a0 * cyn
        g2 -= m * (a * czn + b * vc * vz) + a0 * czn

        d2n = jnp.where(sel[j] > 0, d2, 1e12)
        better = d2n < best_d2
        best_d2 = jnp.where(better, d2n, best_d2)
        best_j = jnp.where(better, jnp.float32(j), best_j)

    out_ref[0, 0] = sx
    out_ref[0, 1] = sy
    out_ref[0, 2] = sz
    out_ref[0, 3] = g0
    out_ref[0, 4] = g1
    out_ref[0, 5] = g2
    out_ref[0, 6] = best_j
    out_ref[0, 7] = found.astype(jnp.float32)


def raycast_core(attr9: jnp.ndarray, intr: CameraIntrinsics, cfg: SLAMConfig,
                 interpret: bool = False, tapstack: bool = True):
    """Run the fused raycast kernel over a (H, W, 9) stability-attr image
    [pos(3) | nrm(3) | conf | radius | valid].  Returns (p_surf (H,W,3),
    grad (H,W,3) unnormalised, nearest ring-tap idx (H,W) int32,
    found (H,W) bool)."""
    R = cfg.predict_window_multiplier
    h, w = attr9.shape[:2]
    BH = cfg.raycast_block_height
    while h % BH != 0:   # grid blocks must tile the image rows exactly
        BH //= 2
    acf = jnp.moveaxis(jnp.pad(attr9, [(R, R), (R, R), (0, 0)]), -1, 0)
    blocks = jnp.stack([_expand_rows(acf[c], BH, R) for c in range(9)], axis=1)
    nb = blocks.shape[0]
    from .raycast import bisection_plan, ladder_offsets

    g_steps, bis_iters = ladder_offsets(cfg)
    ksec_b, ksec_p = bisection_plan(cfg)
    kern = functools.partial(
        _raycast_kernel, R=R, W=w, BH=BH,
        K=cfg.predict_max_neighbors, KMIN=cfg.predict_min_neighbors,
        CONF_T=cfg.predict_conf_threshold,
        STEPS=cfg.raycast_coarse_steps, STEP=cfg.raycast_coarse_step,
        BIS=bis_iters,
        FX=intr.fx, FY=intr.fy, CX=intr.cx, CY=intr.cy,
        TAPSTACK=tapstack,
        G_OFFS=tuple(g_steps) if cfg.raycast_geometric_ladder else None,
        KSEC_B=ksec_b, KSEC_P=(ksec_p if ksec_b > 1 else 0),
        FP=(cfg.raycast_false_position
            if cfg.raycast_geometric_ladder else 0))
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 9, BH + 2 * R, w + 2 * R),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, BH, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, BH, w), jnp.float32),
        # the unrolled-tap live ranges stack-allocate ~18 MB at BH=8
        # (~66 MB at BH=16) — above the default 16 MB scoped-vmem limit but
        # under the 128 MB chip VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if BH > 8 else 64) * 1024 * 1024),
        interpret=interpret,
    )(blocks)
    out = jnp.moveaxis(out, 1, -1)            # (NB, BH, w, 8)
    acc = _unexpand(out, h)
    return (acc[..., 0:3], acc[..., 3:6],
            acc[..., 6].astype(jnp.int32), acc[..., 7] > 0.5)


# ---------------------------------------------------------------------- #
# curvature / HRBF gradient pass
# ---------------------------------------------------------------------- #

def _curv_kernel(vin_ref, nin_ref, rin_ref, out_ref, *, R, W, depth_min):
    """Accumulate the HRBF gradient (3) and Hessian (6 unique) at each centre
    vertex over the (2R+1)^2 window, then emit [g(3) | h6(6) | count] —
    the curvature conversion happens outside (cheap elementwise).

    Closed forms (ops/hrbf.py, verified against autodiff):
      grad  -= a c + b (v.c) v,   a = -20 s^3/T^2,  b = 60 s^2/(T^4 r)
      hess  -= C60 [ b2 (c_i v_j + c_j v_i + d_ij vc) - coef v_i v_j vc ]
               b2 = s^2/r, C60 = 60/T^4, coef = (2 s + b2)/(T^2 r^2)
    """
    D = 2 * R + 1
    bh = out_ref.shape[1]
    px = vin_ref[0, 0, R:R + bh, R:R + W]
    py = vin_ref[0, 1, R:R + bh, R:R + W]
    pz = vin_ref[0, 2, R:R + bh, R:R + W]

    zero = jnp.zeros((bh, W), jnp.float32)
    (g0, g1, g2, h00, h01, h02, h11, h12, h22, cnt) = (zero,) * 10
    for dy in range(D):
        qx = vin_ref[0, 0, dy:dy + bh, :]
        qy = vin_ref[0, 1, dy:dy + bh, :]
        qz = vin_ref[0, 2, dy:dy + bh, :]
        nx = nin_ref[0, 0, dy:dy + bh, :]
        ny = nin_ref[0, 1, dy:dy + bh, :]
        nz = nin_ref[0, 2, dy:dy + bh, :]
        rr = rin_ref[0, dy:dy + bh, :]
        for dx in range(D):
            sl = slice(dx, dx + W)
            vx = px - qx[:, sl]
            vy = py - qy[:, sl]
            vz = pz - qz[:, sl]
            cxn = hrbf.HERMITE_SCALE * nx[:, sl]
            cyn = hrbf.HERMITE_SCALE * ny[:, sl]
            czn = hrbf.HERMITE_SCALE * nz[:, sl]
            T = rr[:, sl]
            nlen2 = nx[:, sl] ** 2 + ny[:, sl] ** 2 + nz[:, sl] ** 2
            valid = (qz[:, sl] > depth_min) & (jnp.abs(qz[:, sl] - pz) < 0.10) \
                & (nlen2 > 0.64)
            d2 = vx * vx + vy * vy + vz * vz
            T2 = jnp.maximum(T * T, 1e-12)
            r = jnp.sqrt(jnp.maximum(d2, 0.0) / T2)
            safe_r = jnp.maximum(r, 1e-20)
            s = jnp.maximum(1.0 - r, 0.0)
            inside = valid & (d2 <= T2) & (d2 > 0.0)
            at0 = valid & (d2 == 0.0)
            m = inside.astype(jnp.float32)

            vc = vx * cxn + vy * cyn + vz * czn
            a = -20.0 * (s ** 3) / T2
            b = 60.0 * (s * s / safe_r) / (T2 * T2)
            # grad -= a c + b vc v ; at r=0 the limit is a0*c, a0=-20/T^2
            a0 = -20.0 / T2 * at0.astype(jnp.float32)
            g0 -= m * (a * cxn + b * vc * vx) + a0 * cxn
            g1 -= m * (a * cyn + b * vc * vy) + a0 * cyn
            g2 -= m * (a * czn + b * vc * vz) + a0 * czn

            b2 = s * s / safe_r
            C60 = 60.0 / (T2 * T2)
            coef = (2.0 * s + b2) / (T2 * safe_r * safe_r)
            t1 = C60 * b2
            t2 = C60 * coef * vc
            h00 -= m * (t1 * (2 * cxn * vx + vc) - t2 * vx * vx)
            h01 -= m * (t1 * (cxn * vy + cyn * vx) - t2 * vx * vy)
            h02 -= m * (t1 * (cxn * vz + czn * vx) - t2 * vx * vz)
            h11 -= m * (t1 * (2 * cyn * vy + vc) - t2 * vy * vy)
            h12 -= m * (t1 * (cyn * vz + czn * vy) - t2 * vy * vz)
            h22 -= m * (t1 * (2 * czn * vz + vc) - t2 * vz * vz)
            cnt += m + at0.astype(jnp.float32)
    acc = (g0, g1, g2, h00, h01, h02, h11, h12, h22, cnt)
    for i in range(10):
        out_ref[0, :, :, i] = acc[i]


def curvature_gradient(pre: VertexNormalRadius, intr: CameraIntrinsics,
                       cfg: SLAMConfig, interpret: bool = False) -> CurvatureResult:
    """depth_curvature_gradient.frag via the Pallas stencil; identical
    semantics to preprocess.curvature_gradient."""
    R = cfg.curv_window
    h, w = pre.radius.shape
    vcf = jnp.moveaxis(jnp.pad(pre.vertex_filtered, [(R, R), (R, R), (0, 0)]), -1, 0)
    ncf = jnp.moveaxis(jnp.pad(pre.normal, [(R, R), (R, R), (0, 0)]), -1, 0)
    rad = jnp.pad(pre.radius, R)
    vblocks = jnp.stack([_expand_rows(vcf[c], _BH, R) for c in range(3)], axis=1)
    nblocks = jnp.stack([_expand_rows(ncf[c], _BH, R) for c in range(3)], axis=1)
    rblocks = _expand_rows(rad, _BH, R)
    nb = vblocks.shape[0]
    kern = functools.partial(_curv_kernel, R=R, W=w, depth_min=cfg.depth_min)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3, _BH + 2 * R, w + 2 * R), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, _BH + 2 * R, w + 2 * R), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BH + 2 * R, w + 2 * R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BH, w, 10), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _BH, w, 10), jnp.float32),
        interpret=interpret,
    )(vblocks, nblocks, rblocks)
    acc = _unexpand(out, h)

    grad = acc[..., 0:3]
    H = jnp.stack([
        jnp.stack([acc[..., 3], acc[..., 4], acc[..., 5]], -1),
        jnp.stack([acc[..., 4], acc[..., 6], acc[..., 7]], -1),
        jnp.stack([acc[..., 5], acc[..., 7], acc[..., 8]], -1),
    ], -2)
    cnt = acc[..., 9]

    k1, k2, d1, d2, kvalid = hrbf.principal_curvatures(grad, H)
    vc = pre.vertex_filtered
    nc = pre.normal
    center_ok = (vc[..., 2] > cfg.depth_min) & (jnp.linalg.norm(nc, axis=-1) > 0.5)
    gmag = jnp.abs(jnp.sum(grad * nc, axis=-1))
    gn = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-20)
    ok = (cnt > 15) & kvalid & center_ok

    sent = jnp.float32(1000.0)
    rad_opt = jnp.where(
        ok, surfel_radius(vc[..., 2], gn[..., 2], intr) * cfg.radius_multiplier, 0.0)
    return CurvatureResult(
        k1=jnp.where(ok, k1, sent), k2=jnp.where(ok, k2, sent),
        dir1=jnp.where(ok[..., None], d1, 0.0),
        dir2=jnp.where(ok[..., None], d2, 0.0),
        gradient_mag=jnp.where(ok, gmag, 0.0),
        normal_opt=jnp.where(ok[..., None], gn, 0.0),
        radius_opt=rad_opt,
        valid=ok,
    )
