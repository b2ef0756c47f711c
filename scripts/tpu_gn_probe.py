"""Probe: can a Pallas kernel beat XLA's fused GN-iteration math?

The L0 GN iteration costs ~1.4 ms of which the 9-ch gather is ~0.4; the
rest is ~50 fused elementwise ops + 2 small grams (streaming floor
~0.1 ms).  This probe times, on realistic L0 shapes (307200 pixels):
  a) the current XLA joint_step (nearest mode, gather included)
  b) the same gather + a Pallas kernel computing the ICP term's partial
     normal equations + the photometric diff/valid plane
Variant (b) leaves rgb_step in XLA (it needs the global valid count).
Correctness is asserted against (a) before timing.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.core import camera
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import icp as icp_ops
from hrbffusion3d_tpu.ops import preprocess, pyramid

intr = TUM1
cfg = SLAMConfig()
H, W = intr.height, intr.width
N = H * W
LANES = 128
ROWS = N // LANES          # 2400
BR = 240                   # block rows (div by 8) -> grid 10


def _gn_icp_kernel(sc_ref, vx_ref, vy_ref, vz_ref, nx_ref, ny_ref, nz_ref,
                   vld_ref, sv_ref, inx_ref,
                   px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref,
                   wp_ref, d0_ref, il_ref,
                   out_ref, diff_ref, rv_ref,
                   *, DIST_T, ANG_T, MAXDD, USE_W, FX, FY, CX, CY, WIDTH, HEIGHT):
    sc = sc_ref[0]
    Rc = [sc[i] for i in range(9)]          # R_curr row-major
    tc = [sc[9 + i] for i in range(3)]
    Rp = [sc[12 + i] for i in range(9)]     # R_prev_inv row-major
    tp = [sc[21 + i] for i in range(3)]

    vx, vy, vz = vx_ref[...], vy_ref[...], vz_ref[...]
    nx, ny, nz = nx_ref[...], ny_ref[...], nz_ref[...]
    valid = vld_ref[...]
    svalid = sv_ref[...]
    inext = inx_ref[...]
    vpx, vpy, vpz = px_ref[...], py_ref[...], pz_ref[...]
    npx, npy, npz = qx_ref[...], qy_ref[...], qz_ref[...]
    wp = wp_ref[...]
    d0 = d0_ref[...]
    i_last = il_ref[...]

    # world-frame current point / normal
    gx = Rc[0] * vx + Rc[1] * vy + Rc[2] * vz + tc[0]
    gy = Rc[3] * vx + Rc[4] * vy + Rc[5] * vz + tc[1]
    gz = Rc[6] * vx + Rc[7] * vy + Rc[8] * vz + tc[2]
    ngx = Rc[0] * nx + Rc[1] * ny + Rc[2] * nz
    ngy = Rc[3] * nx + Rc[4] * ny + Rc[5] * nz
    ngz = Rc[6] * nx + Rc[7] * ny + Rc[8] * nz
    # previous camera frame
    dxp, dyp, dzp = gx - tp[0], gy - tp[1], gz - tp[2]
    sx = Rp[0] * dxp + Rp[1] * dyp + Rp[2] * dzp
    sy = Rp[3] * dxp + Rp[4] * dyp + Rp[5] * dzp
    sz = Rp[6] * dxp + Rp[7] * dyp + Rp[8] * dzp
    safe_z = jnp.where(jnp.abs(sz) > 1e-12, sz, 1e-12)
    u0f = sx * FX / safe_z + CX
    v0f = sy * FY / safe_z + CY

    ui = jnp.round(u0f)
    vi = jnp.round(v0f)
    in_img = ((ui >= 0.0) & (vi >= 0.0) & (ui < WIDTH) & (vi < HEIGHT)
              & (sz > 0.0))
    ok = in_img & (valid > 0.5) & (vpz != 0.0) \
        & (npx * npx + npy * npy + npz * npz > 1e-6)
    ex, ey, ez = vpx - gx, vpy - gy, vpz - gz
    dist2 = ex * ex + ey * ey + ez * ez
    cxv = ngy * npz - ngz * npy
    cyv = ngz * npx - ngx * npz
    czv = ngx * npy - ngy * npx
    sine2 = cxv * cxv + cyv * cyv + czv * czv
    found = ok & (sine2 <= ANG_T * ANG_T) & (dist2 <= DIST_T * DIST_T)
    fnd = found.astype(jnp.float32)

    # target point/normal in previous camera frame
    dtx, dty, dtz = vpx - tp[0], vpy - tp[1], vpz - tp[2]
    dcx = Rp[0] * dtx + Rp[1] * dty + Rp[2] * dtz
    dcy = Rp[3] * dtx + Rp[4] * dty + Rp[5] * dtz
    dcz = Rp[6] * dtx + Rp[7] * dty + Rp[8] * dtz
    ncx = Rp[0] * npx + Rp[1] * npy + Rp[2] * npz
    ncy = Rp[3] * npx + Rp[4] * npy + Rp[5] * npz
    ncz = Rp[6] * npx + Rp[7] * npy + Rp[8] * npz
    r = ncx * (sx - dcx) + ncy * (sy - dcy) + ncz * (sz - dcz)
    # rows [n, s x n, r]
    j0, j1, j2 = ncx, ncy, ncz
    j3 = sy * ncz - sz * ncy
    j4 = sz * ncx - sx * ncz
    j5 = sx * ncy - sy * ncx
    rowsv = [j0, j1, j2, j3, j4, j5, r]
    if USE_W:
        wgt = jnp.where(found & jnp.isfinite(wp), wp, 0.0)
    else:
        wgt = fnd

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    stats = []
    for p in range(7):
        wrp = jnp.where(found, rowsv[p] * wgt, 0.0)
        for q in range(p, 7):
            rq = jnp.where(found, rowsv[q], 0.0)
            stats.append(jnp.sum(wrp * rq).reshape(1, 1))
    stats.append(jnp.sum(fnd).reshape(1, 1))
    stats.append(jnp.zeros((1, 128 - len(stats)), jnp.float32))
    row = jnp.concatenate(stats, axis=1)                 # (1, 128)
    out_ref[0:1, :] = out_ref[0:1, :] + row

    # photometric diff/valid plane (nearest lookups; rgb_step stays in XLA)
    in_last = ((u0f >= 0.0) & (v0f >= 0.0) & (u0f <= WIDTH - 1.0)
               & (v0f <= HEIGHT - 1.0) & (sz > 0.0))
    depth_ok = (d0 > 0.0) & (jnp.abs(sz - d0) <= MAXDD) & (i_last != 0.0)
    rgb_valid = (svalid > 0.5) & in_last & depth_ok
    diff_ref[...] = jnp.where(rgb_valid, inext - i_last, 0.0)
    rv_ref[...] = rgb_valid.astype(jnp.float32)


def pallas_icp(sc, cur, assoc, use_w=True, interpret=False):
    """cur: 9 x (ROWS,128); assoc: 9 x (ROWS,128); sc: (1,32)."""
    grid = ROWS // BR
    spec = pl.BlockSpec((BR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(
        _gn_icp_kernel,
        DIST_T=cfg.dist_threshold, ANG_T=cfg.angle_threshold,
        MAXDD=cfg.max_depth_delta_rgb, USE_W=use_w,
        FX=intr.fx, FY=intr.fy, CX=intr.cx, CY=intr.cy,
        WIDTH=float(W), HEIGHT=float(H))
    out, diff, rv = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 32), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [spec] * 18,
        out_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   spec, spec],
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32)],
        interpret=interpret,
    )(sc, *cur, *assoc)
    s = out[0]
    tri = jnp.zeros((7, 7), jnp.float32)
    k = 0
    for p in range(7):
        for q in range(p, 7):
            tri = tri.at[p, q].set(s[k])
            tri = tri.at[q, p].set(s[k])
            k += 1
    return tri[:6, :6], tri[:6, 6], tri[6, 6], s[28], diff, rv


def main():
    # realistic inputs from the synth pipeline
    scene = synth.default_room()
    poses = synth.orbit_trajectory(3, angle_per_frame=0.004)
    d0c, c0 = synth.render_frame_jit(scene, jnp.asarray(poses[0]), intr)
    d1c, c1 = synth.render_frame_jit(scene, jnp.asarray(poses[1]), intr)

    @jax.jit
    def setup(d0c, c0, d1c, c1):
        pre0 = preprocess.vertex_normal_radius(d0c, d0c, intr, cfg)
        pre1 = preprocess.vertex_normal_radius(d1c, d1c, intr, cfg)
        i0 = pyramid.rgb_to_intensity(c0)
        i1 = pyramid.rgb_to_intensity(c1)
        joint_rows = icp_ops.pack_joint_nearest(
            pre0.vertex_filtered, pre0.normal, jnp.ones_like(d0c),
            jnp.where(pre0.vertex_filtered[..., 2] > 0,
                      pre0.vertex_filtered[..., 2], 0.0), i0)
        d_idx, d_idy = pyramid.sobel_derivatives(i1)
        min_scale = (cfg.min_gradient_magnitudes[0] ** 2) / (cfg.sobel_scale ** 2)
        sv = icp_ops.rgb_static_valid(i1, d_idx, d_idy, d1c, min_scale)
        cur_pack = icp_ops.joint_cur_pack(pre1.vertex_filtered, pre1.normal,
                                          d1c, intr)
        return pre1, i1, joint_rows, sv, cur_pack

    pre1, i1, joint_rows, sv, cur_pack = setup(d0c, c0, d1c, c1)
    _ = np.asarray(i1[0, 0])
    print("setup done", flush=True)

    R_curr = jnp.eye(3)
    t_curr = jnp.zeros(3)

    @jax.jit
    def xla_iter(Rc, tc):
        res, corres, assoc = icp_ops.joint_step(
            Rc, tc, jnp.eye(3), jnp.zeros(3),
            pre1.vertex_filtered, pre1.normal, d1c,
            joint_rows, i1, sv, intr, cfg,
            nearest=True, cur_pack=cur_pack)
        return res.A, res.b, res.residual2, res.count, corres.diff, assoc

    # pallas variant: XLA gather (same as joint_step's) + kernel
    vcurr, ncurr, valid_curr = cur_pack

    @jax.jit
    def pl_iter(Rc, tc):
        # warp for the gather indices (same math the kernel repeats)
        dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        vg = dot(vcurr, Rc.T) + tc
        vcp = vg   # prev pose = identity in this probe
        z = vcp[:, 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        u0f = vcp[:, 0] * intr.fx / safe_z + intr.cx
        v0f = vcp[:, 1] * intr.fy / safe_z + intr.cy
        ui = jnp.clip(jnp.round(u0f).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(v0f).astype(jnp.int32), 0, H - 1)
        assoc = joint_rows[vi * W + ui]            # (N, 9)

        def ch(x):
            return x.reshape(ROWS, LANES)

        cur = [ch(vcurr[:, 0]), ch(vcurr[:, 1]), ch(vcurr[:, 2]),
               ch(ncurr[:, 0]), ch(ncurr[:, 1]), ch(ncurr[:, 2]),
               ch(valid_curr.astype(jnp.float32)),
               ch(sv.astype(jnp.float32)), ch(i1.reshape(-1))]
        asc = [ch(assoc[:, k]) for k in range(9)]
        sc = jnp.concatenate([
            Rc.reshape(9), tc, jnp.eye(3).reshape(9), jnp.zeros(3),
            jnp.zeros(8)]).reshape(1, 32)
        A, b, r2, cnt, diff, rv = pallas_icp(sc, cur, asc)
        return A, b, r2, cnt, diff, rv

    # correctness first
    ax = xla_iter(R_curr, t_curr)
    ap = pl_iter(R_curr, t_curr)
    np.testing.assert_allclose(np.asarray(ap[0]), np.asarray(ax[0]),
                               rtol=0.1, atol=1.0)
    np.testing.assert_allclose(np.asarray(ap[3]), np.asarray(ax[3]), atol=1)
    dpl = np.asarray(ap[4]).reshape(-1)
    dxl = np.asarray(ax[4]).reshape(-1)
    # boundary pixels can flip membership (the kernel re-derives the warp
    # with scalar FMA order); require bulk agreement
    assert (np.abs(dpl - dxl) < 1e-3).mean() > 0.995, (np.abs(dpl - dxl) < 1e-3).mean()
    print("kernel matches XLA", flush=True)

    for name, fn in [("xla joint_step", xla_iter), ("pallas icp+diff", pl_iter)]:
        fn(R_curr, t_curr)
        best = 1e9
        for _ in range(12):
            t0 = time.perf_counter()
            out = fn(R_curr, t_curr)
            _ = np.asarray(out[2])
            best = min(best, (time.perf_counter() - t0) * 1000)
        print(f"{name:20s} {best:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
