"""Frame-to-model tracking: joint ICP + photometric Gauss-Newton.

TPU-native replacement for ``RGBDOdometry::getIncrementalTransformation``
(``Core/src/Utils/RGBDOdometry.cpp:796-1249``): optional SO(3) image-warp
pre-alignment at the coarsest level, then a coarse-to-fine loop with
iterations {10,5,4} solving ``(A_rgb + w^2 A_icp) x = (b_rgb + w b_icp)``,
w = 10.

The reference's structure downloads 27 floats to the host and solves with
Eigen *every iteration* (2 device->host transfers x 19 iterations, SURVEY
§3.3); here the entire coarse-to-fine loop — residuals, Gram matrices, 6x6
solves, SE(3) updates — is one jitted computation with ``lax.fori_loop``
per level, no host round-trips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraIntrinsics, SLAMConfig
from ..core import camera, lie
from ..ops import icp as icp_ops
from ..ops import pyramid as pyr_ops


class TrackingInputs(NamedTuple):
    """Per-level (tuple indexed by pyramid level) tracking inputs.

    *next_* = live frame (camera frame); *last_* = model prediction from the
    previous frame's pose (vertex/normal in WORLD frame as in initICPModel,
    RGBDOdometry.cpp:208-247; depth/intensity in the previous camera);
    prev_intensity = previous live frame (for SO3 pre-alignment, which warps
    lastNextImage -> nextImage, RGBDOdometry.cpp:827-914)."""

    next_depth: tuple
    next_intensity: tuple
    next_vmap: tuple
    next_nmap: tuple
    last_depth: tuple
    last_intensity: tuple
    last_vmap_g: tuple
    last_nmap_g: tuple
    icp_weight: tuple
    prev_intensity: tuple
    # curvature pyramids for the correspondence-search scoring term
    # (reduce.cu:415-422); built only when cfg.icp_use_correspondence_search
    next_k1: tuple = ()
    next_k2: tuple = ()
    last_k1: tuple = ()
    last_k2: tuple = ()
    # finest-level-only live curvature (1-tuples) for the saliency score
    # (cfg.tracking_topk) — no pyramids, so cheaper than next_k1/k2
    sal_k1: tuple = ()
    sal_k2: tuple = ()


def build_pyramid_scalar(x0: jnp.ndarray, levels: int, down) -> tuple:
    out = [x0]
    for _ in range(levels - 1):
        out.append(down(out[-1]))
    return tuple(out)


def build_inputs(
    next_depth: jnp.ndarray,        # (H,W) filtered metric depth
    next_intensity: jnp.ndarray,    # (H,W) 0-255 grey
    next_vmap: jnp.ndarray,         # (H,W,3) filtered vertex map
    next_nmap: jnp.ndarray,         # (H,W,3)
    pred_vmap: jnp.ndarray,         # (H,W,3) model prediction, prev CAMERA frame
    pred_nmap: jnp.ndarray,         # (H,W,3) prev camera frame
    pred_intensity: jnp.ndarray,    # (H,W) predicted/filled grey
    icp_weight: jnp.ndarray,        # (H,W) predicted per-pixel ICP weight
    prev_R: jnp.ndarray, prev_t: jnp.ndarray,  # prev pose (world<-cam)
    prev_intensity: jnp.ndarray,    # (H,W) previous live frame grey
    cfg: SLAMConfig,
    next_k1: jnp.ndarray | None = None, next_k2: jnp.ndarray | None = None,
    pred_k1: jnp.ndarray | None = None, pred_k2: jnp.ndarray | None = None,
    sal_k1: jnp.ndarray | None = None, sal_k2: jnp.ndarray | None = None,
) -> TrackingInputs:
    """Build all pyramids; transforms the model prediction into world frame
    with the previous pose (initICPModel semantics)."""
    L = cfg.num_pyramid_levels
    sal = ({"sal_k1": (sal_k1,), "sal_k2": (sal_k2,)}
           if sal_k1 is not None else {})
    pred_valid = pred_vmap[..., 2] > 0
    vmap_g = jnp.where(
        pred_valid[..., None], pred_vmap @ prev_R.T + prev_t, 0.0
    )
    nmap_g = pred_nmap @ prev_R.T
    nmap_g = jnp.where(pred_valid[..., None], nmap_g, 0.0)
    pred_depth = jnp.where(pred_valid, pred_vmap[..., 2], 0.0)

    use_curv = cfg.icp_use_correspondence_search and next_k1 is not None

    if cfg.pyramid_gather_decimate:
        # fused per-level downsampling: ONE 5x5 depth pass (2 stacked
        # maps), ONE Gaussian intensity pass (3 stacked maps) and ONE 2x2
        # pooling pass (all vertex/normal/scalar maps + their validity
        # channels) per level transition — each separate pyramid op pays a
        # fixed per-array cost on TPU (was ~20 ops/level, ~4.8 ms/frame)
        lv = {
            "deps": (next_depth, pred_depth),
            "ints": (next_intensity, pred_intensity, prev_intensity),
            "vmaps": (next_vmap, vmap_g),
            "nmaps": (next_nmap, nmap_g),
            "scalars": (icp_weight,) + (
                (next_k1, next_k2, pred_k1, pred_k2) if use_curv else ()),
        }
        levels = [lv]
        for _ in range(L - 1):
            p = levels[-1]
            deps = pyr_ops.pyr_down_depth_mc(jnp.stack(p["deps"], axis=-1))
            ints = pyr_ops.pyr_down_intensity_mc(jnp.stack(p["ints"], axis=-1))
            vms, nms, scs = pyr_ops.resize_maps_fused(
                list(p["vmaps"]), list(p["nmaps"]), list(p["scalars"]))
            levels.append({
                "deps": tuple(deps[..., i] for i in range(len(p["deps"]))),
                "ints": tuple(ints[..., i] for i in range(len(p["ints"]))),
                "vmaps": tuple(vms), "nmaps": tuple(nms),
                "scalars": tuple(scs),
            })

        def pyr(group, i):
            return tuple(lvl[group][i] for lvl in levels)

        return TrackingInputs(
            next_depth=pyr("deps", 0),
            next_intensity=pyr("ints", 0),
            next_vmap=pyr("vmaps", 0),
            next_nmap=pyr("nmaps", 0),
            last_depth=pyr("deps", 1),
            last_intensity=pyr("ints", 1),
            last_vmap_g=pyr("vmaps", 1),
            last_nmap_g=pyr("nmaps", 1),
            icp_weight=pyr("scalars", 0),
            prev_intensity=pyr("ints", 2),
            **({
                "next_k1": pyr("scalars", 1), "next_k2": pyr("scalars", 2),
                "last_k1": pyr("scalars", 3), "last_k2": pyr("scalars", 4),
            } if use_curv else {}),
            **sal,
        )

    g = cfg.pyramid_gather_decimate
    down_depth = lambda m: pyr_ops.pyr_down_depth(m, gather=g)
    down_int = lambda m: pyr_ops.pyr_down_intensity(m, gather=g)
    down_map = lambda m: pyr_ops.resize_map(m, gather=g)
    down_nmap = lambda m: pyr_ops.resize_map(m, normalize=True, gather=g)
    down_scalar = lambda m: pyr_ops.resize_scalar_map(m, gather=g)
    return TrackingInputs(
        next_depth=build_pyramid_scalar(next_depth, L, down_depth),
        next_intensity=build_pyramid_scalar(next_intensity, L, down_int),
        next_vmap=build_pyramid_scalar(next_vmap, L, down_map),
        next_nmap=build_pyramid_scalar(next_nmap, L, down_nmap),
        last_depth=build_pyramid_scalar(pred_depth, L, down_depth),
        last_intensity=build_pyramid_scalar(pred_intensity, L, down_int),
        last_vmap_g=build_pyramid_scalar(vmap_g, L, down_map),
        last_nmap_g=build_pyramid_scalar(nmap_g, L, down_nmap),
        icp_weight=build_pyramid_scalar(icp_weight, L, down_scalar),
        prev_intensity=build_pyramid_scalar(prev_intensity, L, down_int),
        **({
            "next_k1": build_pyramid_scalar(next_k1, L, down_scalar),
            "next_k2": build_pyramid_scalar(next_k2, L, down_scalar),
            "last_k1": build_pyramid_scalar(pred_k1, L, down_scalar),
            "last_k2": build_pyramid_scalar(pred_k2, L, down_scalar),
        } if (cfg.icp_use_correspondence_search and next_k1 is not None) else {}),
        **sal,
    )


class TrackResult(NamedTuple):
    R: jnp.ndarray           # (3,3) new pose rotation (world<-cam)
    t: jnp.ndarray           # (3,)
    icp_error: jnp.ndarray   # sqrt(residual2)/count at finest level
    icp_count: jnp.ndarray
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    A: jnp.ndarray           # (6,6) final joint system (covariance = A^-1)
    b: jnp.ndarray


def _k_matrix(intr: CameraIntrinsics) -> jnp.ndarray:
    return jnp.array(
        [[intr.fx, 0.0, intr.cx], [0.0, intr.fy, intr.cy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )


def _so3_prealign(inp: TrackingInputs, intr: CameraIntrinsics, cfg: SLAMConfig):
    """10-iteration 3-DoF rotation estimate at the coarsest level
    (RGBDOdometry.cpp:827-914), with the reference's keep-best/divergence
    logic expressed as a masked carry."""
    lvl = cfg.num_pyramid_levels - 1
    K = _k_matrix(intr.level(lvl))
    Kinv = jnp.linalg.inv(K)
    last = inp.prev_intensity[lvl]
    nxt = inp.next_intensity[lvl]
    next_grad_rows = icp_ops.pack_so3(nxt)
    last_gx, last_gy = icp_ops.central_gradients(last)

    def body(_, carry):
        R_lr, last_err, last_cnt, best_R, done = carry
        homography = K @ R_lr @ Kinv
        krlr = K @ R_lr
        A, b, r2, cnt = icp_ops.so3_step(
            last, nxt, next_grad_rows, last_gx, last_gy, homography, Kinv, krlr)
        err = jnp.sqrt(r2) / jnp.maximum(cnt, 1.0)
        diverged = err > last_err + 0.001
        # solve 3x3
        x = icp_ops.solve_system(A, b)
        upd = lie.so3_exp(x) @ R_lr
        new_done = done | diverged
        R_new = jnp.where(new_done, R_lr, upd)
        best_new = jnp.where(diverged & ~done, best_R, R_lr)
        return (R_new, jnp.where(new_done, last_err, err),
                jnp.where(new_done, last_cnt, cnt), best_new, new_done)

    eye = jnp.eye(3, dtype=jnp.float32)
    init = (eye, jnp.float32(3.4e37), jnp.float32(0.0), eye, jnp.array(False))
    R_lr, _, _, best_R, done = jax.lax.fori_loop(0, cfg.so3_iterations, body, init)
    return jnp.where(done, best_R, R_lr)


def _gn_loop(body, n_iters: int, carry, eps: float):
    """Run ``body`` (carry -> (carry, |dx|)) up to ``n_iters`` times.

    With ``eps > 0`` the loop exits early once the SE(3) increment norm
    drops below eps (GN contracts quadratically near the solution, so the
    reference's fixed budgets — {10,5,4}, RGBDOdometry.cpp:916-918 — mostly
    run converged no-op iterations at the finest level; each one costs a
    full-image correspondence gather on TPU).  eps=0 reproduces the fixed
    iteration count exactly."""
    if eps <= 0.0:
        return jax.lax.fori_loop(
            0, n_iters, lambda i, c: body(i, c)[0], carry)

    def wcond(s):
        i, dx, _ = s
        return (i < n_iters) & (dx > eps)

    def wbody(s):
        i, _, c = s
        c2, dx = body(i, c)
        return (i + 1, dx, c2)

    _, _, out = jax.lax.while_loop(
        wcond, wbody, (jnp.int32(0), jnp.float32(1e9), carry))
    return out


def track(
    prev_R: jnp.ndarray, prev_t: jnp.ndarray,
    inp: TrackingInputs,
    intr: CameraIntrinsics, cfg: SLAMConfig,
    rgb_only: bool = False,
) -> TrackResult:
    """The full incremental-transform estimate (RGBDOdometry.cpp:796-1249)."""
    use_icp = (not rgb_only) and cfg.icp_weight > 0
    use_rgb = rgb_only or cfg.icp_weight < 100

    result_rt = jnp.eye(4, dtype=jnp.float32)
    if cfg.so3_prealign and use_rgb:
        R0 = _so3_prealign(inp, intr, cfg)
        result_rt = result_rt.at[:3, :3].set(R0)

    prev_R_inv = prev_R.T
    L = cfg.num_pyramid_levels
    iters = cfg.pyramid_iterations

    stats = {
        "icp_e": jnp.float32(0), "icp_c": jnp.float32(0),
        "rgb_e": jnp.float32(0), "rgb_c": jnp.float32(0),
    }
    lastA = jnp.zeros((6, 6), jnp.float32)
    lastb = jnp.zeros((6,), jnp.float32)

    for lvl in range(L - 1, -1, -1):
        li = intr.level(lvl)
        K = _k_matrix(li)
        Kinv = jnp.linalg.inv(K)
        d_idx, d_idy = pyr_ops.sobel_derivatives(inp.next_intensity[lvl])
        min_scale = (cfg.min_gradient_magnitudes[lvl] ** 2) / (cfg.sobel_scale ** 2)
        use_sparse = cfg.icp_use_sparse and use_icp
        # joint fast path: ICP + photometric share ONE row gather per
        # iteration (the specialised modes keep the separate formulations);
        # tracking_rgb_nearest implies it (nearest-pixel photometric is
        # implemented as the single 9-ch joint gather)
        use_joint = ((cfg.tracking_joint_gather or cfg.tracking_rgb_nearest)
                     and use_rgb and use_icp and not use_sparse
                     and not cfg.icp_use_correspondence_search)
        # per-level packed constants, hoisted out of the GN iterations
        if use_joint:
            packer = (icp_ops.pack_joint_nearest if cfg.tracking_rgb_nearest
                      else icp_ops.pack_joint)
            model_rows = packer(
                inp.last_vmap_g[lvl], inp.last_nmap_g[lvl],
                inp.icp_weight[lvl], inp.last_depth[lvl],
                inp.last_intensity[lvl])
            last_rows = None
        else:
            model_rows = icp_ops.pack_model(
                inp.last_vmap_g[lvl], inp.last_nmap_g[lvl], inp.icp_weight[lvl])
            last_rows = icp_ops.pack_last(inp.last_depth[lvl], inp.last_intensity[lvl])
        static_valid = icp_ops.rgb_static_valid(
            inp.next_intensity[lvl], d_idx, d_idy, inp.next_depth[lvl], min_scale)
        cur_pack = (icp_ops.joint_cur_pack(
            inp.next_vmap[lvl], inp.next_nmap[lvl], inp.next_depth[lvl], li)
            if use_joint else None)

        # fixed-correspondence iterations: carry the association rows and
        # re-gather only every reassoc-th iteration (cfg doc in config.py)
        reassoc = (cfg.tracking_reassoc_period
                   if (use_joint and cfg.tracking_reassoc_period > 1) else 1)

        def body(it, carry, lvl=lvl, li=li, K=K, Kinv=Kinv, d_idx=d_idx,
                 d_idy=d_idy, model_rows=model_rows, last_rows=last_rows,
                 static_valid=static_valid, sub=None, patch=None,
                 sv_scale=None):
            assoc = None
            if use_sparse:
                result_rt, lastA, lastb, st, lam = carry
            elif reassoc > 1:
                result_rt, lastA, lastb, st, assoc = carry
                lam = None
            else:
                result_rt, lastA, lastb, st = carry
                lam = None
            rt_inv = lie.se3_inverse(result_rt)
            krkinv = K @ rt_inv[:3, :3] @ Kinv
            kt = K @ rt_inv[:3, 3]

            # current pose estimate: currentT = prevT * resultRt^-1
            # (RGBDOdometry.cpp:1196-1204)
            cur = lie.rt_to_mat(prev_R, prev_t) @ rt_inv
            R_curr = cur[:3, :3]
            t_curr = cur[:3, 3]

            A = jnp.zeros((6, 6), jnp.float32)
            b = jnp.zeros((6,), jnp.float32)

            if use_joint:
                if patch is not None:
                    # gather-free iteration against the anchored patch
                    # (cfg.tracking_patch_assoc)
                    if sub is not None:
                        vc, nc, vl = sub.vcurr, sub.ncurr, sub.valid
                        i_nx, sv = sub.i_next, sub.static_valid
                    else:
                        vc, nc, vl = cur_pack
                        i_nx = inp.next_intensity[lvl].reshape(-1)
                        sv = static_valid
                    icp_res, corres = icp_ops.joint_step_patch(
                        R_curr, t_curr, prev_R_inv, prev_t, patch,
                        cfg.tracking_patch_radius, vc, nc, vl, i_nx, sv,
                        li, cfg)
                    assoc = None
                else:
                    icp_res, corres, assoc = icp_ops.joint_step(
                        R_curr, t_curr, prev_R_inv, prev_t,
                        inp.next_vmap[lvl], inp.next_nmap[lvl],
                        inp.next_depth[lvl],
                        model_rows, inp.next_intensity[lvl], static_valid,
                        li, cfg,
                        assoc_prev=assoc if reassoc > 1 else None,
                        do_gather=(it % reassoc == 0) if reassoc > 1 else None,
                        nearest=cfg.tracking_rgb_nearest, cur_pack=cur_pack,
                        sub=sub)
                # subsampled iterations keep the robustifier scale of the
                # full set: sigmaVal = sqrt(count) (the reference's quirk,
                # RGBDOdometry.cpp:1017) is multiplied by the stride so
                # sqrt(count_sub)*stride ~ sqrt(count_full)
                if sv_scale is None:
                    sv_scale = (float(cfg.tracking_subsample)
                                if sub is not None else 1.0)
                sigma_val = jnp.where(
                    rgb_only, jnp.float32(-1.0),
                    jnp.sqrt(jnp.maximum(corres.count, 1.0)) * sv_scale)
                gxa = sub.gx if sub is not None else d_idx
                gya = sub.gy if sub is not None else d_idy
                rgb_res = icp_ops.rgb_step(corres, sigma_val, gxa, gya, li, cfg)
                w = cfg.icp_weight
                A = rgb_res.A + (w * w) * icp_res.A
                b = rgb_res.b + w * icp_res.b
                st = {
                    "rgb_e": jnp.sqrt(corres.sigma_sum) / jnp.maximum(corres.count, 1.0),
                    "rgb_c": corres.count,
                    "icp_e": jnp.sqrt(icp_res.residual2) / jnp.maximum(icp_res.count, 1.0),
                    "icp_c": icp_res.count,
                }
            elif use_rgb:
                corres = icp_ops.rgb_residual(
                    krkinv, kt, inp.next_depth[lvl], inp.next_intensity[lvl],
                    last_rows, static_valid, cfg,
                )
                # sigmaVal quirk preserved from the reference
                # (RGBDOdometry.cpp:1017: the expression evaluates to
                # sqrt(count) for any nonzero residual)
                sigma_val = jnp.where(
                    rgb_only, jnp.float32(-1.0), jnp.sqrt(jnp.maximum(corres.count, 1.0))
                )
                rgb_res = icp_ops.rgb_step(
                    corres, sigma_val, d_idx, d_idy, li, cfg
                )
                A = A + rgb_res.A
                b = b + rgb_res.b
                st = {**st, "rgb_e": jnp.sqrt(corres.sigma_sum) / jnp.maximum(corres.count, 1.0),
                      "rgb_c": corres.count}

            extras = None
            if use_icp and not use_joint:
                has_curv = len(inp.next_k1) > 0
                icp_out = icp_ops.icp_step(
                    R_curr, t_curr, prev_R_inv, prev_t,
                    inp.next_vmap[lvl], inp.next_nmap[lvl],
                    model_rows, li, cfg,
                    k1_curr=inp.next_k1[lvl] if has_curv else None,
                    k2_curr=inp.next_k2[lvl] if has_curv else None,
                    k1_prev=inp.last_k1[lvl] if has_curv else None,
                    k2_prev=inp.last_k2[lvl] if has_curv else None,
                    sparse_lambda=lam if use_sparse else None,
                )
                icp_res, extras = icp_out if use_sparse else (icp_out, None)
                w = cfg.icp_weight if use_rgb else 1.0
                A = A + (w * w) * icp_res.A
                b = b + w * icp_res.b
                st = {**st, "icp_e": jnp.sqrt(icp_res.residual2) / jnp.maximum(icp_res.count, 1.0),
                      "icp_c": icp_res.count}

            x = icp_ops.solve_system(A, b)
            # computeUpdateSE3: inc = [rodrigues(x[3:]) | x[:3]] composed on
            # the left (rotation and translation NOT coupled through V)
            inc = jnp.eye(4, dtype=jnp.float32)
            inc = inc.at[:3, :3].set(lie.so3_exp(x[3:]))
            inc = inc.at[:3, 3].set(x[:3])
            result_rt = inc @ result_rt

            dx = jnp.linalg.norm(x)
            if use_sparse:
                # ADMM dual update with the post-solve pose
                # (RGBDOdometry.cpp:1209-1224 -> updateLambdaMapKernel)
                cur2 = lie.rt_to_mat(prev_R, prev_t) @ lie.se3_inverse(result_rt)
                lam = icp_ops.sparse_icp_lambda_update(
                    lam, extras, cur2[:3, :3], cur2[:3, 3],
                    prev_R_inv, prev_t, inp.next_vmap[lvl],
                    cfg.sparse_icp_mu)
                return (result_rt, A, b, st, lam), dx
            if reassoc > 1:
                return (result_rt, A, b, st, assoc), dx
            return (result_rt, A, b, st), dx

        if use_sparse:
            # lambdaMap zeroed per level (RGBDOdometry.cpp:965-978)
            lam0 = jnp.zeros((li.height * li.width, 3), jnp.float32)
            carry = (result_rt, lastA, lastb, stats, lam0)
        elif reassoc > 1:
            assoc0 = jnp.zeros((li.height * li.width, 9), jnp.float32)
            carry = (result_rt, lastA, lastb, stats, assoc0)
        else:
            carry = (result_rt, lastA, lastb, stats)
        # finest-level fast drivers (VERDICT r2 next-1): bounded-
        # displacement patch association and/or saliency top-k pixel
        # selection.  Both attack the per-iteration correspondence row
        # gather — the profile's top item (gather-issue-rate bound).
        # tracking_subsample > 1 routes iterations through the subsampled
        # bundle, which neither fast driver threads through — excluding it
        # here keeps the combination from silently running every finest-
        # level iteration at full resolution (ADVICE r3)
        drive_patch = (lvl == 0 and use_joint and cfg.tracking_rgb_nearest
                       and cfg.tracking_patch_assoc and reassoc == 1
                       and not use_sparse and cfg.tracking_subsample == 1)
        drive_topk = (lvl == 0 and use_joint and cfg.tracking_topk > 0
                      and reassoc == 1 and not use_sparse
                      and cfg.tracking_subsample == 1)
        if drive_patch or drive_topk:
            n_pix = li.height * li.width
            table = None
            if drive_patch:
                # camera-frame model normals recovered by rotating the
                # world-frame pyramid back (nmap_g = nmap_c @ prev_R.T)
                nmap_c = (inp.last_nmap_g[lvl].reshape(n_pix, 3) @ prev_R
                          ).reshape(li.height, li.width, 3)
                base6 = icp_ops.pack_patch_base(
                    inp.last_depth[lvl], nmap_c, inp.icp_weight[lvl],
                    inp.last_intensity[lvl])
                table = icp_ops.build_patch_table(
                    base6, cfg.tracking_patch_radius)

            def _anchor(rt, vcurr_rows, table=table, li=li):
                cur = lie.rt_to_mat(prev_R, prev_t) @ lie.se3_inverse(rt)
                return icp_ops.patch_anchor(
                    cur[:3, :3], cur[:3, 3], prev_R_inv, prev_t,
                    vcurr_rows, table, li)

            if drive_topk:
                ids = icp_ops.saliency_ids(
                    cfg.tracking_topk, inp.next_vmap[lvl],
                    inp.next_nmap[lvl], inp.next_intensity[lvl],
                    static_valid, d_idx, d_idy, li,
                    k1=(inp.sal_k1[0] if len(inp.sal_k1) else None),
                    k2=(inp.sal_k2[0] if len(inp.sal_k2) else None))
                sub_sel = icp_ops._sub_pixels_at(
                    ids, inp.next_vmap[lvl], inp.next_nmap[lvl],
                    inp.next_depth[lvl], inp.next_intensity[lvl],
                    static_valid, d_idx, d_idy, li)
                scale = (n_pix / ids.shape[0]) ** 0.5
                n_full = min(cfg.tracking_topk_full_iters, iters[0])
                n_sel = iters[0] - n_full
            else:
                sub_sel, scale, n_full, n_sel = None, 1.0, 0, iters[0]

            if n_sel:
                patch1 = (_anchor(carry[0], sub_sel.vcurr
                                  if sub_sel is not None else cur_pack[0])
                          if drive_patch else None)
                carry = _gn_loop(
                    functools.partial(body, sub=sub_sel, patch=patch1,
                                      sv_scale=scale),
                    n_sel, carry, cfg.tracking_converge_eps)
            if n_full:
                # polish iterations at full resolution; the patch anchor is
                # refreshed at the current estimate
                patch2 = (_anchor(carry[0], cur_pack[0])
                          if drive_patch else None)
                carry = _gn_loop(functools.partial(body, patch=patch2),
                                 n_full, carry, cfg.tracking_converge_eps)
            result_rt, lastA, lastb, stats = carry
            continue

        # finest-level pixel subsampling (cfg.tracking_subsample): the
        # first iterations run on a stride-decimated current-frame pixel
        # set, the last tracking_subsample_full_iters at full resolution
        n_sub = 0
        if (lvl == 0 and use_joint and reassoc == 1
                and cfg.tracking_subsample > 1):
            n_sub = max(0, iters[0] - min(cfg.tracking_subsample_full_iters,
                                          iters[0]))
        if n_sub:
            sub = icp_ops.pack_sub_pixels(
                cfg.tracking_subsample, inp.next_vmap[lvl],
                inp.next_nmap[lvl], inp.next_depth[lvl],
                inp.next_intensity[lvl], static_valid, d_idx, d_idy, li)
            carry = _gn_loop(
                functools.partial(body, sub=sub), n_sub, carry,
                cfg.tracking_converge_eps)
        n_main = iters[lvl] - n_sub
        if reassoc > 1 and cfg.tracking_converge_eps <= 0.0:
            # static unroll: the gather-vs-carry choice becomes a Python
            # bool per iteration (zero cond overhead; see icp.joint_step)
            for _i in range(n_main):
                carry, _ = body(_i, carry)
        else:
            carry = _gn_loop(body, n_main, carry,
                             cfg.tracking_converge_eps)
        if use_sparse or reassoc > 1:
            result_rt, lastA, lastb, stats, _ = carry
        else:
            result_rt, lastA, lastb, stats = carry

    cur = lie.rt_to_mat(prev_R, prev_t) @ lie.se3_inverse(result_rt)
    R_new = lie.orthonormalise(cur[:3, :3])
    t_new = cur[:3, 3]

    # divergence guard (RGBDOdometry.cpp:1232-1236)
    too_far = jnp.linalg.norm(t_new - prev_t) > cfg.tracking_divergence_limit
    R_new = jnp.where(too_far, prev_R, R_new)
    t_new = jnp.where(too_far, prev_t, t_new)

    return TrackResult(
        R=R_new, t=t_new,
        icp_error=stats["icp_e"], icp_count=stats["icp_c"],
        rgb_error=stats["rgb_e"], rgb_count=stats["rgb_c"],
        A=lastA, b=lastb,
    )
