"""Interleaved A/B batch 14: shifted-accumulation preprocess passes
(curvature via hrbf.grad_hess_direct, normal_pca via center-relative
moments) vs the previous patch-stack/einsum formulations.

The old formulations are reproduced inline and monkeypatched into
ops.preprocess while tracing the "old" jit (late module-attr binding), so
both variants measure back-to-back in one process.
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

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import hrbf
from hrbffusion3d_tpu.ops import preprocess as pp
from hrbffusion3d_tpu.ops.patches import extract_patches
from hrbffusion3d_tpu.pipeline import slam


# ---- the previous (patch-stack / einsum) formulations ----
def old_curvature_gradient(pre, intr, cfg, chunk=16384):
    R = cfg.curv_window
    v = pre.vertex_filtered
    n = pre.normal
    h, w = v.shape[:2]
    k = (2 * R + 1) ** 2
    nb_v = extract_patches(v, R).reshape(h * w, k, 3)
    nb_n = extract_patches(n, R).reshape(h * w, k, 3)
    nb_r = extract_patches(pre.radius, R).reshape(h * w, k)
    vc = v.reshape(h * w, 3)
    nc = n.reshape(h * w, 3)
    nb_mask = (
        (jnp.abs(nb_v[..., 2] - vc[..., 2:3]) < 0.10)
        & (nb_v[..., 2] > cfg.depth_min)
        & (jnp.linalg.norm(nb_n, axis=-1) > 0.8)
    )
    center_ok = (vc[..., 2] > cfg.depth_min) & (jnp.linalg.norm(nc, axis=-1) > 0.5)
    cnt = jnp.sum(nb_mask, axis=-1)
    grad = hrbf.hrbf_gradient(vc, nb_v, nb_n, nb_r, nb_mask)
    H = hrbf.hrbf_hessian(vc, nb_v, nb_n, nb_r, nb_mask)
    k1, k2, d1, d2, kvalid = hrbf.principal_curvatures(grad, H)
    gmag = jnp.abs(jnp.sum(grad * nc, axis=-1))
    gn = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-20)
    ok = (cnt > 15) & kvalid & center_ok
    sent = jnp.float32(1000.0)
    k1 = jnp.where(ok, k1, sent).reshape(h, w)
    k2 = jnp.where(ok, k2, sent).reshape(h, w)
    d1 = jnp.where(ok[..., None], d1, 0.0).reshape(h, w, 3)
    d2 = jnp.where(ok[..., None], d2, 0.0).reshape(h, w, 3)
    gmag = jnp.where(ok, gmag, 0.0).reshape(h, w)
    gn2 = jnp.where(ok[..., None], gn, 0.0).reshape(h, w, 3)
    rad_opt = jnp.where(
        ok, pp.surfel_radius(vc[..., 2], gn2.reshape(-1, 3)[..., 2], intr)
        * cfg.radius_multiplier, 0.0).reshape(h, w)
    return pp.CurvatureResult(k1=k1, k2=k2, dir1=d1, dir2=d2,
                              gradient_mag=gmag, normal_opt=gn2,
                              radius_opt=rad_opt, valid=ok.reshape(h, w))


def old_normal_pca(vertex_f, cfg):
    R = 3
    pts = extract_patches(vertex_f, R)
    z = vertex_f[..., 2]
    zn = pts[..., 2]
    valid = (zn > cfg.depth_min) & (jnp.abs(zn - z[..., None]) < 0.05)
    cnt = jnp.sum(valid, axis=-1)
    w = valid.astype(vertex_f.dtype)[..., None]
    denom = jnp.maximum(cnt, 1)[..., None].astype(vertex_f.dtype)
    mean = jnp.sum(pts * w, axis=-2) / denom
    centered = (pts - mean[..., None, :]) * w
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered) / denom[..., None]
    n = pp._smallest_eigvec_3x3(cov)
    n = n * jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    ok = (cnt >= 8) & (z > cfg.depth_min)
    return jnp.where(ok[..., None], n, 0.0)


def _tiny_leaf(out):
    return min(jax.tree.leaves(out), key=lambda l: getattr(l, "size", 1))


ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4,
                 raycast_block_height=16, raycast_bisection_iters=6)

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

key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (1 << 20, 24))
idx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
canary = jax.jit(lambda t, i: t[i].sum(0))

# two separately-jitted step functions; each traces ONCE under its own
# monkeypatch state (module attrs are read at trace time)
step_new = jax.jit(functools.partial(slam.step_many.__wrapped__),
                   static_argnames=("intr", "cfg"))
step_old = jax.jit(functools.partial(slam.step_many.__wrapped__),
                   static_argnames=("intr", "cfg"))

new_curv, new_pca = pp.curvature_gradient, pp.normal_pca
print("compiling old variant...", flush=True)
pp.curvature_gradient, pp.normal_pca = old_curvature_gradient, old_normal_pca
t0 = time.perf_counter()
out = step_old(state0, batch, intr=intr, cfg=cfg)
_ = np.asarray(_tiny_leaf(out))
print(f"compiled step old-preproc ({time.perf_counter()-t0:.0f}s)", flush=True)
pp.curvature_gradient, pp.normal_pca = new_curv, new_pca

VARIANTS = {
    "canary gather1M": lambda: canary(tbl, idx),
    "step old-preproc": lambda: step_old(state0, batch, intr=intr, cfg=cfg),
    "step accum-preproc": lambda: step_new(state0, batch, intr=intr, cfg=cfg),
}
DIV = {n: (1 if n.startswith("canary") else NF) for n in VARIANTS}

for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    out = fn()
    _ = np.asarray(_tiny_leaf(out))
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(_tiny_leaf(out))
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / DIV[name])
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL", flush=True)
for n in best:
    print(f"  {n:24s} {best[n]:8.1f} ms", flush=True)
