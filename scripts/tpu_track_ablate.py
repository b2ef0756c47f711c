"""Decompose the tracking GN loop's on-chip cost: time odometry.track alone
under varying iteration budgets / term selections (each a separate small
graph; deltas give per-iteration and per-term costs).

Interleaved-min protocol with canary (NOTES_R1: axon throughput fluctuates).
"""

import dataclasses
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
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.tracking import odometry

ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4,
                 raycast_block_height=16, raycast_bisection_iters=6)

scene = synth.default_room()
poses = synth.orbit_trajectory(3, angle_per_frame=0.004)
d0, c0 = synth.render_frame_jit(scene, jnp.asarray(poses[0]), intr)
d1, c1 = synth.render_frame_jit(scene, jnp.asarray(poses[1]), intr)
state = slam.bootstrap(slam.FrameInput(depth=d0, rgb=c0), intr, cfg,
                       init_pose=poses[0])
_ = np.asarray(state.t)
print("bootstrap done", flush=True)

# realistic tracking inputs from the live state
from hrbffusion3d_tpu.ops import preprocess, pyramid

depth_f = preprocess.bilateral_filter(d1, cfg)
pre = preprocess.vertex_normal_radius(d1, depth_f, intr, cfg)
curv = preprocess.curvature_gradient(pre, intr, cfg)
pre = preprocess.update_normal_rad(pre, curv, cfg)
intensity = pyramid.rgb_to_intensity(c1)

build = jax.jit(functools.partial(odometry.build_inputs, cfg=cfg))
inp = build(
    next_depth=depth_f, next_intensity=intensity,
    next_vmap=pre.vertex_filtered, next_nmap=pre.normal,
    pred_vmap=state.pred_vertex, pred_nmap=state.pred_normal,
    pred_intensity=state.pred_intensity, icp_weight=state.pred_icp_weight,
    prev_R=state.R, prev_t=state.t, prev_intensity=state.prev_intensity)
inp = jax.tree.map(lambda x: jax.device_put(x), inp)
_ = np.asarray(inp.next_depth[0])
print("inputs built", flush=True)


def track_with(**over):
    c = dataclasses.replace(cfg, **over)
    f = jax.jit(lambda R, t, i: odometry.track(R, t, i, intr, c))
    return lambda: f(state.R, state.t, inp)


key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (1 << 20, 24))
idx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
canary = jax.jit(lambda t, i: t[i].sum(0))

VARIANTS = {
    "canary gather1M": lambda: canary(tbl, idx),
    "track 10-5-4": track_with(),
    "track 0-0-0": track_with(pyramid_iterations=(0, 0, 0)),
    "track 5-5-4": track_with(pyramid_iterations=(5, 5, 4)),
    "track 10-0-4": track_with(pyramid_iterations=(10, 0, 4)),
    "track fori(eps0)": track_with(tracking_converge_eps=0.0),
    "track icp-only": track_with(icp_weight=100.0),
    "track rgb-off-joint-off": track_with(tracking_joint_gather=False),
    "track no-so3": track_with(so3_prealign=False),
    "track reassoc2": track_with(tracking_reassoc_period=2),
}


def _tiny(out):
    return np.asarray(out.t)


for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    out = fn()
    if name.startswith("canary"):
        _ = np.asarray(out)
    else:
        _ = _tiny(out)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
for r in range(ROUNDS):
    for name, fn in VARIANTS.items():
        t0 = time.perf_counter()
        out = fn()
        if name.startswith("canary"):
            _ = np.asarray(out)
        else:
            _ = _tiny(out)
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000)
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.1f}" for n in best),
          flush=True)

print("FINAL (ms per call, incl ~27ms dispatch)", flush=True)
for n in best:
    print(f"  {n:26s} {best[n]:8.1f} ms", flush=True)
