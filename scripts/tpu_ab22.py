"""AB batch 22: finest-level GN pixel subsampling (tracking_subsample) +
clean-period dials, plus a narrow-array layout calibration probe (does a
(N, 24) f32 array cost like (N, 128) on this chip — i.e. is the minor dim
physically padded to the 128-lane tile?).

Protocol: interleaved round-robin, per-variant MIN (tpu_ab.py); canary =
1M-row gather, healthy ~35 ms.
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))

intr = TUM1
BASE = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                  use_pallas_raycast=True, clean_compact_period=4,
                  raycast_block_height=16, raycast_bisection_iters=6,
                  raycast_false_position=3, clean_crowd_period=4)

VARIANTS = {
    "base": BASE,
    "sub2f3": dataclasses.replace(BASE, tracking_subsample=2),
    "sub2f2": dataclasses.replace(BASE, tracking_subsample=2,
                                  tracking_subsample_full_iters=2),
    "sub3f3": dataclasses.replace(BASE, tracking_subsample=3),
    "compact8": dataclasses.replace(BASE, clean_compact_period=8),
    "crowd8": dataclasses.replace(BASE, clean_crowd_period=8),
}

# ---- layout probe: copy+add throughput on narrow vs wide minor dims ----
N = 393216


def _probe(shape):
    x = jnp.ones(shape, jnp.float32)
    f = jax.jit(lambda a: a * 1.000001 + 0.5)
    _ = np.asarray(f(x)).ravel()[0]
    best = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        _ = np.asarray(f(x)).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def probe_layout():
    a = _probe((N, 24))
    b = _probe((N, 128))
    c = _probe((N * 24,))
    d = _probe((N // 8, 128))   # same elems as (N,24), 128-wide
    print(f"layout probe: (N,24)={a:.2f}ms  (N,128)={b:.2f}ms  "
          f"flat={c:.2f}ms  (N/8,128)={d:.2f}ms", flush=True)


probe_layout()

# ---- canary ----
ckey = jax.random.PRNGKey(0)
ctab = jax.random.normal(ckey, (1 << 20, 24))
cidx = jax.random.randint(ckey, (1 << 20,), 0, 1 << 20)
cgather = jax.jit(lambda t, i: t[i].sum())
_ = np.asarray(cgather(ctab, cidx))


def canary():
    t0 = time.perf_counter()
    _ = np.asarray(cgather(ctab, cidx))
    return (time.perf_counter() - t0) * 1000


scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, BASE, init_pose=poses[0])
_ = np.asarray(state0.t)
print("bootstrap done", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]

for name, c in VARIANTS.items():
    t0 = time.perf_counter()
    out = slam.step_many(state0, batch, intr, c)
    _ = np.asarray(out[0].t)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)

best = {n: 1e9 for n in VARIANTS}
best_canary = 1e9
for r in range(ROUNDS):
    best_canary = min(best_canary, canary())
    for name, c in VARIANTS.items():
        t0 = time.perf_counter()
        out = slam.step_many(state0, batch, intr, c)
        _ = np.asarray(out[0].t)
        dt = (time.perf_counter() - t0) * 1000 / NF
        best[name] = min(best[name], dt)
    print(f"round {r} (canary {best_canary:.1f}): "
          + "  ".join(f"{n}={best[n]:.1f}" for n in best), flush=True)

probe_layout()
print(f"FINAL canary={best_canary:.1f}  "
      + "  ".join(f"{n}={best[n]:.1f}ms/frame" for n in best), flush=True)
