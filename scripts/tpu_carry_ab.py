"""A/B the scan-carry restructure (VERDICT r3 next-4a): step_many
(lax.scan while-loop, double-buffered carry) vs step_many_unrolled
(unroll=True, straight-line HLO with buffer aliasing) at the default bench
config, interleaved in one process with a canary (tpu_ab.py protocol:
min over rounds beats the 2-10x service-throughput noise).

Env: AB_ROUNDS (default 12), AB_CAP (default 393216).
"""

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

ROUNDS = int(os.environ.get("AB_ROUNDS", "12"))
CAP = int(os.environ.get("AB_CAP", "393216"))

intr = TUM1
CFG = SLAMConfig(map_capacity=CAP, predict_conf_threshold=0.2,
                 use_pallas_raycast=True, clean_compact_period=4,
                 raycast_block_height=16, raycast_bisection_iters=6,
                 raycast_false_position=3, clean_crowd_period=4)

scene = synth.default_room()
poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
frames = []
for i in range(8):
    d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
    frames.append(slam.FrameInput(depth=d, rgb=c))
state0 = slam.bootstrap(frames[0], intr, CFG, init_pose=poses[0])
_ = np.asarray(state0.t)
print("bootstrap done", flush=True)

batch = slam.FrameInput(
    depth=jnp.stack([f.depth for f in frames[1:]]),
    rgb=jnp.stack([f.rgb for f in frames[1:]]),
)
NF = batch.depth.shape[0]

_ctab = jnp.arange(1 << 20 << 4, dtype=jnp.float32).reshape(1 << 20, 16)
_cidx = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, (1 << 20,)))
_canary = jax.jit(lambda t, i: t[i].sum())


def run_canary():
    t0 = time.perf_counter()
    _ = float(np.asarray(_canary(_ctab, _cidx)))
    return (time.perf_counter() - t0) * 1000


FNS = {"scan": slam.step_many, "unroll": slam.step_many_unrolled}

for name, fn in FNS.items():
    t0 = time.perf_counter()
    out = fn(state0, batch, intr, CFG)
    _ = np.asarray(out[0].t)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
    # equivalence probe: same final pose to fp tolerance
    if name != "scan":
        ref = FNS["scan"](state0, batch, intr, CFG)
        d = float(jnp.max(jnp.abs(out[0].t - ref[0].t)))
        print(f"  final-pose |diff| vs scan: {d:.2e}", flush=True)
_ = run_canary()

best = {n: 1e9 for n in FNS}
best["canary"] = 1e9
for r in range(ROUNDS):
    for name, fn in FNS.items():
        t0 = time.perf_counter()
        out = fn(state0, batch, intr, CFG)
        _ = np.asarray(out[0].t)
        best[name] = min(best[name], (time.perf_counter() - t0) * 1000 / NF)
    best["canary"] = min(best["canary"], run_canary())
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.1f}" for n in best),
          flush=True)

print("FINAL " + "  ".join(f"{n}={best[n]:.2f}ms/frame" for n in best),
      flush=True)
