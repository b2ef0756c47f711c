"""Interleaved A/B/n benchmark: round-robin the variants for many rounds and
report the MIN per variant.  The axon service throughput fluctuates 2-10x on
~minutes timescales, so consecutive one-shot timings are garbage; the min
over a long interleaved window estimates true device time (healthy moments
hit every variant).  A canary variant (1M-row gather, healthy ~35 ms) runs
every round so sick windows are visible.

This is THE parameterized A/B harness (the round-1 tpu_ab2..22 one-off
clones are consolidated here).  Variants are given on the CLI as config
overrides of the tuned bench configuration:

  python scripts/tpu_ab.py base sub2='tracking_subsample:2' \
      iters854='pyramid_iterations:(8,5,4)' \
      fast='tracking_subsample:2;clean_crowd_period:8'

Env: AB_ROUNDS (default 14), AB_CAP (map capacity, default 393216).
"""

import ast
import dataclasses
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

ROUNDS = int(os.environ.get("AB_ROUNDS", "14"))
CAP = int(os.environ.get("AB_CAP", "393216"))

intr = TUM1
# the tuned bench configuration (tuned.json)
BASE = SLAMConfig(map_capacity=CAP, predict_conf_threshold=0.2,
                  use_pallas_raycast=True, clean_compact_period=4,
                  raycast_block_height=16, raycast_bisection_iters=6,
                  raycast_false_position=3, clean_crowd_period=4)


def parse_variant(spec: str):
    """'name=field:value;field:value' -> (name, cfg)."""
    if "=" not in spec:
        return spec, BASE
    name, rest = spec.split("=", 1)
    over = {}
    for kv in rest.split(";"):
        k, v = kv.split(":", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            over[k] = v
    return name, dataclasses.replace(BASE, **over)


VARIANTS = dict(parse_variant(s) for s in (sys.argv[1:] or ["base"]))

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

# canary: service-health probe, independent of any config dial
_ctab = jnp.arange(1 << 20 << 4, dtype=jnp.float32).reshape(1 << 20, 16)
_cidx = jnp.asarray(
    np.random.default_rng(0).integers(0, 1 << 20, (1 << 20,)))
_canary = jax.jit(lambda t, i: t[i].sum())


def run_canary():
    t0 = time.perf_counter()
    _ = float(np.asarray(_canary(_ctab, _cidx)))
    return (time.perf_counter() - t0) * 1000


# warmup/compile all (bootstrap state may need per-variant capacity)
states = {}
for name, c in VARIANTS.items():
    t0 = time.perf_counter()
    st = state0
    if c.map_capacity != BASE.map_capacity:
        st = slam.bootstrap(frames[0], intr, c, init_pose=poses[0])
    states[name] = st
    out = slam.step_many(st, batch, intr, c)
    _ = np.asarray(out[0].t)
    print(f"compiled {name} ({time.perf_counter()-t0:.0f}s)", flush=True)
_ = run_canary()

best = {n: 1e9 for n in VARIANTS}
best["canary"] = 1e9
for r in range(ROUNDS):
    for name, c in VARIANTS.items():
        t0 = time.perf_counter()
        out = slam.step_many(states[name], batch, intr, c)
        _ = np.asarray(out[0].t)
        dt = (time.perf_counter() - t0) * 1000 / NF
        best[name] = min(best[name], dt)
    best["canary"] = min(best["canary"], run_canary())
    print(f"round {r}: " + "  ".join(f"{n}={best[n]:.0f}" for n in best),
          flush=True)

print("FINAL " + "  ".join(f"{n}={best[n]:.1f}ms/frame" for n in best),
      flush=True)
