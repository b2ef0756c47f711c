"""Pre-compile the jitted step graphs for a ladder of map-capacity buckets
into the persistent compile cache (.jax_cache), so a mid-sequence capacity
doubling (slam.ensure_capacity) never stalls a live run on the >=10-minute
serialized remote compile (VERDICT r1 'what's weak' item 3).

Each capacity bucket is a distinct jit specialisation of step_many (cfg is a
static argument).  This tool compiles them ahead of time by running one
tiny-but-real scan per bucket; with the persistent cache enabled the
compiled executables are reusable by any later process.

Usage:
  python scripts/prewarm_cache.py                       # bench ladder
  python scripts/prewarm_cache.py --caps 393216,786432  # explicit buckets
  python scripts/prewarm_cache.py --batch 7 --width 640 --height 480
"""

import argparse
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


def bench_config(cap: int) -> SLAMConfig:
    """The tuned bench configuration (tuned.json) at a given capacity."""
    return SLAMConfig(map_capacity=cap, predict_conf_threshold=0.2,
                      use_pallas_raycast=True, clean_compact_period=4,
                      raycast_block_height=16, raycast_bisection_iters=6,
                      raycast_false_position=3, clean_crowd_period=4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="393216,786432,1572864",
                    help="comma-separated capacity buckets "
                         "(default: bench bucket + 2 doublings)")
    ap.add_argument("--batch", type=int, default=7,
                    help="scan batch size (must match the run that reuses "
                         "the cache; bench.py uses 7)")
    ap.add_argument("--chunk", action="store_true",
                    help="compile step_chunk (the FullSLAM.process_batch "
                         "graph) instead of step_many")
    ap.add_argument("--exchange", action="store_true",
                    help="also compile the active/archive exchange graph "
                         "for each --arch-caps bucket (active cap = map "
                         "cap; use with --chunk for full-slam protocols)")
    ap.add_argument("--arch-caps", default="2097152,4194304,8388608",
                    help="archive capacity buckets for --exchange")
    ap.add_argument("--kf-period", type=int, default=10)
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    intr = TUM1
    scene = synth.default_room()
    poses = synth.orbit_trajectory(args.batch + 1, angle_per_frame=0.004)
    frames = []
    for i in range(args.batch + 1):
        d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
        frames.append(slam.FrameInput(depth=d, rgb=c))
    batch = slam.FrameInput(
        depth=jnp.stack([f.depth for f in frames[1:]]),
        rgb=jnp.stack([f.rgb for f in frames[1:]]),
    )

    for cap in caps:
        cfg = bench_config(cap)
        if args.exchange:
            cfg = dataclasses.replace(cfg, active_capacity=cap,
                                      keyframe_period=args.kf_period)
        t0 = time.perf_counter()
        state = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
        _ = np.asarray(state.t)
        t1 = time.perf_counter()
        if args.chunk:
            out, packed = slam.step_chunk(state, batch, intr, cfg)
            _ = np.asarray(packed)
        else:
            out, _ts = slam.step_many(state, batch, intr, cfg)
            _ = np.asarray(out.t)
        t2 = time.perf_counter()
        ex_s = 0.0
        if args.exchange:
            # exchange graph for every archive bucket of this active cap
            # (VERDICT r3 next-6: mid-run archive growth must never stall
            # a live run on the remote compiler, nor trip its HBM-estimate
            # failure where a live artifact is lost — fail HERE instead)
            from hrbffusion3d_tpu.map import surfel_map as sm

            mask = np.zeros((cfg.max_submaps,), bool)
            mask[0] = True
            t3 = time.perf_counter()
            for arch_cap in [int(c) for c in args.arch_caps.split(",")]:
                arch = sm.empty_map(arch_cap)
                a2, r2, stats = sm.exchange_active(
                    out.map, arch, jnp.asarray(mask),
                    jnp.int32(int(np.asarray(out.time))), cfg)
                _ = np.asarray(stats)
            ex_s = time.perf_counter() - t3
        print(f"cap {cap:>8}: bootstrap {t1 - t0:6.1f}s  "
              f"step {t2 - t1:6.1f}s  exchange {ex_s:6.1f}s  "
              f"(cached if seconds, compile if minutes)", flush=True)


if __name__ == "__main__":
    main()
