"""TPU autotune harness — the reference's GPUTest analogue.

The reference sweeps a 32x32 (threads, blocks) grid over its tracking
kernels, 5 reps each, and prints the best GPUConfig entries
(GPUTest/src/GPUTest.cpp:146-333).  On TPU the tunables are different —
config toggles and chunk/block sizes that steer XLA/Mosaic codegen — but
the protocol is the same idea, hardened for the axon service's 2-10x
throughput fluctuation: all variants interleaved round-robin, per-variant
MIN, plus a fixed canary that flags slow windows (NOTES_R1).

Writes the winning configuration to ``tuned.json`` (read back with
--apply to print the SLAMConfig overrides).

Usage:  python scripts/autotune.py [--rounds 8] [--out tuned.json]
"""

import argparse
import itertools
import json
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _tiny_leaf(out):
    import jax

    return min(jax.tree.leaves(out), key=lambda l: getattr(l, "size", 1))


# The tunable axes (name, values).  Every combination shares the same jit
# cache bucket structure, so the sweep cost is dominated by compiles of
# genuinely different graphs.
# Round-1 sweeps settled use_pallas_raycast=True, geometric ladder ON and
# joint-gather tracking ON (NOTES_R1); the remaining uncertain axes:
AXES = {
    "raycast_block_height": [8, 16],
    "clean_compact_period": [4, 1],
    "raycast_bisection_iters": [10, 6],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--out", default="tuned.json")
    ap.add_argument("--max-variants", type=int, default=8,
                    help="sweep the first N combinations (compile budget)")
    args = ap.parse_args()

    from hrbffusion3d_tpu.utils import tpu_cache

    tpu_cache.enable()

    import jax
    import jax.numpy as jnp

    from hrbffusion3d_tpu.config import TUM1, SLAMConfig
    from hrbffusion3d_tpu.eval import synth
    from hrbffusion3d_tpu.pipeline import slam

    intr = TUM1
    base = SLAMConfig(map_capacity=1 << 19, predict_conf_threshold=0.2,
                      use_pallas_raycast=True)

    scene = synth.default_room()
    poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
    frames = [slam.FrameInput(*synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr))
              for i in range(8)]
    state0 = slam.bootstrap(frames[0], intr, base, init_pose=poses[0])
    _ = np.asarray(state0.t)
    batch = slam.FrameInput(depth=jnp.stack([f.depth for f in frames[1:]]),
                            rgb=jnp.stack([f.rgb for f in frames[1:]]))
    nf = batch.depth.shape[0]

    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (1 << 20, 24))
    cidx = jax.random.randint(key, (1 << 20,), 0, 1 << 20)
    canary = jax.jit(lambda t, i: t[i].sum(0))

    names = list(AXES)
    combos = list(itertools.product(*AXES.values()))[: args.max_variants]
    variants = {}
    for c in combos:
        overrides = dict(zip(names, c))
        cfg = dataclasses.replace(base, **overrides)
        label = ",".join(f"{k.split('_')[-1]}={v}" for k, v in overrides.items())
        variants[label] = (cfg, overrides)

    fns = {"canary": lambda: canary(tbl, cidx)}
    for label, (cfg, _) in variants.items():
        fns[label] = (lambda c=cfg: slam.step_many(state0, batch, intr, c))

    for nm, fn in fns.items():
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(_tiny_leaf(out))
        print(f"compiled {nm} ({time.perf_counter()-t0:.0f}s)", flush=True)

    best = {nm: 1e9 for nm in fns}
    for r in range(args.rounds):
        for nm, fn in fns.items():
            t0 = time.perf_counter()
            out = fn()
            _ = np.asarray(_tiny_leaf(out))
            div = 1 if nm == "canary" else nf
            best[nm] = min(best[nm], (time.perf_counter() - t0) * 1000 / div)
        print(f"round {r}: " + "  ".join(f"{nm}={best[nm]:.0f}" for nm in best),
              flush=True)

    winner = min((nm for nm in best if nm != "canary"), key=lambda nm: best[nm])
    result = {
        "canary_ms": best["canary"],
        "results_ms_per_frame": {nm: best[nm] for nm in best if nm != "canary"},
        "winner": winner,
        "winner_overrides": variants[winner][1],
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
