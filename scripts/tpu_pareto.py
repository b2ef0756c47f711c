"""Dense accuracy-speed Pareto sweep on the real chip (VERDICT r4 next-5).

The r3/r4 fast modes (patch association, top-k saliency selection,
re-association period, subsampling, raycast neighbor budget) each buy
throughput at a long-horizon accuracy price that was only ever measured at
ONE strength each.  This sweep runs the long-horizon dense-only protocol
(211-frame Kinect-noisy loopy trajectory of the cluttered room at 640x480
— the FULLSLAM protocol minus the sparse backend; fp-chaos band +-0.4 mm,
NOTES_R3) across a grid of strengths and combinations, reporting steady
fps + unaligned ATE per point.  Adoption rule (VERDICT r4 next-5): any
point >= 20 fps within +1.0 mm of base ATE becomes the default; otherwise
the committed front documents the chip's accuracy-speed frontier.

Env: PAR_FRAMES (211), PAR_CAP (1048576), PAR_VARIANTS (comma list to
subset), PAR_ROUNDS (1) extra repeats of the whole grid for chaos-band
estimation.
"""

import dataclasses
import json
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
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam

N = int(os.environ.get("PAR_FRAMES", "211"))
CAP = int(os.environ.get("PAR_CAP", "1048576"))
KF = 10  # chunk size, matches the full-system protocol's batching

intr = TUM1
BASE = SLAMConfig(map_capacity=CAP, predict_conf_threshold=0.2,
                  use_pallas_raycast=True, clean_compact_period=4,
                  raycast_block_height=16, raycast_bisection_iters=6,
                  raycast_false_position=3, clean_crowd_period=4)

# strengths bracketing the single points measured in r3 (NOTES_R3: patch_r1
# +1.8 fps / +2.5 mm, topk +2.1 fps / +5.6 mm at long horizon) plus the
# dials VERDICT r4 next-5 names: patch radius, topk row budget, reassoc
# period, raycast neighbor count — and the combinations that could reach
# the 20 fps target from 15.5.
VARIANTS = {
    "base": {},
    "reassoc2": {"tracking_reassoc_period": 2},
    "patch_r1": {"tracking_patch_assoc": True, "tracking_patch_radius": 1},
    "patch_r2": {"tracking_patch_assoc": True, "tracking_patch_radius": 2},
    "topk96k_f2": {"tracking_topk": 98304, "tracking_topk_full_iters": 2},
    "sub2_f3": {"tracking_subsample": 2, "tracking_subsample_full_iters": 3},
    "nb8": {"predict_max_neighbors": 8},
    "combo_pr2_nb8": {"tracking_patch_assoc": True,
                      "tracking_patch_radius": 2,
                      "predict_max_neighbors": 8},
    # patch + topk compose (scripts/tpu_ate.py "combo"); subsample does NOT
    # thread through either fast driver (odometry.py drive_patch gate) so
    # it is swept alone
    "combo_pr1_topk150_nb8": {"tracking_patch_assoc": True,
                              "tracking_patch_radius": 1,
                              "tracking_topk": 153600,
                              "tracking_topk_full_iters": 2,
                              "predict_max_neighbors": 8},
}
sel = os.environ.get("PAR_VARIANTS", "")
if sel:
    VARIANTS = {k: VARIANTS[k] for k in sel.split(",")}

scene = synth.complex_room()
gt = synth.loopy_trajectory(N, n_loops=2, radius=0.55)


def render(i):
    return synth.render_frame_kinect_jit(
        scene, jnp.asarray(gt[i]), intr, jax.random.PRNGKey(1000 + i), 1.0)


def run_variant(cfg):
    d0, c0 = render(0)
    state = slam.bootstrap(slam.FrameInput(depth=d0, rgb=c0), intr, cfg,
                           init_pose=gt[0])
    _ = np.asarray(state.t)
    ts = [np.asarray(gt[0][:3, 3])]
    chunk_ms = []
    i = 1
    while i < N:
        k = min(KF, N - i)
        ds, cs = zip(*(render(i + j) for j in range(k)))
        batch = slam.FrameInput(depth=jnp.stack(ds), rgb=jnp.stack(cs))
        _ = np.asarray(batch.depth[0, 0, :2])  # sync renders out of timing
        t0 = time.perf_counter()
        state, tchunk = slam.step_many(state, batch, intr, cfg)
        tchunk = np.asarray(tchunk)
        chunk_ms.append((time.perf_counter() - t0) * 1000 / k)
        ts.extend(list(tchunk))
        i += k
    est = np.tile(np.eye(4, dtype=np.float64), (len(ts), 1, 1))
    est[:, :3, 3] = np.asarray(ts)
    err = ate.ate_rmse(est, gt[: len(ts)], align=False)
    steady = [t for t in chunk_ms[1:] if t < 3 * min(chunk_ms)] or chunk_ms
    return {"fps_steady": round(1000.0 / float(np.median(steady)), 2),
            "ate_mm": round(err * 1000, 2),
            "compile_chunk_s": round(chunk_ms[0] * KF / 1000, 1),
            "ms_frame": round(float(np.median(steady)), 1)}


results = {}
for name, over in VARIANTS.items():
    cfg = dataclasses.replace(BASE, **over)
    t0 = time.perf_counter()
    try:
        results[name] = run_variant(cfg)
    except Exception as e:  # noqa: BLE001 — one bad point must not kill the sweep
        results[name] = {"error": repr(e)[:200]}
        print(f"{name}: FAILED {e!r}", flush=True)
        continue
    r = results[name]
    print(f"{name:22s} {r['fps_steady']:6.2f} fps  {r['ate_mm']:7.2f} mm  "
          f"(compile {r['compile_chunk_s']}s, total "
          f"{time.perf_counter() - t0:.0f}s)", flush=True)

base_ate = results.get("base", {}).get("ate_mm")
print(json.dumps({"protocol": f"{N}-frame dense-only Kinect-noisy loopy "
                              f"trajectory, complex_room 640x480, cap {CAP}",
                  "base_ate_mm": base_ate, "results": results}))
