"""CPU probe for the real-drift closure regression test (VERDICT r3
next-3): a small-res Kinect-noisy panorama where tracking drift accrues
through the REAL pipeline (no injection), covisibility breaks on the
heading sweep, and the closure at parity consistency must fire and improve
ATE vs the dense-only twin.

Run: JAX_PLATFORMS=cpu python scripts/loop_drift_probe.py
Env: LP_FRAMES (default 100), LP_TURNS (1.3), LP_NOISE (3.0),
     LP_CONSISTENCY (3), LP_KF (2), LP_RES (128).
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

N = int(os.environ.get("LP_FRAMES", "100"))
TURNS = float(os.environ.get("LP_TURNS", "1.3"))
NOISE = float(os.environ.get("LP_NOISE", "3.0"))
CONS = int(os.environ.get("LP_CONSISTENCY", "3"))
KF = int(os.environ.get("LP_KF", "2"))
RES = int(os.environ.get("LP_RES", "128"))

W, H = RES, (RES * 3) // 4
INTR = CameraIntrinsics(fx=0.8 * W, fy=0.8 * W, cx=W / 2 - 0.5,
                        cy=H / 2 - 0.5, width=W, height=H)
CFG = small_test_config(
    map_capacity=1 << 17,
    pyramid_iterations=(10, 5, 4),
    so3_iterations=10,
    predict_conf_threshold=0.2,
    keyframe_period=KF,
)

scene = synth.complex_room()
gt = synth.panorama_trajectory(N, n_turns=TURNS)


def render(i):
    return synth.render_frame_kinect_jit(
        scene, jnp.asarray(gt[i]), INTR, jax.random.PRNGKey(77 + i), NOISE)


def run(use_backend: bool):
    cfg = CFG if use_backend else dataclasses.replace(
        CFG, use_local_ba=False, use_global_ba=False)
    sys_ = FullSLAM(INTR, cfg, backend_kwargs=dict(fast_threshold=8.0),
                    loop_kwargs=dict(consistency=CONS),
                    init_pose=gt[0])
    t0 = time.perf_counter()
    for i in range(N):
        d, c = render(i)
        sys_.process(slam.FrameInput(depth=d, rgb=c), timestamp=float(i))
        if i % 20 == 0:
            print(f"  frame {i}/{N} ({time.perf_counter()-t0:.0f}s) "
                  f"loops {len(sys_.loop_closures)}", flush=True)
    err = ate.ate_rmse(sys_.poses(), gt, align=False)
    print(f"{'full' if use_backend else 'dense-only'}: ATE {err*1000:.2f} mm  "
          f"loops {len(sys_.loop_closures)}  "
          f"kfs {len(sys_.backend.keyframes) if use_backend else 0}  "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
    return err, len(sys_.loop_closures)


err_d, _ = run(False)
err_f, n_loops = run(True)
print(f"RESULT dense={err_d*1000:.2f}mm full={err_f*1000:.2f}mm "
      f"loops={n_loops} improved={err_f < err_d}")
