"""Benchmark: full SLAM step throughput (track + fuse + clean + HRBF predict)
at the reference's native 640x480 workload, on one TPU chip — plus the
PRODUCT-level number: the complete system (keyframes + local BA + loop
closing, async pipeline) over a Kinect-noisy loopy sequence, reported as
``full_system_fps`` / ``full_system_ate_mm`` in the same JSON line
(VERDICT r3 next-7: the driver-visible bench must capture both the
dense-step and the full-system metric).

Output protocol: LAST JSON LINE WINS.  The dense-only metric prints
immediately (so a harness timeout still captures the headline number), then
with BENCH_FULL=1 (default) a SECOND, complete JSON line re-prints every
key plus the full-system section ({"full_system_fps": N,
"full_system_fps_allin": N, "full_system_max_chunk_s": N,
"full_system_ate_mm": N, "full_system_loops": N}).  A driver should parse
the final JSON line.
Baseline = the reference's 30 fps real-time design target on a desktop GPU
(GUI/src/HRBF_fusion.cpp:237-240; the repo publishes no other numbers,
BASELINE.md).  Set BENCH_FULL=0 to skip the full-system section.
"""

import json
import os
import time

import numpy as np

import jax

# the sparse backend (BA, graph logic) needs the host CPU backend alongside
# the TPU: plain JAX_PLATFORMS=axon (the sitecustomize default) would run
# every backend op eagerly through the remote tunnel at ~27 ms/op
if os.environ.get("JAX_PLATFORMS", "") == "axon":
    jax.config.update("jax_platforms", "axon,cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

BASELINE_FPS = 30.0


def main():
    intr = TUM1  # 640x480
    # the autotuned configuration (tuned.json, the reference's
    # GPUTest/GPUConfig analogue).  Accuracy-bearing dials are validated on
    # full-resolution on-chip ATE (scripts/tpu_ate.py): false-position
    # refinement and the crowd-rule period are ATE-neutral; rejected dials
    # (window2, raycast_period2) are documented there.  Everything else is
    # reference parity (nearest photometric IS the reference's lookup).
    cfg = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                     use_pallas_raycast=True, clean_compact_period=4,
                     raycast_block_height=16, raycast_bisection_iters=6,
                     raycast_false_position=3, clean_crowd_period=4)

    scene = synth.default_room()
    poses = synth.orbit_trajectory(8, angle_per_frame=0.004)
    frames = []
    for i in range(8):
        d, c = synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)
        frames.append(slam.FrameInput(depth=jax.block_until_ready(d), rgb=c))

    state = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
    _ = np.asarray(state.t)

    # batch frames 1..8 into one stacked FrameInput for scan-stepping
    batch = slam.FrameInput(
        depth=jnp.stack([f.depth for f in frames[1:]]),
        rgb=jnp.stack([f.rgb for f in frames[1:]]),
    )
    n_per_call = batch.depth.shape[0]

    # warmup / compile
    state_w, _ = slam.step_many(state, batch, intr, cfg)
    _ = np.asarray(state_w.t)

    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, _ts = slam.step_many(state, batch, intr, cfg)
    # hard sync via host transfer (block_until_ready proved unreliable on
    # the axon remote-execution path)
    _ = np.asarray(state.t)
    dt = time.perf_counter() - t0
    fps = (n_calls * n_per_call) / dt

    out = {
        "metric": "slam_step_fps_640x480",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }
    # print the dense metric IMMEDIATELY: if the full-system section is
    # killed by a harness timeout, the last complete JSON line still
    # carries the headline number
    print(json.dumps(out), flush=True)
    if int(os.environ.get("BENCH_FULL", "1")):
        try:
            out.update(full_system())
        except Exception as e:  # noqa: BLE001 — the dense metric must
            out["full_system_error"] = repr(e)[:200]  # survive regardless
        print(json.dumps(out))


def full_system():
    """Product-level metric: FullSLAM (keyframes + local BA + loop closing
    + active/archive split, BA on-chip — SURVEY §2.14) on a Kinect-noisy
    PANORAMA sweep of the cluttered room at 640x480.

    Protocol (VERDICT r4 next-7): the heading sweeps past 360 deg at the
    PANORAMA_r04-validated angular rate (1.8 deg/frame), so covisibility
    breaks on the way out and the sequence re-reaches its start heading
    around frame 200 — detection -> Sim3 -> correction fires EVERY round
    and ``full_system_loops`` must be >= 1.  Both the steady-median fps
    and the all-in fps (total wall / frames, compile chunks included) are
    reported, plus the worst chunk (VERDICT r4 weak-1: a number that
    filters out minutes of wall-clock is not the number a user
    experiences)."""
    from hrbffusion3d_tpu.eval import ate, synth
    from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

    import sys

    intr = TUM1
    n, kf_period = int(os.environ.get("BENCH_FULL_FRAMES", "281")), 10
    use_async = bool(int(os.environ.get("BENCH_FULL_ASYNC", "1")))
    cfg = SLAMConfig(map_capacity=393216, predict_conf_threshold=0.2,
                     use_pallas_raycast=True, clean_compact_period=4,
                     raycast_block_height=16, raycast_bisection_iters=6,
                     raycast_false_position=3, clean_crowd_period=4,
                     keyframe_period=kf_period, use_global_ba=True,
                     active_capacity=393216, archive_capacity=2097152)
    scene = synth.complex_room()
    # same 1.8 deg/frame heading rate as the validated 401-frame/2-turn
    # panorama (closure window frames 211-261 there, PANORAMA_r04)
    gt = synth.panorama_trajectory(n, n_turns=1.8 * (n - 1) / 360.0)
    sys_ = FullSLAM(intr, cfg, init_pose=gt[0], async_ba=use_async)

    def render(i):
        # device-resident frames (sensor-ingest tunnel artifact excluded —
        # see scripts/tpu_fullslam_bench.py render() for the rationale)
        return synth.render_frame_kinect_jit(
            scene, jnp.asarray(gt[i]), intr, jax.random.PRNGKey(1000 + i),
            1.0)

    d0, c0 = render(0)
    sys_.process(slam.FrameInput(depth=d0, rgb=c0), timestamp=0.0)
    chunk_times = []
    chunk_walls = []
    t_total = 0.0
    i = 1
    while i < n:
        k = min(kf_period, n - i)
        ds, cs = zip(*(render(i + j) for j in range(k)))
        batch = slam.FrameInput(depth=jnp.stack(ds), rgb=jnp.stack(cs))
        _ = np.asarray(batch.depth[0, 0, :2])
        t0 = time.perf_counter()
        sys_.process_batch(batch, timestamps=[float(i + j) for j in range(k)])
        dt = time.perf_counter() - t0
        t_total += dt
        chunk_walls.append(dt)
        chunk_times.append(dt / k)
        print(f"full_system frame {i + k}/{n}: "
              f"{chunk_times[-1] * 1000:.0f} ms/frame  "
              f"kfs {len(sys_.backend.keyframes)} "
              f"loops {len(sys_.loop_closures)}", file=sys.stderr,
              flush=True)
        i += k
    sys_.join_backend()
    if int(os.environ.get("BENCH_SAVE_PLANS", "0")):
        # accrete this protocol's BA plan-shape signatures into the
        # committed union (warm-up runs only; the driver bench reads it)
        sys_.backend.save_plan_cache(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "ba_plans.json"))
    # steady-state estimator (chunks > 3x the best are compile-dominated)
    # — reported ALONGSIDE the all-in number, never instead of it
    floor = min(chunk_times)
    steady = [t for t in chunk_times[1:] if t < 3 * floor] or chunk_times
    fps = 1.0 / float(np.median(steady))
    fps_allin = (n - 1) / t_total
    err = ate.ate_rmse(sys_.poses(), gt[: len(sys_.trajectory)], align=False)
    return {"full_system_fps": round(fps, 2),
            "full_system_fps_allin": round(fps_allin, 2),
            "full_system_max_chunk_s": round(max(chunk_walls), 1),
            "full_system_ate_mm": round(err * 1000, 2),
            "full_system_loops": len(sys_.loop_closures),
            "full_system_vs_baseline": round(fps / BASELINE_FPS, 3)}


if __name__ == "__main__":
    main()
