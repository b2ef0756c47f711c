"""Run the full SLAM system on a TUM RGB-D sequence directory.

Usage:
  python scripts/run_tum.py /path/to/rgbd_dataset_freiburg1_desk \
      [--camera TUM1] [--end 200] [--out out_dir] [--no-ba]

Produces hrbf_trajectory.freiburg (TUM format), the keyframe trajectory and
the surfel-map PLY — the reference's standard artifacts
(TrajectoryManager.cpp:313-345, HRBFFusion.cpp:1737+,2052+).  If
groundtruth.txt exists, prints ATE.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--camera", default="TUM1", choices=["TUM1", "TUM2", "TUM3", "ICL_NUIM"])
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--out", default=".")
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--load-trajectory", default=None, metavar="TUMFILE",
                    help="replay mode: skip tracking, take per-frame poses "
                         "from a TUM-format trajectory "
                         "(globalInputLoadTrajectory, HRBFFusion.cpp:1105)")
    ap.add_argument("--stats", action="store_true",
                    help="write per-frame stats.jsonl + "
                         "sequence_processing_time.txt to --out")
    ap.add_argument("--views", type=int, default=0, metavar="N",
                    help="dump an N-view turntable render of the final map "
                         "(headless GUI analogue) to --out/views/")
    args = ap.parse_args()

    from hrbffusion3d_tpu.utils import tpu_cache

    tpu_cache.enable()

    import dataclasses

    import jax.numpy as jnp

    from hrbffusion3d_tpu import config as cfgm
    from hrbffusion3d_tpu.eval import ate
    from hrbffusion3d_tpu.io import tum
    from hrbffusion3d_tpu.pipeline import slam
    from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

    intr = getattr(cfgm, args.camera)
    cfg = dataclasses.replace(
        cfgm.SLAMConfig(),
        map_capacity=args.capacity,
        use_local_ba=not args.no_ba,
        use_global_ba=not args.no_ba,
    )

    replay_poses = None
    if args.load_trajectory:
        from hrbffusion3d_tpu.io import traj as trajio

        _, replay_poses = trajio.load_tum(args.load_trajectory)
        cfg = dataclasses.replace(cfg, use_local_ba=False, use_global_ba=False)

    os.makedirs(args.out, exist_ok=True)
    stats = None
    sw = None
    if args.stats:
        from hrbffusion3d_tpu.utils import timing
        from hrbffusion3d_tpu.viz.stats import StatsLogger

        stats = StatsLogger(os.path.join(args.out, "stats.jsonl"))
        sw = timing.Stopwatch()

    sys_ = FullSLAM(intr, cfg)
    t0 = time.time()
    n = 0
    for fr in tum.frames_prefetched(args.root, start=args.start, end=args.end):
        fixed = None
        if replay_poses is not None:
            fixed = jnp.asarray(replay_poses[min(n, len(replay_poses) - 1)])
        if sw is not None:
            sw.tick("processFrame")
        sys_.process(
            slam.FrameInput(depth=jnp.asarray(fr.depth), rgb=jnp.asarray(fr.rgb)),
            timestamp=fr.timestamp, fixed_pose=fixed,
        )
        if sw is not None:
            sw.tock("processFrame")
            sw.broadcast()  # Stopviz-style UDP telemetry (Stopwatch.h:136)
        if stats is not None:
            stats.log_state(n, sys_.state)
        n += 1
        if n % 50 == 0:
            print(f"frame {n}  {n / (time.time() - t0):.2f} fps", flush=True)

    if stats is not None:
        stats.close()
        stats.dump_reference_artifacts(args.out)
    if sw is not None:
        sw.dump(os.path.join(args.out, "sequence_processing_time.txt"))
    sys_.save_trajectory_tum(os.path.join(args.out, "hrbf_trajectory.freiburg"))
    n_pts = sys_.save_map_ply(os.path.join(args.out, "hrbf_globalModel.ply"))
    kts, kposes = sys_.backend.keyframe_trajectory()
    from hrbffusion3d_tpu.io import traj as trajio

    if len(kts):
        trajio.save_tum(os.path.join(args.out, "KeyFrameTrajectory.txt"), kts, kposes)
    print(f"{n} frames, map {n_pts} surfels, "
          f"{len(sys_.backend.keyframes)} keyframes, "
          f"{len(sys_.loop_closures)} loop closures")

    if args.views:
        from hrbffusion3d_tpu.viz import viewer

        paths = viewer.turntable(sys_.state.map, intr,
                                 os.path.join(args.out, "views"),
                                 n_views=args.views)
        print(f"wrote {len(paths)} turntable views to {args.out}/views/")

    gt_path = os.path.join(args.root, "groundtruth.txt")
    if os.path.exists(gt_path):
        gt_ts, gt_poses = tum.load_groundtruth(gt_path)
        matched, valid = tum.associate_gt(np.asarray(sys_.timestamps), gt_ts, gt_poses)
        est = sys_.poses()[valid]
        print(f"ATE RMSE: {ate.ate_rmse(est, matched[valid]):.4f} m "
              f"({valid.sum()} matched frames)")


if __name__ == "__main__":
    main()
