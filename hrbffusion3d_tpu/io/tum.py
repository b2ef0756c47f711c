"""TUM RGB-D dataset IO.

Replaces the reference's ``RawImageLogReader`` + the direct OpenCV reads in
``HRBFFusion::inputFrame`` (HRBFFusion.cpp:240-270): association-file
parsing, 16-bit PNG depth (1/5000 m units), 8-bit RGB — via PIL (no OpenCV
on this image)."""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

TUM_DEPTH_SCALE = 1.0 / 5000.0  # TUM PNG depth unit -> meters


class TUMFrame(NamedTuple):
    timestamp: float
    depth: np.ndarray   # (H,W) float32 meters, 0 = invalid
    rgb: np.ndarray     # (H,W,3) float32 in [0,1]


def read_associations(path: str):
    """Parse associations.txt: 'ts_rgb rgb_path ts_depth depth_path' (or the
    depth-first variant; detected by extension)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 4:
                continue
            ts0, p0, ts1, p1 = parts[:4]
            if "depth" in p0:
                depth_p, rgb_p, ts = p0, p1, float(ts0)
            else:
                rgb_p, depth_p, ts = p0, p1, float(ts0)
            out.append((ts, rgb_p, depth_p))
    return out


def load_frame(root: str, rgb_path: str, depth_path: str,
               timestamp: float, depth_scale: float = TUM_DEPTH_SCALE) -> TUMFrame:
    from PIL import Image

    depth_img = np.asarray(Image.open(os.path.join(root, depth_path)))
    depth = depth_img.astype(np.float32) * depth_scale
    rgb_img = np.asarray(Image.open(os.path.join(root, rgb_path)).convert("RGB"))
    rgb = rgb_img.astype(np.float32) / 255.0
    return TUMFrame(timestamp=timestamp, depth=depth, rgb=rgb)


def frames(root: str, associations: str = "associations.txt",
           start: int = 0, end: int | None = None,
           depth_scale: float = TUM_DEPTH_SCALE) -> Iterator[TUMFrame]:
    """Stream TUM frames in association order (LogReader::getNext)."""
    assoc = read_associations(os.path.join(root, associations))
    if end is not None:
        assoc = assoc[:end]
    for ts, rgb_p, depth_p in assoc[start:]:
        yield load_frame(root, rgb_p, depth_p, ts, depth_scale)


def frames_prefetched(root: str, associations: str = "associations.txt",
                      start: int = 0, end: int | None = None,
                      depth_scale: float = TUM_DEPTH_SCALE,
                      workers: int = 3, depth_ahead: int = 8) -> Iterator[TUMFrame]:
    """Like :func:`frames`, but PNG decoding runs ahead of the consumer in a
    thread pool (the runtime analogue of the native .klg prefetcher,
    native/dataloader.cpp — PNG decode is pure-python/PIL, so a thread pool
    rather than a C++ ring buffer; ~10-15 ms/frame of decode hides behind
    the device step)."""
    from concurrent.futures import ThreadPoolExecutor

    assoc = read_associations(os.path.join(root, associations))
    if end is not None:
        assoc = assoc[:end]
    assoc = assoc[start:]
    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = []
        it = iter(assoc)
        for _ in range(depth_ahead):
            nxt = next(it, None)
            if nxt is None:
                break
            ts, rgb_p, depth_p = nxt
            pending.append(pool.submit(load_frame, root, rgb_p, depth_p,
                                       ts, depth_scale))
        while pending:
            fut = pending.pop(0)
            nxt = next(it, None)
            if nxt is not None:
                ts, rgb_p, depth_p = nxt
                pending.append(pool.submit(load_frame, root, rgb_p, depth_p,
                                           ts, depth_scale))
            yield fut.result()


def load_groundtruth(path: str):
    """TUM groundtruth.txt -> (timestamps (N,), poses (N,4,4) world<-cam)
    (GroundTruthOdometry.cpp semantics)."""
    from ..io.traj import from_tum_line

    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, T = from_tum_line(line)
            ts.append(t)
            poses.append(T)
    return np.asarray(ts), np.stack(poses)


def associate_gt(frame_ts: np.ndarray, gt_ts: np.ndarray, gt_poses: np.ndarray,
                 max_dt: float = 0.02):
    """Nearest-timestamp GT association; returns (poses, valid mask)."""
    idx = np.searchsorted(gt_ts, frame_ts)
    idx = np.clip(idx, 1, len(gt_ts) - 1)
    left = gt_ts[idx - 1]
    right = gt_ts[idx]
    pick = np.where(np.abs(frame_ts - left) < np.abs(frame_ts - right), idx - 1, idx)
    valid = np.abs(gt_ts[pick] - frame_ts) <= max_dt
    return gt_poses[pick], valid
