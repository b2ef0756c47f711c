"""Device-mesh sharding for the SLAM engine.

The reference is strictly single-GPU + 3 CPU threads (SURVEY §2.14 — no
multi-device communication of any kind); distribution is new functionality
mandated by the north star: map-domain decomposition (surfel arrays sharded
over a device mesh) + pixel-row sharding of the per-frame image work, with
XLA collectives inserted by GSPMD under ``jit`` sharding annotations.

Axes:
  "map"  — the single flat mesh axis used round-1 for both the surfel
           capacity dimension (map-domain decomposition) and the image row
           dimension (data parallelism over pixels).  Later rounds split
           this into ("map", "pix") for 2-D meshes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..map.surfel_map import SurfelMap
from ..pipeline.slam import FrameInput, SLAMState


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("map",))


def map_sharding(mesh: Mesh) -> SurfelMap:
    """Sharding pytree for SurfelMap: capacity axis split over "map"."""
    row = NamedSharding(mesh, P("map"))
    rep = NamedSharding(mesh, P())
    return SurfelMap(data=row, count=rep)


def image_sharding(mesh: Mesh):
    """Rows of (H, W[, C]) image maps split over "map"."""
    return NamedSharding(mesh, P("map"))


def state_sharding(mesh: Mesh) -> SLAMState:
    img = image_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return SLAMState(
        map=map_sharding(mesh),
        R=rep, t=rep, time=rep, submap_idx=rep,
        prev_intensity=img,
        pred_vertex=img, pred_normal=img, pred_intensity=img,
        pred_icp_weight=img, pred_k1=img, pred_k2=img,
        active_submaps=rep,
        last_icp_error=rep, last_icp_count=rep, dense_frac=rep,
    )


def frame_sharding(mesh: Mesh) -> FrameInput:
    img = image_sharding(mesh)
    return FrameInput(depth=img, rgb=img)


def shard_state(state: SLAMState, mesh: Mesh) -> SLAMState:
    return jax.device_put(state, state_sharding(mesh))


def shard_frame(frame: FrameInput, mesh: Mesh) -> FrameInput:
    return jax.device_put(frame, frame_sharding(mesh))


def shard_frame_batch(frames: FrameInput, mesh: Mesh) -> FrameInput:
    """Stacked (N,H,W[,C]) frame batches: image ROWS sharded (axis 1), the
    time axis replicated (scan consumes it sequentially)."""
    s = NamedSharding(mesh, P(None, "map"))
    return FrameInput(depth=jax.device_put(frames.depth, s),
                      rgb=jax.device_put(frames.rgb, s))
