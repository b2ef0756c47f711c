"""Multi-host (multi-controller) runtime setup for the SLAM engine.

The reference has no multi-device story at all (SURVEY §2.14); scaling
across hosts is new functionality: each host runs this same engine as one
JAX process, ``jax.distributed`` stitches the processes into a single
global device mesh, and the sharded step/BA (parallel/sharding.py,
parallel/dist_ba.py) run unchanged — GSPMD inserts ICI collectives inside
a slice and DCN collectives across slices.

This module is the thin host-orchestration layer:

  initialize()        — jax.distributed.initialize wrapper (env-driven)
  global_mesh()       — a Mesh over ALL processes' devices, optionally 2-D
                        ("host", "chip") so map-domain decomposition rides
                        DCN while per-image work stays intra-host on ICI
  host_local_batch()  — build a globally-sharded FrameInput from each
                        host's local camera stream (multi-sensor rigs /
                        per-host dataset shards) via
                        jax.make_array_from_process_local_data

Single-process use (tests, one chip) works without initialize(): every
helper degrades to the local device set.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID — set by the launcher
    on each host; on Cloud TPU pods all three auto-detect)."""
    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    n = num_processes or os.environ.get("NUM_PROCESSES")
    if n:
        kwargs["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_mesh(two_level: bool = False) -> Mesh:
    """Mesh over every device of every process.

    two_level=False: flat ("map",) axis — drop-in for parallel/sharding.py.
    two_level=True: ("host", "chip") — shard the surfel capacity over
    "host" (map-domain decomposition across DCN) and image rows over
    "chip" (pixel parallelism on ICI).
    """
    devs = np.array(jax.devices())
    if not two_level:
        return Mesh(devs, ("map",))
    n_hosts = jax.process_count()
    per_host = len(devs) // n_hosts
    return Mesh(devs.reshape(n_hosts, per_host), ("host", "chip"))


def host_local_batch(mesh: Mesh, local_depth: np.ndarray,
                     local_rgb: np.ndarray, axis: str = "map"):
    """Assemble a globally-sharded FrameInput batch from per-process local
    frame stacks (leading axis = frames owned by this host)."""
    from ..pipeline.slam import FrameInput

    sh = NamedSharding(mesh, P(axis))
    depth = jax.make_array_from_process_local_data(sh, local_depth)
    rgb = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), local_rgb)
    return FrameInput(depth=depth, rgb=rgb)


def globalize_sharded_ba(sb, mesh: Mesh, axis: str = "map"):
    """Convert a host-side ShardedBA (same full content built on every
    process — the problem is deterministic host data) into globally-sharded
    arrays for a multi-controller ``dist_ba.make_optimizer`` run: leading
    axes of per-landmark/edge/pair arrays shard over ``axis``; cams/fixed
    replicate.  In single-process mode this is a plain device_put."""
    from jax.experimental import multihost_utils

    from .dist_ba import ShardedBA

    def shard(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        n = x.shape[0]
        per = n // jax.process_count()
        lo = jax.process_index() * per
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(axis)), x[lo:lo + per], x.shape)

    def repl(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return multihost_utils.host_local_array_to_global_array(
            x, mesh, P())

    return ShardedBA(
        cams=repl(sb.cams), points=shard(sb.points), obs=shard(sb.obs),
        cam_idx=shard(sb.cam_idx), lm_idx=shard(sb.lm_idx),
        info=shard(sb.info), edge_valid=shard(sb.edge_valid),
        fixed=repl(sb.fixed), pair_e=shard(sb.pair_e),
        pair_f=shard(sb.pair_f), pair_valid=shard(sb.pair_valid),
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0
