"""Surface-reconstruction accuracy evaluation.

The ICL-NUIM protocol the reference targets (SURVEY §6: 'surface
reconstruction accuracy vs GT mesh') measures per-surfel distance to the
ground-truth surface.  For the analytic test scenes (eval/synth.py) the
exact point-to-surface distance is available in closed form; for TUM-style
data without a mesh, the reference falls back to trajectory metrics only.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..map.surfel_map import SurfelMap
from .synth import Scene


def point_to_scene_distance(points: jnp.ndarray, scene: Scene) -> jnp.ndarray:
    """Exact unsigned distance of (N,3) points to the analytic scene surface
    (min over all planes and spheres)."""
    d = jnp.full((points.shape[0],), 1e9)
    for i in range(scene.planes.shape[0]):
        n = scene.planes[i, :3]
        dist = scene.planes[i, 3]
        d = jnp.minimum(d, jnp.abs(points @ n - dist))
    for i in range(scene.spheres.shape[0]):
        c = scene.spheres[i, :3]
        r = scene.spheres[i, 3]
        d = jnp.minimum(d, jnp.abs(jnp.linalg.norm(points - c, axis=-1) - r))
    return d


def map_accuracy(m: SurfelMap, scene: Scene, conf_threshold: float = 0.0):
    """Reconstruction accuracy stats of a surfel map vs the GT scene:
    (mean, median, rmse, p95) point-to-surface distance in meters."""
    n = int(m.count)
    pos = m.pos[:n]
    conf = np.asarray(m.conf[:n])
    keep = conf >= conf_threshold
    d = np.asarray(point_to_scene_distance(pos, scene))[keep]
    if d.size == 0:
        return dict(mean=np.inf, median=np.inf, rmse=np.inf, p95=np.inf, n=0)
    return dict(
        mean=float(d.mean()),
        median=float(np.median(d)),
        rmse=float(np.sqrt((d ** 2).mean())),
        p95=float(np.percentile(d, 95)),
        n=int(d.size),
    )
