"""Camera projection utilities: unprojection to vertex maps, projection,
pixel grids.  Replaces ``geometry.glsl:21-32`` (getVertex) and the CUDA
``createVMap`` (``cudafuncs.cu``), as pure jnp over (H, W) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraIntrinsics


def pixel_grid(h: int, w: int, dtype=jnp.float32):
    """Integer pixel-center coordinates as float arrays (y, x), shape (H, W).

    The reference addresses texels at half-pixel centers but multiplies
    ``texcoord*cols`` back to (approximately) integer coords; we use exact
    integer pixel coordinates which is what the CUDA path
    (``cudafuncs.cu createVMap``) does.
    """
    ys = jnp.arange(h, dtype=dtype)[:, None]
    xs = jnp.arange(w, dtype=dtype)[None, :]
    return jnp.broadcast_to(ys, (h, w)), jnp.broadcast_to(xs, (h, w))


def unproject(depth: jnp.ndarray, intr: CameraIntrinsics) -> jnp.ndarray:
    """Depth (H, W) in meters -> vertex map (H, W, 3) in camera frame.

    v = ((x-cx) z / fx, (y-cy) z / fy, z) — geometry.glsl:21-25.
    Invalid (<=0) depths yield zero vertices (the reference's convention:
    vertex.z == 0 marks invalid).
    """
    h, w = depth.shape
    yy, xx = pixel_grid(h, w, depth.dtype)
    z = jnp.where(depth > 0, depth, 0.0)
    x = (xx - intr.cx) * z * (1.0 / intr.fx)
    y = (yy - intr.cy) * z * (1.0 / intr.fy)
    return jnp.stack([x, y, z], axis=-1)


def project(points: jnp.ndarray, intr: CameraIntrinsics):
    """Camera-frame points (..., 3) -> (u, v, z) pixel coords + depth.

    u = fx * X/Z + cx  (reference: ``reduce.cu:330-331``).
    """
    z = points[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = points[..., 0] * intr.fx / safe_z + intr.cx
    v = points[..., 1] * intr.fy / safe_z + intr.cy
    return u, v, z


def in_bounds(u: jnp.ndarray, v: jnp.ndarray, intr: CameraIntrinsics):
    """Round-to-nearest integral pixel validity mask (reference uses
    __float2int_rn then bounds-check, reduce.cu:330-334)."""
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    ok = (ui >= 0) & (vi >= 0) & (ui < intr.width) & (vi < intr.height)
    return ui, vi, ok


def intrinsic_matrix(intr: CameraIntrinsics, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array(
        [[intr.fx, 0.0, intr.cx], [0.0, intr.fy, intr.cy], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def mean_focal(intr: CameraIntrinsics) -> float:
    """surfels.glsl:21 — mean focal used by the surfel radius formula."""
    return (abs(intr.fx) + abs(intr.fy)) / 2.0


def max_radial_dist(intr: CameraIntrinsics) -> float:
    """Half-diagonal in pixels, used for radial confidence
    (depth_confidence_evaluation.frag / HRBFFusion.cpp createCompute).
    Pure-python math so it stays static under jit tracing."""
    import math

    return math.sqrt((intr.width / 2.0) ** 2 + (intr.height / 2.0) ** 2)
