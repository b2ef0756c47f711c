"""Synthetic RGB-D scene renderer (analytic ray casting).

The reference is validated against TUM / ICL-NUIM sequences on disk (SURVEY
§4); in this environment no datasets are available, so we generate exact
RGB-D frames from analytic scenes (spheres + planes forming a room) with
known trajectories.  Spheres give ground-truth principal curvature (1/R) for
validating the HRBF curvature pass; the textured walls exercise the
photometric term; the known poses give exact ATE.

Everything is jittable so whole test sequences render in milliseconds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraIntrinsics
from ..core import lie


class Scene(NamedTuple):
    """Analytic scene: spheres (M,4) = [cx,cy,cz,r]; planes (K,4) = [nx,ny,nz,d]
    with n·x = d and n pointing into the room (towards the camera volume)."""

    spheres: jnp.ndarray
    planes: jnp.ndarray


def default_room(dtype=jnp.float32) -> Scene:
    """A 6x6x6 m room centred at the origin with three spheres on a 'desk'
    region in front of the default camera start (camera looks down +z)."""
    planes = jnp.array(
        [
            # floor y = +1.5 (camera y points down)
            [0.0, -1.0, 0.0, -1.5],
            # ceiling y = -2
            [0.0, 1.0, 0.0, -2.0],
            # back wall z = 3.2 (inside the reference's 3.5 m depth cutoff)
            [0.0, 0.0, -1.0, -3.2],
            # front wall z = -2
            [0.0, 0.0, 1.0, -2.0],
            # left x = -2.2, right x = 2.2
            [1.0, 0.0, 0.0, -2.2],
            [-1.0, 0.0, 0.0, -2.2],
        ],
        dtype=dtype,
    )
    spheres = jnp.array(
        [
            [0.0, 0.9, 2.2, 0.6],
            [-0.9, 1.1, 1.7, 0.4],
            [0.8, 1.2, 1.9, 0.3],
        ],
        dtype=dtype,
    )
    return Scene(spheres=spheres, planes=planes)


def _texture(p: jnp.ndarray) -> jnp.ndarray:
    """Procedural 3-D texture -> rgb in [0,1]; multi-octave so the
    photometric Gauss-Newton term sees strong gradients at every pyramid
    level (TUM-like image gradient statistics)."""
    # Two components: band-limited sinusoids (frequencies <= ~10 rad/m so the
    # image-space period stays >= ~8 px at the coarsest pyramid level — no
    # aliasing / false photometric minima) + a sharp cell-hash block pattern
    # whose cell vertices give well-localised FAST corners for the sparse
    # front-end (real indoor scenes have poster/book edges; pure sinusoids
    # have none, which makes corner detection unrepeatable).
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r = (0.5 + 0.25 * jnp.sin(7.0 * x) * jnp.cos(5.0 * z) + 0.12 * jnp.sin(3.0 * y)
         + 0.18 * jnp.sin(9.5 * x + 1.7 * z))
    g = (0.5 + 0.25 * jnp.sin(6.0 * y + 1.3) * jnp.cos(4.0 * x) + 0.1 * jnp.cos(9.0 * z)
         + 0.18 * jnp.cos(8.5 * y + 2.0 * x))
    b = (0.5 + 0.25 * jnp.cos(8.0 * z + 0.7) * jnp.sin(5.0 * y)
         + 0.18 * jnp.sin(9.0 * (x + y)))
    smooth = jnp.stack([r, g, b], axis=-1)

    cell = jnp.floor(p / 0.3)
    h1 = jnp.sin(cell[..., 0] * 12.9898 + cell[..., 1] * 78.233 + cell[..., 2] * 37.719)
    blocks = (h1 * 43758.5453) % 1.0
    mixed = 0.65 * smooth + 0.35 * blocks[..., None]
    return jnp.clip(mixed, 0.0, 1.0)


def render_frame(scene: Scene, pose_wc: jnp.ndarray, intr: CameraIntrinsics):
    """Render (depth, rgb) at a camera-to-world pose ``pose_wc`` (4,4).

    depth is z-depth in meters (H, W); rgb is (H, W, 3) float in [0,1].
    """
    h, w = intr.height, intr.width
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    dir_c = jnp.stack(
        [
            jnp.broadcast_to((xs - intr.cx) / intr.fx, (h, w)),
            jnp.broadcast_to((ys - intr.cy) / intr.fy, (h, w)),
            jnp.ones((h, w), jnp.float32),
        ],
        axis=-1,
    )  # z-normalised ray directions: depth == ray parameter t
    R = pose_wc[:3, :3]
    o = pose_wc[:3, 3]
    d = jnp.einsum("ij,hwj->hwi", R, dir_c)

    big = jnp.float32(1e9)
    t_best = jnp.full((h, w), big)

    # planes: n·(o + t d) = dist  =>  t = (dist - n·o) / (n·d)
    for i in range(scene.planes.shape[0]):
        n = scene.planes[i, :3]
        dist = scene.planes[i, 3]
        denom = jnp.einsum("hwi,i->hw", d, n)
        t = (dist - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        t = jnp.where((t > 0.05) & (jnp.abs(denom) > 1e-6), t, big)
        t_best = jnp.minimum(t_best, t)

    # spheres: |o + t d - c|^2 = r^2
    for i in range(scene.spheres.shape[0]):
        c = scene.spheres[i, :3]
        r = scene.spheres[i, 3]
        oc = o - c
        A = jnp.sum(d * d, axis=-1)
        B = 2.0 * jnp.einsum("hwi,i->hw", d, oc)
        C = jnp.dot(oc, oc) - r * r
        disc = B * B - 4.0 * A * C
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-B - sq) / (2.0 * A)
        t1 = (-B + sq) / (2.0 * A)
        t = jnp.where(t0 > 0.05, t0, jnp.where(t1 > 0.05, t1, big))
        t = jnp.where(disc > 0, t, big)
        t_best = jnp.minimum(t_best, t)

    depth = jnp.where(t_best < big, t_best, 0.0)
    hit = o[None, None, :] + t_best[..., None] * d
    rgb = jnp.where((t_best < big)[..., None], _texture(hit), 0.0)
    return depth, rgb


render_frame_jit = jax.jit(render_frame, static_argnums=(2,))


def orbit_trajectory(n_frames: int, radius: float = 0.35,
                     angle_per_frame: float = 0.004,
                     look_at=(0.0, 0.8, 2.0)) -> np.ndarray:
    """Small smooth orbit + push-in trajectory (camera-to-world 4x4 array,
    shape (N,4,4)), similar in motion scale to TUM fr1/desk handheld motion."""
    poses = []
    target = np.asarray(look_at, np.float64)
    for i in range(n_frames):
        ang = angle_per_frame * i * 2 * np.pi
        eye = np.array(
            [radius * np.sin(ang), 0.35 * np.sin(ang * 0.7), -0.3 + 0.1 * np.sin(ang * 0.5)],
            np.float64,
        )
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R = np.stack([right, up2, fwd], axis=1)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = eye
        poses.append(T)
    return np.asarray(poses, np.float32)


def render_sequence(scene: Scene, poses_wc: np.ndarray, intr: CameraIntrinsics):
    """Render a whole sequence; returns (depths (N,H,W), rgbs (N,H,W,3))."""
    depths, rgbs = [], []
    for i in range(poses_wc.shape[0]):
        d, c = render_frame_jit(scene, jnp.asarray(poses_wc[i]), intr)
        depths.append(d)
        rgbs.append(c)
    return jnp.stack(depths), jnp.stack(rgbs)
