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
    with n·x = d and n pointing into the room (towards the camera volume);
    optional quads (Q,9) = [cx,cy,cz, e1x,e1y,e1z, e2x,e2y,e2z] — bounded
    rectangles spanned by half-edge vectors e1, e2 (desks/boxes with real
    occlusion edges, which infinite planes cannot give)."""

    spheres: jnp.ndarray
    planes: jnp.ndarray
    quads: jnp.ndarray | None = None


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


def complex_room(dtype=jnp.float32) -> Scene:
    """An adversarial variant of default_room: more clutter (9 spheres of
    varied radius) plus bounded quads forming a desk slab, a tilted board
    and a tall box — occlusion edges, thin structures and a wide range of
    surface orientations for the grazing-angle dropout to bite on."""
    base = default_room(dtype)
    spheres = jnp.array(
        [
            [0.0, 0.9, 2.2, 0.6],
            [-0.9, 1.1, 1.7, 0.4],
            [0.8, 1.2, 1.9, 0.3],
            [1.4, 0.6, 2.6, 0.35],
            [-1.5, 0.4, 2.4, 0.45],
            [0.3, -0.4, 2.8, 0.5],
            [-0.4, 1.3, 2.6, 0.2],
            [1.0, -0.8, 2.2, 0.3],
            [-1.1, -0.9, 2.0, 0.25],
        ],
        dtype=dtype,
    )
    quads = jnp.array(
        [
            # desk slab at y=0.7 in front of the camera volume
            [0.0, 0.7, 2.0,   0.9, 0.0, 0.0,   0.0, 0.0, 0.5],
            # tilted board leaning against the back wall
            [-1.2, 0.2, 2.9,   0.5, 0.0, -0.15,   0.0, 0.9, 0.35],
            # tall box face standing on the floor, right side
            [1.7, 0.75, 2.3,   0.25, 0.0, 0.0,   0.0, 0.75, 0.0],
            [1.7, 0.75, 2.05,  0.0, 0.0, 0.25,   0.0, 0.75, 0.0],
        ],
        dtype=dtype,
    )
    return Scene(spheres=spheres, planes=base.planes, quads=quads)


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


def render_frame_full(scene: Scene, pose_wc: jnp.ndarray,
                      intr: CameraIntrinsics):
    """Render (depth, rgb, normal_world) at a camera-to-world pose (4,4).

    depth is z-depth in meters (H, W); rgb is (H, W, 3) float in [0,1];
    normal_world is the analytic outward surface normal of the nearest hit
    (needed by the Kinect sensor model's grazing-angle dropout)."""
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
    n_best = jnp.zeros((h, w, 3), jnp.float32)

    def take(t, n, t_best, n_best):
        closer = t < t_best
        return (jnp.where(closer, t, t_best),
                jnp.where(closer[..., None], n, n_best))

    # planes: n·(o + t d) = dist  =>  t = (dist - n·o) / (n·d)
    for i in range(scene.planes.shape[0]):
        n = scene.planes[i, :3]
        dist = scene.planes[i, 3]
        denom = jnp.einsum("hwi,i->hw", d, n)
        t = (dist - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        t = jnp.where((t > 0.05) & (jnp.abs(denom) > 1e-6), t, big)
        t_best, n_best = take(t, jnp.broadcast_to(n, (h, w, 3)), t_best, n_best)

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
        hit = o[None, None, :] + t[..., None] * d
        n = (hit - c) / r
        t_best, n_best = take(t, n, t_best, n_best)

    # bounded quads: plane hit + in-extent check against the half-edges
    if scene.quads is not None:
        for i in range(scene.quads.shape[0]):
            c = scene.quads[i, 0:3]
            e1 = scene.quads[i, 3:6]
            e2 = scene.quads[i, 6:9]
            n = jnp.cross(e1, e2)
            n = n / jnp.linalg.norm(n)
            denom = jnp.einsum("hwi,i->hw", d, n)
            t = jnp.dot(n, c - o) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
            hit = o[None, None, :] + t[..., None] * d
            rel = hit - c
            u = jnp.einsum("hwi,i->hw", rel, e1) / jnp.dot(e1, e1)
            v = jnp.einsum("hwi,i->hw", rel, e2) / jnp.dot(e2, e2)
            inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
            t = jnp.where((t > 0.05) & (jnp.abs(denom) > 1e-6) & inside, t, big)
            t_best, n_best = take(t, jnp.broadcast_to(n, (h, w, 3)), t_best,
                                  n_best)

    depth = jnp.where(t_best < big, t_best, 0.0)
    hit = o[None, None, :] + t_best[..., None] * d
    rgb = jnp.where((t_best < big)[..., None], _texture(hit), 0.0)
    # orient normals towards the camera (against the ray direction)
    flip = jnp.sign(-jnp.sum(n_best * d, axis=-1, keepdims=True) + 1e-12)
    return depth, rgb, n_best * flip


def render_frame(scene: Scene, pose_wc: jnp.ndarray, intr: CameraIntrinsics):
    """Render (depth, rgb) — see render_frame_full."""
    depth, rgb, _ = render_frame_full(scene, pose_wc, intr)
    return depth, rgb


render_frame_jit = jax.jit(render_frame, static_argnums=(2,))
render_frame_full_jit = jax.jit(render_frame_full, static_argnums=(2,))


# --------------------------------------------------------------------------- #
# Kinect sensor model (VERDICT r1 item 3): the reference's BA information
# matrices assume the quadratic Kinect axial-noise law sigma_z = c1 z^2 +
# c2 z + c3 (Optimizer.cc:1216-1237); a real sensor additionally quantises to
# u16 millimetres and drops returns at grazing incidence.  Applying the same
# model to the synthetic depth makes the harness adversarial instead of exact.
# --------------------------------------------------------------------------- #

KINECT_C1, KINECT_C2, KINECT_C3 = 0.00273, 0.00074, -0.00058


def kinect_depth(depth: jnp.ndarray, normal_world: jnp.ndarray,
                 dirs_world: jnp.ndarray, key: jax.Array,
                 quantize_mm: bool = True,
                 dropout_cos: float = 0.25,
                 edge_dropout: float = 0.5,
                 noise_scale: float = 1.0) -> jnp.ndarray:
    """Degrade exact z-depth with the Kinect model:
    per-pixel Gaussian noise sigma_z(z), u16 millimetre quantisation, and
    grazing-angle dropout (returns vanish where the IR return weakens:
    |cos(incidence)| below ``dropout_cos`` drops deterministically, up to
    2x that threshold drops with probability ramping down from
    ``edge_dropout``).  ``noise_scale`` multiplies sigma_z — >1 makes the
    sequence drift-heavy (the regime where the sparse backend must earn
    its keep; the reference's BA exists for exactly these sequences)."""
    k1, k2 = jax.random.split(key)
    z = depth
    valid = z > 0
    sigma = KINECT_C1 * z * z + KINECT_C2 * z + KINECT_C3
    sigma = jnp.maximum(sigma, 1e-5) * noise_scale
    z = z + sigma * jax.random.normal(k1, z.shape, z.dtype)
    if quantize_mm:
        z = jnp.round(z * 1000.0) / 1000.0
    cosi = jnp.abs(jnp.sum(normal_world * dirs_world, axis=-1)
                   / (jnp.linalg.norm(dirs_world, axis=-1) + 1e-12))
    # ramp: p(drop) = edge_dropout at cosi = dropout_cos, 0 at 2*dropout_cos
    ramp = jnp.clip((2.0 * dropout_cos - cosi) / jnp.maximum(dropout_cos, 1e-6),
                    0.0, 1.0)
    drop = (cosi < dropout_cos) | (jax.random.uniform(k2, z.shape)
                                   < edge_dropout * ramp)
    return jnp.where(valid & ~drop, z, 0.0)


def render_frame_kinect(scene: Scene, pose_wc: jnp.ndarray,
                        intr: CameraIntrinsics, key: jax.Array,
                        noise_scale: float = 1.0):
    """Render (noisy_depth, rgb) through the Kinect sensor model."""
    depth, rgb, normal = render_frame_full(scene, pose_wc, intr)
    h, w = intr.height, intr.width
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    dir_c = jnp.stack([
        jnp.broadcast_to((xs - intr.cx) / intr.fx, (h, w)),
        jnp.broadcast_to((ys - intr.cy) / intr.fy, (h, w)),
        jnp.ones((h, w), jnp.float32),
    ], axis=-1)
    dirs_world = jnp.einsum("ij,hwj->hwi", pose_wc[:3, :3], dir_c)
    return kinect_depth(depth, normal, dirs_world, key,
                        noise_scale=noise_scale), rgb


render_frame_kinect_jit = jax.jit(render_frame_kinect, static_argnums=(2,))


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


def loopy_trajectory(n_frames: int, n_loops: int = 2, radius: float = 0.7,
                     look_at=(0.0, 0.6, 2.1)) -> np.ndarray:
    """A long handheld-like trajectory that completes ``n_loops`` full laps
    of a lateral ellipse (returning to its start region each lap — loop-
    closure opportunities), with slow vertical bob and push-in/out.  Per-
    frame motion is TUM fr1-like (~5-10 mm, ~0.3-0.6 deg at 30 Hz)."""
    poses = []
    target = np.asarray(look_at, np.float64)
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        ang = 2 * np.pi * n_loops * s
        eye = np.array([
            radius * np.sin(ang),
            0.25 * np.sin(2.1 * ang + 0.4),
            -0.35 + 0.18 * np.sin(0.9 * ang),
        ], np.float64)
        # look at a point that itself sways slightly (rotational excitation)
        tgt = target + np.array([0.25 * np.sin(ang * 0.5), 0.1 * np.cos(ang * 0.8), 0.0])
        fwd = tgt - eye
        fwd /= np.linalg.norm(fwd)
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


def panorama_trajectory(n_frames: int, n_turns: int = 2,
                        radius: float = 0.25,
                        center=(0.0, 0.55, 0.9)) -> np.ndarray:
    """Full-revolution panning trajectory: the camera walks a small circle
    while its HEADING sweeps 360 deg per turn, so keyframes looking
    backward share no landmarks with those looking forward — covisibility
    breaks and closing the revolution is a TRUE loop-closure event (the
    classic ORB-SLAM kitchen-pan scenario; LoopClosing.cc:407-599).
    loopy_trajectory keeps one look-at target, so projection-gated
    association absorbs its drift and no closure is ever needed
    (NOTES_R2 lesson)."""
    poses = []
    c = np.asarray(center, np.float64)
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        ang = 2 * np.pi * n_turns * s
        eye = c + np.array([radius * np.sin(ang), 0.06 * np.sin(3.1 * ang),
                            radius * np.cos(ang)], np.float64)
        # heading sweeps with the walk (looks outward from the circle),
        # plus a slow nod for rotational excitation
        fwd = np.array([np.sin(ang + 0.35 * np.sin(0.7 * ang)),
                        0.12 * np.sin(1.3 * ang),
                        np.cos(ang + 0.35 * np.sin(0.7 * ang))], np.float64)
        fwd /= np.linalg.norm(fwd)
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
