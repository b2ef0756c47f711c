"""Window-gather helper: turn GLSL per-pixel neighborhood loops into dense
static-shape patch tensors (the TPU-friendly formulation of every stencil in
the reference's fragment shaders)."""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(x: jnp.ndarray, radius: int, fill: float = 0.0) -> jnp.ndarray:
    """x: (H, W) or (H, W, C) -> (H, W, D*D[, C]) where D = 2*radius+1.

    Out-of-bounds neighbors are ``fill`` (the shaders' clamp-to-border
    semantics differ per pass; every caller masks on validity anyway so the
    fill value only needs to be *invalid*).
    Neighbor order is row-major over the window: index d = (dy+R)*D + (dx+R).
    """
    d = 2 * radius + 1
    h, w = x.shape[:2]
    pad_width = [(radius, radius), (radius, radius)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad_width, constant_values=fill)
    slabs = []
    for dy in range(d):
        for dx in range(d):
            slabs.append(xp[dy : dy + h, dx : dx + w])
    return jnp.stack(slabs, axis=2)


def window_offsets(radius: int):
    """(D*D, 2) integer (dy, dx) offsets in the same order as extract_patches."""
    d = 2 * radius + 1
    offs = [(dy - radius, dx - radius) for dy in range(d) for dx in range(d)]
    return jnp.array(offs, jnp.int32)
