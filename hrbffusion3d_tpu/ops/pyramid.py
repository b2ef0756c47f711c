"""Pyramid construction ops: depth/intensity downsampling, map resizing,
Sobel derivatives.

TPU-native equivalents of the CUDA kernels in ``Core/src/Cuda/cudafuncs.cu``:
  pyrDownGaussKernel (l.57-94)      -> :func:`pyr_down_depth`
  pyrDownKernelIntensityGauss(l.818)-> :func:`pyr_down_intensity`
  resizeMapKernel (l.527-607)       -> :func:`resize_map` (vmap/nmap/cmap)
  computeDerivativeImages (l.956)   -> :func:`sobel_derivatives`
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .patches import extract_patches


def _decimate2(x: jnp.ndarray) -> jnp.ndarray:
    """Even-row/col 2x decimation as a flat row gather.  A stride-2 slice
    on a T(8,128)-tiled tensor pays a layout shuffle per array (~1 ms at
    640x480); the same data as a gather at computed flat indices is ~8x
    cheaper (measured in fuse, NOTES_R1 fourth session)."""
    h, w = x.shape[:2]
    idx = ((jnp.arange(h // 2, dtype=jnp.int32) * 2)[:, None] * w
           + jnp.arange(w // 2, dtype=jnp.int32) * 2).reshape(-1)
    flat = x.reshape((h * w,) + x.shape[2:])
    return flat[idx].reshape((h // 2, w // 2) + x.shape[2:])


def _pool2_sum(x: jnp.ndarray) -> jnp.ndarray:
    """2x2-stride-2 window sum via reduce_window (pure streaming — no
    strided slices, no gathers)."""
    dims = (2, 2) + (1,) * (x.ndim - 2)
    return jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                 dims, dims, "VALID")


def pyr_down_depth(src: jnp.ndarray, sigma_color: float = 0.03,
                   gather: bool = True) -> jnp.ndarray:
    """2x depth downsample with 5x5 binomial weights {0.375,0.25,0.0625}
    per |offset| axis, rejecting neighbors deviating > 3*sigma_color from
    the center (cudafuncs.cu:57-94).  Invalid depths are 0 here (not NaN)."""
    h, w = src.shape
    patches = extract_patches(src, 2)  # (H, W, 25)
    wts_1d = jnp.array([0.0625, 0.25, 0.375, 0.25, 0.0625], src.dtype)
    wts = (wts_1d[:, None] * wts_1d[None, :]).reshape(25)
    center = src
    ok = (jnp.abs(patches - center[..., None]) < 3.0 * sigma_color) & (patches > 0)
    wv = jnp.where(ok, wts, 0.0)
    num = jnp.sum(patches * wv, axis=-1)
    den = jnp.sum(wv, axis=-1)
    out = jnp.where((den > 0) & (center > 0), num / jnp.maximum(den, 1e-12), 0.0)
    return _decimate2(out) if gather else out[::2, ::2]


def pyr_down_intensity(src: jnp.ndarray, gather: bool = True) -> jnp.ndarray:
    """2x intensity downsample with the [1,4,6,4,1] Gaussian
    (cudafuncs.cu:818-866)."""
    patches = extract_patches(src, 2)
    wts_1d = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], src.dtype)
    wts = (wts_1d[:, None] * wts_1d[None, :]).reshape(25)
    inb = extract_patches(jnp.ones_like(src), 2)
    wv = wts * inb
    out = jnp.sum(patches * wv, axis=-1) / jnp.maximum(jnp.sum(wv, axis=-1), 1e-12)
    return _decimate2(out) if gather else out[::2, ::2]


def resize_map(src: jnp.ndarray, normalize: bool = False,
               gather: bool = True) -> jnp.ndarray:
    """Half-resolution 2x2 block average of an (H, W, C) map
    (cudafuncs.cu:527-607).  A block is invalid (all-zero) if any of its four
    first-channel entries is invalid (the reference propagates NaN; we use
    z==0 / len==0 as the invalid marker)."""
    if normalize:
        def _valid(v):
            return jnp.linalg.norm(v[..., :3], axis=-1) > 1e-6
    else:
        def _valid(v):
            return v[..., 2] > 0
    if gather:
        # streaming window sums: no strided slices
        avg = _pool2_sum(src) * 0.25
        ok = _pool2_sum(_valid(src).astype(src.dtype)) > 3.5
    else:
        x00 = src[0::2, 0::2]
        x01 = src[0::2, 1::2]
        x10 = src[1::2, 0::2]
        x11 = src[1::2, 1::2]
        avg = (x00 + x01 + x10 + x11) * 0.25
        ok = _valid(x00) & _valid(x01) & _valid(x10) & _valid(x11)
    if normalize:
        n = jnp.linalg.norm(avg[..., :3], axis=-1, keepdims=True)
        avg = avg.at[..., :3].set(avg[..., :3] / jnp.maximum(n, 1e-12))
    return jnp.where(ok[..., None], avg, 0.0)


def resize_scalar_map(src: jnp.ndarray, gather: bool = True) -> jnp.ndarray:
    """2x2 average for scalar per-pixel maps (curvature k1/k2, icp weight) —
    resizeCMapKernel equivalent.  Invalid marker is exactly-1000/0 handled by
    callers; this is a plain average."""
    if gather:
        return _pool2_sum(src) * 0.25
    return 0.25 * (src[0::2, 0::2] + src[0::2, 1::2] + src[1::2, 0::2] + src[1::2, 1::2])


def pyr_down_depth_mc(src: jnp.ndarray, sigma_color: float = 0.03) -> jnp.ndarray:
    """Multi-channel pyr_down_depth: (H, W, C) stacked depth maps share one
    5x5 patch pass and ONE decimation gather (each separate pyramid op pays
    a fixed per-array cost on TPU)."""
    patches = extract_patches(src, 2)          # (H, W, 25, C)
    wts_1d = jnp.array([0.0625, 0.25, 0.375, 0.25, 0.0625], src.dtype)
    wts = (wts_1d[:, None] * wts_1d[None, :]).reshape(25)[None, None, :, None]
    center = src[:, :, None, :]
    ok = (jnp.abs(patches - center) < 3.0 * sigma_color) & (patches > 0)
    wv = jnp.where(ok, wts, 0.0)
    num = jnp.sum(patches * wv, axis=2)
    den = jnp.sum(wv, axis=2)
    out = jnp.where((den > 0) & (src > 0), num / jnp.maximum(den, 1e-12), 0.0)
    return _decimate2(out)


def pyr_down_intensity_mc(src: jnp.ndarray) -> jnp.ndarray:
    """Multi-channel pyr_down_intensity: (H, W, C) stacked intensity maps,
    one [1,4,6,4,1]^2 Gaussian patch pass + one decimation gather."""
    h, w = src.shape[:2]
    patches = extract_patches(src, 2)          # (H, W, 25, C)
    wts_1d = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], src.dtype)
    wts = (wts_1d[:, None] * wts_1d[None, :]).reshape(25)
    inb = extract_patches(jnp.ones((h, w), src.dtype), 2)      # (H, W, 25)
    wv = (wts * inb)[..., None]
    out = (jnp.sum(patches * wv, axis=2)
           / jnp.maximum(jnp.sum(wv, axis=2), 1e-12))
    return _decimate2(out)


def resize_maps_fused(vmaps: list[jnp.ndarray], nmaps: list[jnp.ndarray],
                      scalars: list[jnp.ndarray]):
    """One 2x2 pooling pass for ALL the per-level map resizes: vertex maps
    (z-validity gate), normal maps (length gate + renormalise) and scalar
    maps (plain average) are concatenated with their validity indicator
    channels into a single tensor for ONE reduce_window call.

    Returns (vmaps_down, nmaps_down, scalars_down) matching resize_map /
    resize_map(normalize=True) / resize_scalar_map exactly."""
    chans = []
    for v in vmaps:
        chans += [v, (v[..., 2] > 0).astype(v.dtype)[..., None]]
    for nm in nmaps:
        ok = (jnp.sum(nm[..., :3] * nm[..., :3], axis=-1) > 1e-12)
        chans += [nm, ok.astype(nm.dtype)[..., None]]
    for s in scalars:
        chans.append(s[..., None])
    big = jnp.concatenate(chans, axis=-1)
    pooled = _pool2_sum(big)
    out_v, out_n, out_s = [], [], []
    c = 0
    for _ in vmaps:
        avg = pooled[..., c:c + 3] * 0.25
        ok = pooled[..., c + 3] > 3.5
        out_v.append(jnp.where(ok[..., None], avg, 0.0))
        c += 4
    for _ in nmaps:
        avg = pooled[..., c:c + 3] * 0.25
        ok = pooled[..., c + 3] > 3.5
        n = jnp.linalg.norm(avg, axis=-1, keepdims=True)
        avg = avg / jnp.maximum(n, 1e-12)
        out_n.append(jnp.where(ok[..., None], avg, 0.0))
        c += 4
    for _ in scalars:
        out_s.append(pooled[..., c] * 0.25)
        c += 1
    return out_v, out_n, out_s


def sobel_derivatives(img: jnp.ndarray):
    """3x3 Sobel as in computeDerivativeImages (cudafuncs.cu:956-993).

    NOTE the reference kernel is [[1,0,-1],[2,0,-2],[1,0,-1]] — i.e. the
    *negative* of the conventional d/dx — and the callers compensate via
    their own sign conventions; we reproduce it exactly.  Returns (dIdx,
    dIdy) float maps (the reference stores short; scaling by sobelScale=1/8
    happens in the consumers, as there)."""
    p = extract_patches(img, 1)  # (H,W,9) order: (dy,dx) row-major
    kx = jnp.array([1.0, 0.0, -1.0, 2.0, 0.0, -2.0, 1.0, 0.0, -1.0], img.dtype)
    ky = jnp.array([1.0, 2.0, 1.0, 0.0, 0.0, 0.0, -1.0, -2.0, -1.0], img.dtype)
    return jnp.sum(p * kx, axis=-1), jnp.sum(p * ky, axis=-1)


def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> greyscale [0,255] (the reference tracks 8-bit intensity;
    we keep float but the same 0-255 scale so thresholds carry over)."""
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]) * 255.0
