"""Compare stencil implementations on the TPU: patch-stack (current),
shifted-accumulate (XLA fusion), and a Pallas whole-image-VMEM kernel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hrbffusion3d_tpu.utils import tpu_cache

tpu_cache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hrbffusion3d_tpu.config import DEFAULT_CONFIG as cfg
from hrbffusion3d_tpu.ops import preprocess

H, W = 480, 640
R = 6
D = 2 * R + 1

rng = np.random.default_rng(0)
depth = jnp.asarray((2.0 + 0.3 * rng.standard_normal((H, W))).astype(np.float32))

SS = 0.024691358
SC = 555.556


def bilateral_accum(d):
    d = jnp.where((d > 0.3) & (d <= 3.5), d, 0.0)
    pad = jnp.pad(d, R)
    ones = jnp.pad(jnp.ones_like(d), R)
    num = jnp.zeros_like(d)
    den = jnp.zeros_like(d)
    for dy in range(D):
        for dx in range(D):
            nb = jax.lax.dynamic_slice(pad, (dy, dx), (H, W))
            ib = jax.lax.dynamic_slice(ones, (dy, dx), (H, W))
            space2 = float((dy - R) ** 2 + (dx - R) ** 2)
            w = jnp.exp(-(space2 * SS + (d - nb) ** 2 * SC)) * ib
            num += nb * w
            den += w
    return jnp.where(d > 0, num / jnp.maximum(den, 1e-12), 0.0)


def _bilateral_kernel(din_ref, mask_ref, out_ref):
    # loop over window rows (dynamic sublane start, cheap on TPU); unroll
    # the 13 column taps (static lane offsets).  Fully unrolling all 169
    # taps explodes Mosaic compile time.
    d = din_ref[R:R + H, R:R + W]

    def body(dy, acc):
        num, den = acc
        row_blk = din_ref[pl.ds(dy, H), :]
        msk_blk = mask_ref[pl.ds(dy, H), :]
        dyf = (dy - R).astype(jnp.float32)
        for dx in range(D):
            nb = row_blk[:, dx:dx + W]
            ib = msk_blk[:, dx:dx + W]
            space2 = dyf * dyf + float((dx - R) ** 2)
            w = jnp.exp(-(space2 * SS + (d - nb) ** 2 * SC)) * ib
            num += nb * w
            den += w
        return num, den

    num, den = jax.lax.fori_loop(
        0, D, body, (jnp.zeros((H, W), jnp.float32), jnp.zeros((H, W), jnp.float32)))
    out_ref[:, :] = jnp.where(d > 0, num / jnp.maximum(den, 1e-12), 0.0)


def bilateral_pallas(d):
    d = jnp.where((d > 0.3) & (d <= 3.5), d, 0.0)
    pad = jnp.pad(d, R)
    ones = jnp.pad(jnp.ones_like(d), R)
    return pl.pallas_call(
        _bilateral_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(pad, ones)


def timeit(name, fn, *args, n=5):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {min(ts)*1000:8.2f} ms", flush=True)
    return out


a = timeit("patch-stack (current)", lambda d: preprocess.bilateral_filter(d, cfg), depth)
b = timeit("shifted-accumulate", bilateral_accum, depth)
c = timeit("pallas whole-VMEM", bilateral_pallas, depth)
print("max |a-b| =", float(jnp.abs(a - b).max()), flush=True)
print("max |a-c| =", float(jnp.abs(a - c).max()), flush=True)
