"""Profile SparseBackend.insert_keyframe host glue (VERDICT r3 next-8):
~0.5 s/keyframe residual after jitting detect/matcher.  Breaks the insert
into detect / depth+info / association / new-landmarks / search_and_fuse on
the host CPU with realistic synthetic frames.

Run: JAX_PLATFORMS=cpu python scripts/profile_kf_insert.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.backend.keyframes import SparseBackend
from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam

intr = TUM1
cfg = SLAMConfig()
bk = SparseBackend(intr, cfg)

scene = synth.complex_room()
gt = synth.loopy_trajectory(40, n_loops=2, radius=0.55)

N_KF = int(os.environ.get("PROF_KF", "12"))

frames = []
for k in range(N_KF):
    d, c = synth.render_frame_kinect_jit(
        scene, jnp.asarray(gt[k * 3]), intr, jax.random.PRNGKey(k))
    from hrbffusion3d_tpu.ops import pyramid

    inten = np.asarray(pyramid.rgb_to_intensity(c))
    frames.append((np.asarray(d), inten, gt[k * 3]))

import cProfile
import pstats

for k, (d, inten, pose) in enumerate(frames):
    t0 = time.perf_counter()
    if k == N_KF - 1:
        pr = cProfile.Profile()
        pr.enable()
    bk.insert_keyframe(jnp.asarray(inten), jnp.asarray(d),
                       np.asarray(pose), time=k * 10)
    if k == N_KF - 1:
        pr.disable()
    t1 = time.perf_counter()
    print(f"kf {k}: insert {t1 - t0:.3f} s   lms {len(bk.landmarks)}")

st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(25)
