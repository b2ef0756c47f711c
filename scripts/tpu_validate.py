import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
from hrbffusion3d_tpu.utils import tpu_cache
tpu_cache.enable()
import jax, jax.numpy as jnp
from hrbffusion3d_tpu.config import TUM1, SLAMConfig
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam
intr = TUM1
cfg = SLAMConfig(map_capacity=1 << 20, predict_conf_threshold=0.2)
scene = synth.default_room()
poses = synth.orbit_trajectory(6, angle_per_frame=0.004)
frames = [slam.FrameInput(*synth.render_frame_jit(scene, jnp.asarray(poses[i]), intr)) for i in range(6)]
state = slam.bootstrap(frames[0], intr, cfg, init_pose=poses[0])
jax.block_until_ready(state)
print('bootstrap done', flush=True)
state = slam.step(state, frames[1], intr, cfg)
print('after step1: t=', np.asarray(state.t), 'gt1 t=', poses[1][:3,3], flush=True)
print('count=', int(state.map.count), 'dense=', float(state.dense_frac), 'icp_count=', float(state.last_icp_count), flush=True)
for i in range(5):
    t0 = time.perf_counter()
    state = slam.step(state, frames[2 + (i % 4)], intr, cfg)
    _ = np.asarray(state.t)  # hard sync via host transfer
    print('step time %.4f s' % (time.perf_counter() - t0), flush=True)
errs = np.linalg.norm(np.asarray(state.t) - poses[5][:3,3])
print('final pose err vs gt5:', errs, flush=True)
