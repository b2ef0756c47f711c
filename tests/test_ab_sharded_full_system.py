# NOTE: test_ab_* so the GSPMD compiles run early in the pytest process
# (after ~90 accumulated executables the XLA CPU client can segfault on
# large sharded compiles — same rationale as test_aa_sharded_step.py).
"""FULL-system sharded run (VERDICT r4 next-8): FullSLAM — dense pipeline
+ keyframes + local BA — end-to-end on the 8-device CPU mesh, with the
dense state GSPMD-sharded (map-domain decomposition) and local BA solved
by the landmark-sharded distributed Schur solver (parallel/dist_ba.py),
which this test makes a PRODUCT-PATH consumer of (r4 weak-6)."""

import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import ate, synth
from hrbffusion3d_tpu.parallel import sharding as sh
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0,
                        width=128, height=96)
CFG = small_test_config(
    map_capacity=1 << 14,
    pyramid_iterations=(4, 3, 2),
    so3_iterations=4,
    predict_conf_threshold=0.2,
    keyframe_period=4,
)


def test_full_system_sharded_end_to_end():
    n = 13
    gt = synth.orbit_trajectory(n, angle_per_frame=0.004)
    scene = synth.default_room()
    mesh = sh.make_mesh(8)
    sys_ = FullSLAM(INTR, CFG, init_pose=gt[0], mesh=mesh,
                    backend_kwargs=dict(fast_threshold=8.0))

    frames = []
    for i in range(n):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        frames.append((d, c))
    batch = slam.FrameInput(depth=jnp.stack([f[0] for f in frames]),
                            rgb=jnp.stack([f[1] for f in frames]))
    sys_.process_batch(batch)

    # the dense state really is sharded over the mesh
    shardings = {d.id for d in sys_.state.map.data.devices()}
    assert len(shardings) == 8, shardings
    # local BA really used the distributed Schur solver
    assert len(sys_.backend.keyframes) >= 3
    assert sys_.backend._dist_opt is not None, \
        "distributed BA was never invoked on the mesh"
    # trajectory quality: tracking + dist-BA corrections stay sane
    poses = sys_.poses()
    assert np.isfinite(poses).all()
    err = ate.ate_rmse(poses, gt[: poses.shape[0]], align=False)
    assert err < 0.02, f"sharded full-system ATE {err * 1000:.1f} mm"
