import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.config import CameraIntrinsics, small_test_config
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.pipeline import slam
from hrbffusion3d_tpu.pipeline.full_slam import FullSLAM
from hrbffusion3d_tpu.utils import checkpoint, params

INTR = CameraIntrinsics(fx=52.0, fy=52.0, cx=32.0, cy=24.0, width=64, height=48)
CFG = small_test_config(map_capacity=1 << 13, pyramid_iterations=(3, 2, 2),
                        predict_conf_threshold=0.2, keyframe_period=3)


def _run_frames(sys, gt, start, end):
    scene = synth.default_room()
    for i in range(start, end):
        d, c = synth.render_frame_jit(scene, jnp.asarray(gt[i]), INTR)
        sys.process(slam.FrameInput(depth=d, rgb=c), timestamp=float(i))
    return sys


def test_checkpoint_resume_bit_exact(tmp_path):
    gt = synth.orbit_trajectory(10)
    sys_a = FullSLAM(INTR, CFG, backend_kwargs=dict(fast_threshold=8.0),
                     init_pose=gt[0])
    _run_frames(sys_a, gt, 0, 5)
    p = str(tmp_path / "ckpt.bin")
    checkpoint.save(p, sys_a)

    # continue A to the end
    _run_frames(sys_a, gt, 5, 10)

    # restore into B (needs a bootstrapped template) and continue
    sys_b = FullSLAM(INTR, CFG, backend_kwargs=dict(fast_threshold=8.0),
                     init_pose=gt[0])
    scene = synth.default_room()
    d, c = synth.render_frame_jit(scene, jnp.asarray(gt[0]), INTR)
    sys_b.process(slam.FrameInput(depth=d, rgb=c))  # template bootstrap
    checkpoint.load(p, sys_b)
    _run_frames(sys_b, gt, 5, 10)

    np.testing.assert_allclose(sys_a.poses(), sys_b.poses(), atol=1e-6)
    assert int(sys_a.state.map.count) == int(sys_b.state.map.count)


def test_parameter_file_parsing(tmp_path):
    p = str(tmp_path / "GlobalStateParam.txt")
    with open(p, "w") as f:
        f.write("""
# comment
registrationJointICPWeight = 7.5;
preprocessingUsebilateralFilter = false;
globalDepthCutoff = 4.2;   // inline comment
preictionMaxNeighbors = 12.0;
optimizationUseLocalBA = true;
someUnknownKey = "whatever";
""")
    cfg = params.config_from_parameter_file(p)
    assert cfg.icp_weight == 7.5
    assert cfg.use_bilateral_filter is False
    assert cfg.depth_cutoff == 4.2
    assert cfg.predict_max_neighbors == 12
    assert cfg.use_local_ba is True


def test_parse_reference_format():
    """Grammar matches the actual reference file if mounted."""
    import os

    ref = "/root/reference/GUI/GlobalStateParam.txt"
    if not os.path.exists(ref):
        return
    cfg = params.config_from_parameter_file(ref)
    assert cfg.icp_weight == 10.0
    assert cfg.depth_cutoff == 3.5
    assert cfg.predict_max_neighbors == 10
