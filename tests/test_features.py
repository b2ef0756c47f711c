import jax.numpy as jnp
import numpy as np

from hrbffusion3d_tpu.backend import features
from hrbffusion3d_tpu.config import CameraIntrinsics
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import pyramid

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)


def _intensity(pose):
    scene = synth.default_room()
    _, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    return pyramid.rgb_to_intensity(rgb)


def test_fast_detects_checker_corners():
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 200.0  # square -> 4 strong corners
    sc = np.asarray(features._nms3(features.fast_score(jnp.asarray(img))))
    ys, xs = np.nonzero(sc)
    assert len(ys) >= 4
    corners = {(16, 16), (16, 47), (47, 16), (47, 47)}
    found = {(y, x) for y, x in zip(ys, xs)}
    hits = sum(any(abs(cy - y) <= 2 and abs(cx - x) <= 2 for (y, x) in found)
               for (cy, cx) in corners)
    assert hits == 4


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    sc = features.fast_score(img)
    assert float(jnp.max(sc)) == 0.0


def test_detect_on_synthetic_scene():
    kp = features.detect_and_describe(_intensity(np.eye(4, dtype=np.float32)), threshold=8.0)
    n = int(jnp.sum(kp.valid))
    assert n > 50, n
    # coords within image
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 128).all()


def test_self_matching_identity():
    kp = features.detect_and_describe(_intensity(np.eye(4, dtype=np.float32)), threshold=8.0)
    m = features.match(kp, kp)
    v = np.asarray(m.valid)
    n = int(np.asarray(kp.valid).sum())
    # self-match: each valid kp matches itself with distance 0
    matched_self = (np.asarray(m.idx2) == np.arange(len(v)))[v]
    assert matched_self.all()
    assert int(v.sum()) > 0.9 * n


def test_matching_across_small_motion():
    pose0 = np.eye(4, dtype=np.float32)
    pose1 = pose0.copy()
    pose1[:3, 3] = [0.01, 0.005, 0.0]
    k0 = features.detect_and_describe(_intensity(pose0), threshold=8.0)
    k1 = features.detect_and_describe(_intensity(pose1), threshold=8.0)
    m = features.match(k0, k1)
    v = np.asarray(m.valid)
    assert v.sum() > 30, v.sum()
    # matched displacement should be small (pixel shift ~ f*t/z <= ~2px)
    xy0 = np.asarray(k0.xy)[v]
    xy1 = np.asarray(k1.xy)[np.asarray(m.idx2)[v]]
    disp = np.linalg.norm(xy1 - xy0, axis=1)
    assert np.median(disp) < 4.0, np.median(disp)


def test_descriptor_rotation_stability():
    """Descriptors should tolerate small in-plane rotation via steering."""
    img = _intensity(np.eye(4, dtype=np.float32))
    from hrbffusion3d_tpu.core import lie

    pose_rot = np.eye(4, dtype=np.float32)
    pose_rot[:3, :3] = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, 0.1])))
    img_rot = _intensity(pose_rot)
    k0 = features.detect_and_describe(img, threshold=8.0)
    k1 = features.detect_and_describe(img_rot, threshold=8.0)
    m = features.match(k0, k1)
    assert int(np.asarray(m.valid).sum()) > 20


def test_grid_topk_distributes_budget():
    """_grid_topk (static-shape DistributeOctTree): per-cell budgets, never
    more than n_total candidates, and a rejection of cells^2 > n_total
    (ADVICE r3)."""
    import pytest

    rng = np.random.default_rng(3)
    sc = jnp.asarray(rng.uniform(0.1, 1.0, (64, 64)).astype(np.float32))
    # one dominant corner must not monopolise the budget
    sc = sc.at[:8, :8].add(100.0)
    val, idx = features._grid_topk(sc, n_total=64, cells=8)
    assert val.shape[0] <= 64
    y, x = np.asarray(idx) // 64, np.asarray(idx) % 64
    # selected pixels cover every grid cell (1 per cell at this budget)
    cells = set(zip(y // 8, x // 8))
    assert len(cells) == 64
    with pytest.raises(ValueError):
        features._grid_topk(sc, n_total=16, cells=8)
