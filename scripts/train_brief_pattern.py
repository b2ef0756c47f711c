"""Offline greedy-decorrelated BRIEF pattern training (VERDICT r2 next-5).

The reference ships ORB's learned 256-pair pattern
(``Core/src/ORB_SLAM2_m/src/ORBextractor.cc`` bit_pattern_31_, which rBRIEF
learned by greedy decorrelation over ~300k keypoints — Rublee et al. 2011
§4.3).  We reproduce the *procedure*, not the table: sample candidate tests
on a grid inside the 31x31 patch, evaluate each over a corpus of oriented
keypoint patches from the adversarial synthetic scenes, then greedily pick
256 tests with mean closest to 0.5 and pairwise response correlation below
a threshold (raised until 256 are found).

Writes ``hrbffusion3d_tpu/backend/brief_pattern.py`` (a generated module
holding the (256,4) int8 pattern) and prints corpus/correlation stats.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hrbffusion3d_tpu.backend import features
from hrbffusion3d_tpu.config import CameraIntrinsics
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import pyramid

INTR = CameraIntrinsics(fx=256.0, fy=256.0, cx=160.0, cy=120.0,
                        width=320, height=240)
PATCH_R = 15          # 31x31 patch
GRID_STRIDE = 1       # candidate endpoint grid
N_BITS = 256


def collect_keypoint_corpus():
    """Blurred images + (y, x, angle) keypoints from several synthetic
    views of both scenes."""
    corpus = []
    for scene_fn, n_views, seed in ((synth.default_room, 6, 0),
                                    (synth.complex_room, 10, 1)):
        scene = scene_fn()
        rng = np.random.default_rng(seed)
        for v in range(n_views):
            ang = 2 * np.pi * v / n_views + rng.uniform(0, 0.3)
            pose = np.eye(4, dtype=np.float32)
            c, s = np.cos(ang), np.sin(ang)
            pose[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            pose[:3, 3] = [0.25 * np.cos(ang), 0.1 * rng.uniform(-1, 1),
                           0.25 * np.sin(ang)]
            depth, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
            img = pyramid.rgb_to_intensity(rgb)
            sc = features._nms3(features.fast_score(img, 15.0))
            blur = np.asarray(features._gauss_blur(img))
            h, w = blur.shape
            scn = np.array(sc)
            scn[:PATCH_R + 2] = 0
            scn[-(PATCH_R + 2):] = 0
            scn[:, :PATCH_R + 2] = 0
            scn[:, -(PATCH_R + 2):] = 0
            idx = np.argsort(scn.reshape(-1))[::-1][:400]
            idx = idx[scn.reshape(-1)[idx] > 0]
            ys, xs = idx // w, idx % w
            angs = np.asarray(features._orientation(
                jnp.asarray(blur), jnp.asarray(ys), jnp.asarray(xs)))
            corpus.append((blur, ys, xs, angs))
    return corpus


def candidate_tests():
    """All endpoint pairs on a stride-GRID_STRIDE grid inside the patch
    disk, deduped, shuffled deterministically."""
    pos = [(x, y) for y in range(-PATCH_R, PATCH_R + 1, GRID_STRIDE)
           for x in range(-PATCH_R, PATCH_R + 1, GRID_STRIDE)
           if x * x + y * y <= PATCH_R * PATCH_R]
    pos = np.array(pos, np.int8)
    n = len(pos)
    ii, jj = np.triu_indices(n, 1)
    rng = np.random.default_rng(42)
    sel = rng.permutation(len(ii))[:60000]
    cand = np.concatenate([pos[ii[sel]], pos[jj[sel]]], axis=1)  # (M,4)
    # drop degenerate (too-short) tests: they sample blur noise
    d2 = ((cand[:, 0].astype(int) - cand[:, 2]) ** 2
          + (cand[:, 1].astype(int) - cand[:, 3]) ** 2)
    return cand[d2 >= 4]


def responses(cand, corpus):
    """(M, P) binary response of every candidate test over every oriented
    keypoint patch."""
    outs = []
    for blur, ys, xs, angs in corpus:
        h, w = blur.shape
        ca, sa = np.cos(angs), np.sin(angs)       # (p,)
        x1 = cand[None, :, 0] * ca[:, None] - cand[None, :, 1] * sa[:, None]
        y1 = cand[None, :, 0] * sa[:, None] + cand[None, :, 1] * ca[:, None]
        x2 = cand[None, :, 2] * ca[:, None] - cand[None, :, 3] * sa[:, None]
        y2 = cand[None, :, 2] * sa[:, None] + cand[None, :, 3] * ca[:, None]

        def sample(yf, xf):
            yi = np.clip(np.round(yf + ys[:, None]).astype(np.int64), 0, h - 1)
            xi = np.clip(np.round(xf + xs[:, None]).astype(np.int64), 0, w - 1)
            return blur.reshape(-1)[yi * w + xi]

        outs.append((sample(y1, x1) < sample(y2, x2)).T)  # (M, p)
    return np.concatenate(outs, axis=1)


def greedy_select(cand, R):
    """rBRIEF greedy selection: order by |mean-0.5|, admit while max
    |correlation| with the chosen set stays under a threshold that is
    raised until N_BITS tests are found."""
    M, P = R.shape
    mean = R.mean(axis=1)
    order = np.argsort(np.abs(mean - 0.5))
    Rc = (R.astype(np.float32) - mean[:, None])  # centered
    norm = np.sqrt((Rc * Rc).sum(axis=1)) + 1e-9

    for thresh in (0.20, 0.25, 0.30, 0.40, 0.55, 0.75, 1.01):
        chosen = []
        chosen_rows = np.zeros((N_BITS, P), np.float32)
        for m in order:
            if not chosen:
                chosen.append(m)
                chosen_rows[0] = Rc[m] / norm[m]
                continue
            corr = np.abs(chosen_rows[:len(chosen)] @ (Rc[m] / norm[m]))
            if corr.max() < thresh:
                chosen_rows[len(chosen)] = Rc[m] / norm[m]
                chosen.append(m)
                if len(chosen) == N_BITS:
                    return np.array(chosen), thresh
    raise RuntimeError("could not select 256 tests")


def main():
    corpus = collect_keypoint_corpus()
    n_kp = sum(len(c[1]) for c in corpus)
    cand = candidate_tests()
    print(f"corpus: {n_kp} keypoints over {len(corpus)} views; "
          f"{len(cand)} candidate tests")
    R = responses(cand, corpus)
    chosen, thresh = greedy_select(cand, R)
    pat = cand[chosen]                              # (256,4) int8
    sel = R[chosen].astype(np.float32)
    means = sel.mean(axis=1)
    C = np.corrcoef(sel)
    off = np.abs(C - np.eye(N_BITS))
    print(f"selected at corr threshold {thresh}: mean in "
          f"[{means.min():.3f},{means.max():.3f}], "
          f"max |corr| {off.max():.3f}, mean |corr| {off.mean():.4f}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "hrbffusion3d_tpu", "backend", "brief_pattern.py")
    rows = "\n".join(
        "    " + ", ".join(str(int(v)) for v in row) + ","
        for row in pat)
    with open(out, "w") as f:
        f.write(
            '"""GENERATED by scripts/train_brief_pattern.py — greedy-\n'
            "decorrelated 256-pair BRIEF pattern (the rBRIEF learning\n"
            "procedure of ORBextractor.cc's bit_pattern_31_, retrained on\n"
            "the synthetic corpus; see the script docstring).\n"
            f'max |corr| {off.max():.3f}, mean |test| in '
            f'[{means.min():.3f},{means.max():.3f}].\n"""\n\n'
            "import numpy as np\n\n"
            "# (256, 4) int8 rows (x1, y1, x2, y2) in the 31x31 patch\n"
            "LEARNED_PATTERN = np.array([\n" + rows +
            "\n], np.int8).reshape(256, 4)\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
