"""Vocabulary tree + inverted index (backend/vocab.py): training,
quantisation, tf-idf scoring, inverted-vs-dense equivalence, and
perceptual-aliasing discrimination through the LoopCloser path."""

import numpy as np

import jax.numpy as jnp

from hrbffusion3d_tpu.backend import bow, features, vocab
from hrbffusion3d_tpu.config import CameraIntrinsics
from hrbffusion3d_tpu.eval import synth
from hrbffusion3d_tpu.ops import pyramid

INTR = CameraIntrinsics(fx=103.0, fy=103.0, cx=64.0, cy=48.0, width=128, height=96)


def _descriptors(pose, scene=None):
    scene = scene or synth.default_room()
    _, rgb = synth.render_frame(scene, jnp.asarray(pose), INTR)
    kp = features.detect_and_describe(pyramid.rgb_to_intensity(rgb),
                                      threshold=8.0)
    return kp.desc, kp.valid


def _train_tree(k=6, depth=2):
    descs = []
    for x in (0.0, 0.4, 0.9):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = x
        d, v = _descriptors(T)
        descs.append(np.asarray(d)[np.asarray(v)])
    return vocab.VocabularyTree.train(np.concatenate(descs), k=k, depth=depth)


def test_tree_quantisation_deterministic_and_in_range():
    tree = _train_tree()
    d, v = _descriptors(np.eye(4, dtype=np.float32))
    w1 = np.asarray(tree.quantize(d))
    w2 = np.asarray(tree.quantize(d))
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and (w1 < tree.n_words).all()
    # descriptors spread over many words (not all collapsing to one leaf)
    assert len(np.unique(w1[np.asarray(v)])) > tree.n_words // 4


def test_bow_vector_l1_normalised():
    tree = _train_tree()
    d, v = _descriptors(np.eye(4, dtype=np.float32))
    vec = np.asarray(tree.bow_vector(d, v))
    assert abs(vec.sum() - 1.0) < 1e-5
    assert (vec >= 0).all()


def test_inverted_index_matches_dense_scoring():
    tree = _train_tree()
    db = bow.BowDatabase(tree=tree)
    poses = []
    for x in (0.0, 0.3, 0.6, 0.9, 0.0):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = x
        poses.append(T)
    for p in poses:
        d, v = _descriptors(p)
        db.add(jnp.asarray(d), jnp.asarray(v))
    got = db.query(len(poses) - 1)
    dense = np.array(bow.l1_score(
        jnp.asarray(db.vectors[-1]), jnp.asarray(np.stack(db.vectors[:-1]))))
    np.testing.assert_allclose(got, dense, atol=1e-5)


def test_tree_discriminates_views():
    """Same view scores far above a distant view (aliasing check): revisit
    of pose 0 must retrieve entry 0, not the unrelated mid-sequence views."""
    tree = _train_tree()
    db = bow.BowDatabase(tree=tree)
    xs = (0.0, 0.5, 1.0, 1.5, 0.0)
    for x in xs:
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = x
        d, v = _descriptors(T)
        db.add(jnp.asarray(d), jnp.asarray(v))
    scores = db.query(len(xs) - 1)
    assert int(np.argmax(scores)) == 0
    assert scores[0] > scores[2] + 0.1, scores
