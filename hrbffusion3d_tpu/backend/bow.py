"""Bag-of-binary-words place recognition.

TPU-native replacement for DBoW2 (``Core/src/ORB_SLAM2_m/Thirdparty/DBoW2``,
~3.5 k LoC + a 140 MB pretrained ORB vocabulary): binary descriptors are
quantised against a deterministic random vocabulary (no training file to
ship — our descriptors come from our own extractor, backend/features.py, so
a data-trained tree buys little), tf-style normalised histograms, and the
DBoW2 L1 score  s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1  (BowVector::score),
computed for all database entries in one batched min-sum.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache()
def vocabulary(n_words: int = 512, seed: int = 11) -> np.ndarray:
    """(W, 8) uint32 random binary centroid descriptors.  Host NumPy only:
    a device array cached across jit traces would leak tracers (see
    features._brief_pattern)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2 ** 32, (n_words, 8), dtype=np.uint32)


def bow_vector(desc: jnp.ndarray, valid: jnp.ndarray,
               n_words: int = 512) -> jnp.ndarray:
    """Quantise (N,8) packed descriptors -> L1-normalised (W,) histogram."""
    vocab = vocabulary(n_words)
    x = jnp.bitwise_xor(desc[:, None, :], vocab[None, :, :])
    dist = jnp.sum(jax.lax.population_count(x), axis=-1)
    dist = jnp.where(valid[:, None], dist, 1 << 20)
    word = jnp.argmin(dist, axis=-1)
    hist = jnp.zeros((n_words,), jnp.float32).at[word].add(
        valid.astype(jnp.float32))
    return hist / jnp.maximum(jnp.sum(hist), 1e-12)


def l1_score(v: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity of one vector against a database (K, W):
    s = 1 - 0.5 |v - w|_1 = sum_i min(v_i, w_i)  in [0, 1] for
    L1-normalised vectors."""
    return jnp.sum(jnp.minimum(v[None, :], db), axis=-1)


class BowDatabase:
    """KeyFrameDatabase equivalent.  Two interchangeable backends:
    - flat random vocabulary + dense batched min-sum scoring (default —
      keyframe counts are small, one vectorised pass beats list-walking);
    - a trained hierarchical VocabularyTree (backend/vocab.py) with a true
      inverted index (DBoW2 TemplatedDatabase semantics), for large maps
      and for parity with the reference's vocabulary-tree quantisation."""

    def __init__(self, n_words: int = 512, tree=None):
        self.tree = tree
        self.n_words = tree.n_words if tree is not None else n_words
        self.vectors: list[np.ndarray] = []
        if tree is not None:
            from .vocab import InvertedIndex

            self.index = InvertedIndex(self.n_words)
        else:
            self.index = None

    def add(self, desc: jnp.ndarray, valid: jnp.ndarray) -> int:
        if self.tree is not None:
            v = np.asarray(self.tree.bow_vector(desc, valid))
        else:
            v = np.asarray(bow_vector(desc, valid, self.n_words))
        self.vectors.append(v)
        if self.index is not None:
            self.index.add(v)
        return len(self.vectors) - 1

    def query(self, idx: int, exclude=()):
        """Scores of entry ``idx`` against all earlier entries.  ``exclude``
        (the query's covisible set — LoopClosing.cc:209 excludes keyframes
        connected to the current one) are forced to -1."""
        if idx < 1:
            return np.zeros((0,))
        if self.index is not None:
            scores = self.index.query(self.vectors[idx])[:idx]
        else:
            db = np.stack(self.vectors[:idx])
            scores = np.array(
                l1_score(jnp.asarray(self.vectors[idx]), jnp.asarray(db)))
        for k in exclude:
            if 0 <= k < idx:
                scores[k] = -1.0
        return scores
