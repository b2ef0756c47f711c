"""Hierarchical binary vocabulary tree + inverted index.

DBoW2-equivalent (``Core/src/ORB_SLAM2_m/Thirdparty/DBoW2``,
TemplatedVocabulary.h / TemplatedDatabase.h): a K-ary tree of depth L over
binary descriptors built by k-majority clustering (binary k-means: the
centroid of a set of binary descriptors is their bitwise majority), tf-idf
word weights, L1-normalised bow vectors, and an inverted file so a query
only scores database entries sharing at least one word.

Differences from DBoW2 by design (not omission): the tree is trained on the
caller's descriptors (our extractor, backend/features.py) instead of
shipping a 140 MB pretrained ORB vocabulary file, and quantisation is a
batched JAX tree walk (L x K popcount comparisons per descriptor, all
descriptors in parallel) instead of a per-descriptor recursive descent.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _popcount_np(x: np.ndarray) -> np.ndarray:
    return _POPCNT8[x.view(np.uint8)].reshape(*x.shape, 4).sum(-1).sum(-1)


def _kmajority(desc: np.ndarray, k: int, seed: int, iters: int = 8):
    """Binary k-means over (N,8)u32 packed descriptors: assign by Hamming
    distance, re-centre by bitwise majority.  Returns (k,8)u32 centroids."""
    rng = np.random.default_rng(seed)
    n = desc.shape[0]
    if n <= k:
        out = np.zeros((k, 8), np.uint32)
        out[:n] = desc
        if n:
            out[n:] = desc[rng.integers(0, n, k - n)]
        return out
    cent = desc[rng.choice(n, k, replace=False)].copy()
    bits = np.unpackbits(
        np.ascontiguousarray(desc).view(np.uint8), axis=-1)      # (N,256)
    for _ in range(iters):
        d = _POPCNT8[
            (desc[:, None, :] ^ cent[None, :, :]).view(np.uint8)
        ].reshape(n, k, -1).sum(-1)
        assign = d.argmin(-1)
        new = np.zeros_like(cent)
        for j in range(k):
            sel = assign == j
            if not sel.any():
                new[j] = desc[rng.integers(0, n)]
                continue
            maj = (bits[sel].mean(0) >= 0.5).astype(np.uint8)
            new[j] = np.packbits(maj).view(np.uint32)
        if (new == cent).all():
            break
        cent = new
    return cent


class VocabularyTree:
    """K-ary depth-L binary vocabulary with tf-idf weights."""

    def __init__(self, centroids: list[np.ndarray], idf: np.ndarray,
                 k: int, depth: int):
        # centroids[l]: (K^l * K, 8) — children of every level-l node,
        # stored node-major so node i's children are rows [i*K, (i+1)*K)
        self.centroids = [jnp.asarray(c) for c in centroids]
        self.idf = jnp.asarray(idf)
        self.k = k
        self.depth = depth
        self.n_words = k ** depth

    # ------------------------------------------------------------------ #
    @staticmethod
    def train(desc: np.ndarray, k: int = 10, depth: int = 3,
              seed: int = 7) -> "VocabularyTree":
        """Hierarchical k-majority (TemplatedVocabulary::create).  ``desc``
        (N,8)u32 training descriptors (e.g. pooled from a few frames)."""
        desc = np.ascontiguousarray(np.asarray(desc, np.uint32))
        groups = [np.arange(desc.shape[0])]
        centroids = []
        for lvl in range(depth):
            cents = np.zeros((len(groups) * k, 8), np.uint32)
            nxt: list[np.ndarray] = []
            for g, idx in enumerate(groups):
                c = _kmajority(desc[idx], k, seed + 131 * lvl + g)
                cents[g * k:(g + 1) * k] = c
                if idx.size:
                    d = _POPCNT8[
                        (desc[idx][:, None, :] ^ c[None, :, :]).view(np.uint8)
                    ].reshape(idx.size, k, -1).sum(-1)
                    a = d.argmin(-1)
                else:
                    a = np.zeros((0,), int)
                for j in range(k):
                    nxt.append(idx[a == j])
            centroids.append(cents)
            groups = nxt
        # idf from the training set (TemplatedVocabulary::setNodeWeights):
        # weight_w = log(N / n_images_containing_w); with descriptor-level
        # training data the document granularity is the descriptor itself
        counts = np.array([g.size for g in groups], np.float64)
        n = max(desc.shape[0], 1)
        idf = np.log(n / np.maximum(counts, 1.0)).astype(np.float32)
        return VocabularyTree(centroids, idf, k, depth)

    # ------------------------------------------------------------------ #
    def quantize(self, desc: jnp.ndarray) -> jnp.ndarray:
        """(N,8)u32 -> (N,) leaf word ids (batched tree descent)."""
        node = jnp.zeros((desc.shape[0],), jnp.int32)
        for lvl in range(self.depth):
            cents = self.centroids[lvl]                   # (nodes*K, 8)
            base = node * self.k
            cand = cents[base[:, None] + jnp.arange(self.k)[None]]  # (N,K,8)
            d = jnp.sum(jax.lax.population_count(
                jnp.bitwise_xor(desc[:, None, :], cand)), axis=-1)
            node = base + jnp.argmin(d, axis=-1).astype(jnp.int32)
        return node

    def bow_vector(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        """tf-idf, L1-normalised (W,) vector (BowVector::addWeight +
        normalize(L1))."""
        word = self.quantize(desc)
        hist = jnp.zeros((self.n_words,), jnp.float32).at[word].add(
            valid.astype(jnp.float32))
        v = hist * self.idf
        return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)


class InvertedIndex:
    """TemplatedDatabase equivalent: word -> [(entry, value)] lists; a query
    touches only entries sharing a word, scoring the same DBoW2 L1 metric
    s = sum_w min(v_w, u_w) as the dense path."""

    def __init__(self, n_words: int):
        self.n_words = n_words
        self.words: list[list[tuple[int, float]]] = [[] for _ in range(n_words)]
        self.n_entries = 0

    def add(self, vec: np.ndarray) -> int:
        eid = self.n_entries
        self.n_entries += 1
        for w in np.nonzero(vec)[0]:
            self.words[int(w)].append((eid, float(vec[w])))
        return eid

    def query(self, vec: np.ndarray, exclude=()) -> np.ndarray:
        """Scores vs all entries (dense (n_entries,) output; accumulation
        is sparse over shared words)."""
        scores = np.zeros((self.n_entries,), np.float32)
        for w in np.nonzero(vec)[0]:
            vw = float(vec[w])
            for eid, uw in self.words[int(w)]:
                scores[eid] += min(vw, uw)
        for e in exclude:
            if 0 <= e < self.n_entries:
                scores[e] = -1.0
        return scores
