"""Hierarchical bag-of-words vocabulary for binary descriptors, TPU-native.

Replaces DBoW2's TemplatedVocabulary (`/root/reference/Thirdparty/DBoW2`):
- The tree lives in device memory as flat per-node centroid tensors
  (±1 int8); descriptor→word descent is L rounds of batched Hamming argmin
  — each round one int8 matmul on the MXU, no pointer chasing.
- Training is hierarchical k-majority (the binary k-means used for ORB
  vocabularies): centroids are bitwise majority votes of their cluster.
- Scoring uses L1-normalized tf-idf BoW vectors with the DBoW2 L1 score
  s(v,w) = 2 Σ_i min(v_i, w_i) (for L1-normalized vectors this equals
  1 − ½|v−w|₁, the reference's default).

The reference ships a pretrained 1M-word vocabulary file; this module can
train a vocabulary from harvested descriptors at startup (or load one saved
with `save`/`load`). Node-at-level `levels_up` grouping (DBoW2
FeatureVector) is returned for BoW-constrained matching.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    branching: int            # k
    depth: int                # L
    centroids: jnp.ndarray    # (n_internal_nodes, k, 256) int8 ±1
    weights: jnp.ndarray      # (n_words,) idf weights
    n_words: int

    def save(self, path: str):
        np.savez_compressed(
            path, branching=self.branching, depth=self.depth,
            centroids=np.asarray(self.centroids),
            weights=np.asarray(self.weights))

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        k, L = int(z["branching"]), int(z["depth"])
        return Vocabulary(k, L, jnp.asarray(z["centroids"]),
                          jnp.asarray(z["weights"]), k ** L)


def _kmajority(desc_pm1: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-means via bitwise majority; desc (N,256) ±1 int8."""
    N = desc_pm1.shape[0]
    if N == 0:
        return np.ones((k, 256), np.int8)
    init = rng.choice(N, size=min(k, N), replace=False)
    cents = desc_pm1[init].astype(np.int8)
    if len(init) < k:
        cents = np.concatenate(
            [cents, np.tile(cents[-1:], (k - len(init), 1))], 0)
    x = desc_pm1.astype(np.int32)
    for _ in range(iters):
        # hamming = (256 - dot)/2; assign to argmax dot
        dots = x @ cents.T.astype(np.int32)
        assign = np.argmax(dots, 1)
        new = np.empty_like(cents)
        for c in range(k):
            members = desc_pm1[assign == c]
            if len(members) == 0:
                new[c] = desc_pm1[rng.integers(N)]
            else:
                s = members.astype(np.int32).sum(0)
                maj = np.where(s > 0, 1, -1).astype(np.int8)
                maj[s == 0] = cents[c][s == 0]
                new[c] = maj
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def train_vocabulary(desc_pm1: np.ndarray, branching: int = 8,
                     depth: int = 3, seed: int = 0,
                     max_train: int = 30000) -> Vocabulary:
    """Train a k^L-word tree from (N,256) ±1 descriptors."""
    rng = np.random.default_rng(seed)
    if len(desc_pm1) > max_train:
        desc_pm1 = desc_pm1[rng.choice(len(desc_pm1), max_train, replace=False)]
    k, L = branching, depth
    n_internal = sum(k ** l for l in range(L))  # nodes with children
    centroids = np.ones((n_internal, k, 256), np.int8)
    # BFS training: node id at level l, index j -> flat offset(l)+j
    offsets = np.cumsum([0] + [k ** l for l in range(L)])
    clusters = {0: desc_pm1}  # node index within level 0
    for l in range(L):
        next_clusters = {}
        for j in range(k ** l):
            data = clusters.get(j, np.zeros((0, 256), np.int8))
            cents = _kmajority(data, k, rng)
            centroids[offsets[l] + j] = cents
            if l + 1 < L or True:
                if len(data):
                    dots = data.astype(np.int32) @ cents.T.astype(np.int32)
                    assign = np.argmax(dots, 1)
                    for c in range(k):
                        next_clusters[j * k + c] = data[assign == c]
        clusters = next_clusters
    # idf weights from training data word occupancy
    n_words = k ** L
    counts = np.array([len(clusters.get(w, ())) for w in range(n_words)],
                      np.float64)
    N = max(len(desc_pm1), 1)
    idf = np.log(N / np.maximum(counts, 1.0)).astype(np.float32)
    idf[counts == 0] = 0.0
    return Vocabulary(k, L, jnp.asarray(centroids), jnp.asarray(idf), n_words)


def _descend(voc: Vocabulary, desc_pm1):
    """(N,256) ±1 -> (word_id (N,), node_ids_per_level (L,N))."""
    k, L = voc.branching, voc.depth
    N = desc_pm1.shape[0]
    offsets = np.cumsum([0] + [k ** l for l in range(L)])
    node = jnp.zeros(N, jnp.int32)  # index within level
    d32 = desc_pm1.astype(jnp.int8)
    nodes_per_level = []
    for l in range(L):
        cents = voc.centroids[offsets[l] + node]  # (N,k,256)
        dots = jax.lax.dot_general(
            d32, cents, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)  # (N,k)
        best = jnp.argmax(dots, 1).astype(jnp.int32)
        node = node * k + best
        nodes_per_level.append(node)
    return node, jnp.stack(nodes_per_level)


@jax.jit
def _descend_jit(centroids, branching_arr, desc_pm1):
    raise NotImplementedError


def transform(voc: Vocabulary, desc_pm1, valid, levels_up: int = 2):
    """Compute (bow (n_words,) L1-normalized tf-idf, word_ids (N,),
    node_ids (N,) at depth L−levels_up) for one frame's descriptors."""
    word, per_level = _descend(voc, desc_pm1)
    word = jnp.where(valid, word, -1)
    w = jnp.where(valid, voc.weights[jnp.clip(word, 0)], 0.0)
    bow = jnp.zeros(voc.n_words, jnp.float32).at[jnp.clip(word, 0)].add(w)
    s = jnp.sum(bow)
    bow = bow / jnp.maximum(s, 1e-9)
    lvl = max(voc.depth - 1 - levels_up, 0)
    nodes = jnp.where(valid, per_level[lvl], -1)
    return bow, word, nodes


def l1_score(bow_a, bow_b):
    """DBoW2 L1 score for L1-normalized vectors:
    s = 1 − ½|v−w|₁ = Σ min(v,w), in [0,1]."""
    return jnp.sum(jnp.minimum(bow_a, bow_b))


def l1_score_matrix(bow_a, bows_b):
    """bow_a (V,) vs bows_b (M,V) -> (M,)."""
    return jnp.sum(jnp.minimum(bow_a[None, :], bows_b), axis=1)
