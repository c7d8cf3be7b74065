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


# Cache holds a strong reference to the exact device array it was built
# from and validates by identity — id()-keyed caching is unsound because
# CPython can reuse the id of a garbage-collected array for a rebuilt
# vocabulary, silently serving stale centroids.
_host_centroid_cache: list = []  # [device_centroids, host_f32] or empty


def _centroids_np(voc: Vocabulary) -> np.ndarray:
    if _host_centroid_cache and _host_centroid_cache[0] is voc.centroids:
        return _host_centroid_cache[1]
    # int8 ±1, NOT f32: at a reference-scale vocabulary (k=10, L=6 → 1M
    # words, ~111k internal nodes) the f32 table would be 1.1 GB; int8 is
    # 284 MB — the gathered per-descriptor slices convert on the fly
    c = np.asarray(voc.centroids, dtype=np.int8)
    _host_centroid_cache[:] = [voc.centroids, c]
    return c


def descend_np(voc: Vocabulary, desc_pm1_np: np.ndarray) -> np.ndarray:
    """Host-side descriptor→word descent; (N,256) ±1 -> word ids (N,).

    The device `_descend` runs its ops eagerly — on the dev tunnel each op
    is a ~25 ms round trip, so a per-keyframe BoW transform cost >200 ms of
    pure dispatch latency. For per-keyframe registration (≤2k descriptors ×
    k≤10 children × L levels ≈ 5M MACs/level) host BLAS finishes in ~1 ms —
    far below one tunnel round trip — and keeps the loop-closing stage off
    the device queue entirely."""
    k, L = voc.branching, voc.depth
    N = desc_pm1_np.shape[0]
    offsets = np.cumsum([0] + [k ** l for l in range(L)])
    cents = _centroids_np(voc)            # (n_nodes, k, 256) int8
    node = np.zeros(N, np.int32)
    d = desc_pm1_np.astype(np.float32)[:, :, None]   # (N,256,1)
    for l in range(L):
        c = cents[offsets[l] + node]      # (N,k,256) — gathered slice only
        dots = np.matmul(c.astype(np.float32), d)[:, :, 0]  # (N,k) gemv
        node = node * k + np.argmax(dots, 1).astype(np.int32)
    return node


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
                     max_train: int = 30000,
                     iters: int = 8) -> Vocabulary:
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
            cents = _kmajority(data, k, rng, iters=iters)
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


def load_dbow2_text(path: str) -> Vocabulary:
    """Import a DBoW2 text vocabulary (the reference's `ORBvoc.txt` format,
    loaded by `ORBVocabulary::loadFromTextFile` — src/System.cc:70-83).

    File layout: header `k L scoring weighting`, then one line per non-root
    node in creation (BFS) order: `parent_id is_leaf b0..b31 weight`.
    The tree is re-laid-out into this module's complete-tree centroid
    tensors: missing children are filled with copies of the first present
    child (argmax ties resolve to the lowest index, so descent through a
    padded branch is deterministic and lands on the real child's word).
    Early leaves (nodes that are words above the bottom level) are extended
    downward by self-copies; their weight lands on the child-0 path.
    """
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        body = f.read()
    flat = np.array(body.split(), dtype=np.float64)
    if flat.size == 0:
        raise ValueError(f"empty vocabulary file {path}")
    ncols = 2 + 32 + 1
    if flat.size % ncols:
        raise ValueError(f"{path}: not a DBoW2 text vocabulary "
                         f"({flat.size} values not divisible by {ncols})")
    rows = flat.reshape(-1, ncols)
    parents = rows[:, 0].astype(np.int64)        # 0 = root
    is_leaf = rows[:, 1] != 0
    desc_u8 = rows[:, 2:34].astype(np.uint8)
    leaf_weight = rows[:, 34].astype(np.float32)
    return _relayout_dbow2(k, L, parents, is_leaf, desc_u8, leaf_weight)


def load_dbow2_binary(path: str) -> Vocabulary:
    """Import a DBoW2 binary vocabulary (the fork's `loadFromBinaryFile`,
    `Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1466-1507`; selected at
    runtime by file suffix in `src/System.cc:70-83`).

    Layout: header = uint32 nb_nodes, uint32 size_node, int32 k, int32 L,
    int32 scoring, int32 weighting; then one `size_node`-byte record per
    non-root node in creation (BFS) order:
    int32 parent | 32-byte descriptor | float32 weight | 1-byte is_leaf."""
    raw = np.fromfile(path, np.uint8)
    if raw.size < 24:
        raise ValueError(f"{path}: too short for a DBoW2 binary vocabulary")
    nb_nodes, size_node = np.frombuffer(raw[:8].tobytes(), "<u4")
    k, L = np.frombuffer(raw[8:16].tobytes(), "<i4")
    if size_node != 4 + 32 + 4 + 1:
        raise ValueError(f"{path}: node record size {size_node} != 41 "
                         "(not an ORB/FORB binary vocabulary)")
    body = raw[24:]
    n = body.size // size_node
    if n < max(int(nb_nodes) - 1, 1):
        raise ValueError(f"{path}: truncated ({n} records, header says "
                         f"{nb_nodes} nodes)")
    rec = body[: n * size_node].reshape(n, size_node)
    parents = rec[:, :4].copy().view("<i4")[:, 0].astype(np.int64)
    desc_u8 = rec[:, 4:36].copy()
    leaf_weight = rec[:, 36:40].copy().view("<f4")[:, 0].astype(np.float32)
    is_leaf = rec[:, 40] != 0
    return _relayout_dbow2(int(k), int(L), parents, is_leaf, desc_u8,
                           leaf_weight)


def load_dbow2(path: str) -> Vocabulary:
    """Load any supported vocabulary file by suffix (.npz native,
    .bin binary DBoW2, anything else = DBoW2 text)."""
    if path.endswith(".npz"):
        return Vocabulary.load(path)
    if path.endswith(".bin"):
        return load_dbow2_binary(path)
    return load_dbow2_text(path)


def _relayout_dbow2(k, L, parents, is_leaf, desc_u8, leaf_weight):
    """Common DBoW2 import: re-layout a (parent, is_leaf, desc, weight)
    node table into this module's complete-tree centroid tensors."""
    # bytes -> ±1 bits, little-endian bit order (matches unpack_bits_to_pm1)
    bits = np.unpackbits(desc_u8, axis=1, bitorder="little")
    pm1 = (bits.astype(np.int8) * 2 - 1).astype(np.int8)

    n_nodes = len(parents)
    node_ids = np.arange(1, n_nodes + 1)          # file order = DBoW2 id
    # children lists per parent, in file order
    order = np.argsort(parents, kind="stable")
    # level & index-within-level via BFS from the root
    level = np.zeros(n_nodes + 1, np.int32)       # by DBoW2 id (0=root)
    lvl_idx = np.zeros(n_nodes + 1, np.int64)     # complete-tree index
    child_sorted = node_ids[order]
    parent_sorted = parents[order]
    # group boundaries: for each parent, the slice of its children
    starts = np.searchsorted(parent_sorted, np.arange(0, n_nodes + 1), "left")
    ends = np.searchsorted(parent_sorted, np.arange(0, n_nodes + 1), "right")

    offsets = np.cumsum([0] + [k ** l for l in range(L)])
    n_internal = offsets[-1]
    centroids = np.ones((n_internal, k, 256), np.int8)
    weights = np.zeros(k ** L, np.float32)

    # BFS with explicit frontier; virtual nodes (padding) carry (desc, weight)
    # of the early leaf they extend
    frontier = [(0, 0, None, 0.0)]  # (dbow_id | -1, lvl_index, pm1_desc, w)
    for l in range(L):
        nxt = []
        for nid, j, vdesc, vw in frontier:
            if nid >= 0:
                s, e = starts[nid], ends[nid]
                kids = child_sorted[s:e][:k]
            else:
                kids = np.zeros(0, np.int64)
            cents = np.ones((k, 256), np.int8)
            if len(kids):
                kd = pm1[kids - 1]
                cents[: len(kids)] = kd
                if len(kids) < k:    # pad with first child
                    cents[len(kids):] = kd[0]
            elif vdesc is not None:  # extending an early leaf downward
                cents[:] = vdesc
            centroids[offsets[l] + j] = cents
            if l + 1 == L:
                for c in range(min(len(kids), k)):
                    kid = kids[c]
                    weights[j * k + c] = leaf_weight[kid - 1]
                if len(kids) == 0 and vdesc is not None:
                    weights[j * k] = vw
                continue
            for c in range(k):
                if c < len(kids):
                    kid = int(kids[c])
                    if is_leaf[kid - 1] or starts[kid] == ends[kid]:
                        nxt.append((-1, j * k + c, pm1[kid - 1],
                                    leaf_weight[kid - 1]))
                    else:
                        nxt.append((kid, j * k + c, None, 0.0))
                elif len(kids):      # padded copy of first child: dead branch
                    nxt.append((-1, j * k + c, cents[c], 0.0))
                elif vdesc is not None:
                    nxt.append((-1, j * k + c, vdesc if c == 0 else vdesc,
                                vw if c == 0 else 0.0))
        frontier = nxt
    return Vocabulary(k, L, jnp.asarray(centroids), jnp.asarray(weights),
                      k ** L)


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
