"""Keyframe database: BoW-based place recognition queries.

Re-designs `/root/reference/src/KeyFrameDatabase.cc` as a sparse inverted
file over the vocabulary — the same structure the reference uses
(`include/KeyFrameDatabase.h:66`), vectorized with numpy posting-list
accumulation instead of serial candidate walks.

Round 1 used a dense (max_kf, n_words) score matrix; at the reference's
~1M-word pretrained vocabulary (`src/System.cc:70-83`) that is ~5 GB for 1k
keyframes — unusable. Here memory is O(total observed words) ≈ n_kf ×
n_features × 12 bytes (~25 MB at 1k KFs), independent of vocabulary size,
and a query touches only the posting lists of its own words (exactly
DBoW2's complexity).

Implements the reference's two-stage candidate logic:
- DetectLoopCandidates (`src/KeyFrameDatabase.cc:76-198`): exclude covisible
  KFs, floor on shared words (0.8·max), accumulate covisibility-group
  scores, 0.75·bestAcc cut.
- DetectRelocalizationCandidates (`:200-310`): same without exclusion.
"""
from __future__ import annotations

import numpy as np

from ..frontend.keypoints import Keypoints
from .mapstore import MapStore
from .vocab import Vocabulary, transform


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, store: MapStore):
        self.voc = voc
        self.store = store
        # per-KF sparse BoW: sorted word ids + L1-normalized weights
        self.kf_word_ids: dict[int, np.ndarray] = {}
        self.kf_word_wts: dict[int, np.ndarray] = {}
        # inverted file: word -> (list of kf ids, list of weights); lists
        # are append-only, erased KFs are masked at query time
        self._inv_kfs: dict[int, list] = {}
        self._inv_wts: dict[int, list] = {}
        self.registered: set[int] = set()

    # ------------------------------------------------------------------
    def transform_frame(self, kp: Keypoints):
        bow_ids, bow_wts = transform_sparse(self.voc, kp)
        return bow_ids, bow_wts

    def add_keyframe(self, kf: int, kp: Keypoints):
        ids, wts = self.transform_frame(kp)
        self.kf_word_ids[kf] = ids
        self.kf_word_wts[kf] = wts
        for w, wt in zip(ids.tolist(), wts.tolist()):
            self._inv_kfs.setdefault(w, []).append(kf)
            self._inv_wts.setdefault(w, []).append(wt)
        self.registered.add(kf)

    def erase_keyframe(self, kf: int):
        self.registered.discard(kf)
        self.kf_word_ids.pop(kf, None)
        self.kf_word_wts.pop(kf, None)

    # ------------------------------------------------------------------
    def _accumulate(self, q_ids: np.ndarray, q_wts: np.ndarray):
        """Walk the posting lists of the query's words; returns
        (common_word_count, l1_score) arrays over kf ids [0, n_kf)."""
        n = self.store.n_kf
        common = np.zeros(n, np.int32)
        score = np.zeros(n, np.float32)
        kf_chunks, s_chunks = [], []
        for w, qw in zip(q_ids.tolist(), q_wts.tolist()):
            kfs = self._inv_kfs.get(w)
            if not kfs:
                continue
            kf_arr = np.asarray(kfs, np.int64)
            wt_arr = np.asarray(self._inv_wts[w], np.float32)
            kf_chunks.append(kf_arr)
            s_chunks.append(np.minimum(wt_arr, qw))
        if not kf_chunks:
            return common, score
        kf_all = np.concatenate(kf_chunks)
        s_all = np.concatenate(s_chunks)
        inb = kf_all < n
        np.add.at(common, kf_all[inb], 1)
        np.add.at(score, kf_all[inb], s_all[inb])
        return common, score

    def _active_mask(self):
        store = self.store
        active = np.zeros(store.n_kf, bool)
        if self.registered:
            reg = np.fromiter(self.registered, np.int64)
            reg = reg[reg < store.n_kf]
            active[reg] = True
        return active & store.kf_valid[: store.n_kf]

    def pair_score(self, a: int, b: int) -> float:
        """L1 BoW similarity between two registered keyframes."""
        ia, ib = self.kf_word_ids.get(a), self.kf_word_ids.get(b)
        if ia is None or ib is None:
            return 0.0
        common, ca, cb = np.intersect1d(ia, ib, assume_unique=True,
                                        return_indices=True)
        if common.size == 0:
            return 0.0
        return float(np.minimum(self.kf_word_wts[a][ca],
                                self.kf_word_wts[b][cb]).sum())

    # ------------------------------------------------------------------
    def detect_loop_candidates(self, kf: int, min_score: float):
        store = self.store
        ids = self.kf_word_ids.get(kf)
        if ids is None:
            return np.zeros(0, np.int64)
        active = self._active_mask()
        active[kf] = False
        # exclude covisible keyframes (the loop must close a long cycle)
        connected = store.covis[kf, : store.n_kf] >= 15
        cand_mask = active & ~connected
        if not cand_mask.any():
            return np.zeros(0, np.int64)
        common, scores = self._accumulate(ids, self.kf_word_wts[kf])
        common[~cand_mask] = 0
        max_common = common.max(initial=0)
        if max_common < 1:
            return np.zeros(0, np.int64)
        min_common = max(int(0.8 * max_common), 1)
        ok = cand_mask & (common >= min_common) & (scores >= min_score)
        cands = np.nonzero(ok)[0]
        if len(cands) == 0:
            return np.zeros(0, np.int64)
        # accumulate scores over covisibility groups (top-10 neighbors)
        acc, best_of_group = [], []
        for c in cands:
            group = np.concatenate(
                [[c], store.covisible_kfs(int(c), top_n=10)]).astype(np.int64)
            gs = scores[group] * (common[group] > 0)
            acc.append(gs.sum())
            best_of_group.append(group[np.argmax(gs)])
        acc = np.array(acc)
        best_acc = acc.max()
        keep = acc > 0.75 * best_acc
        out = np.unique(np.array(best_of_group)[keep])
        return out

    def detect_relocalization_candidates(self, kp: Keypoints):
        store = self.store
        q_ids, q_wts = self.transform_frame(kp)
        active = self._active_mask()
        if not active.any():
            return np.zeros(0, np.int64)
        common, scores = self._accumulate(q_ids, q_wts)
        common[~active] = 0
        max_common = common.max(initial=0)
        if max_common < 1:
            return np.zeros(0, np.int64)
        min_common = max(int(0.8 * max_common), 1)
        ok = active & (common >= min_common)
        cands = np.nonzero(ok)[0]
        if len(cands) == 0:
            return np.zeros(0, np.int64)
        acc, best_of_group = [], []
        for c in cands:
            group = np.concatenate(
                [[c], store.covisible_kfs(int(c), top_n=10)]).astype(np.int64)
            gs = scores[group]
            acc.append(gs.sum())
            best_of_group.append(group[np.argmax(gs)])
        acc = np.array(acc)
        keep = acc > 0.75 * acc.max()
        ranked = np.array(best_of_group)[keep]
        order = np.argsort(-acc[keep], kind="stable")
        return np.unique(ranked[order])[:10]

    # ------------------------------------------------------------------
    def min_covisible_score(self, kf: int) -> float:
        """Reference loop gate: min BoW score between kf and its covisible
        neighbors (`LoopClosing::DetectLoop`, src/LoopClosing.cc:124-141)."""
        neighbors = self.store.covisible_kfs(kf, min_weight=15)
        if len(neighbors) == 0:
            return 0.0
        return min(self.pair_score(kf, int(n)) for n in neighbors)


# identity-validated cache (id()-keying is unsound: CPython can reuse a
# collected array's id for a rebuilt vocabulary — see vocab._centroids_np)
_weight_cache: list = []    # [device_weights, host_np] or empty


def _host_weights(voc: Vocabulary) -> np.ndarray:
    if _weight_cache and _weight_cache[0] is voc.weights:
        return _weight_cache[1]
    w = np.asarray(voc.weights)
    _weight_cache[:] = [voc.weights, w]
    return w


def transform_sparse(voc: Vocabulary, kp: Keypoints):
    """Descriptor batch -> sparse L1-normalized tf-idf BoW (sorted unique
    word ids, weights). Host-side vocabulary descent (`vocab.descend_np` —
    batched BLAS gemv per level, ~1 ms for a keyframe; the device path
    costs hundreds of ms of dispatch latency on the dev tunnel), sparsified
    without ever materializing the (n_words,) dense vector, so a 1M-word
    vocabulary costs nothing extra."""
    from .vocab import descend_np

    desc_u8 = np.asarray(kp.desc_u8)
    valid = np.asarray(kp.valid)
    pm1 = (np.unpackbits(desc_u8, axis=-1, bitorder="little")
           .astype(np.int8) * 2 - 1)
    words = descend_np(voc, pm1)
    w = words[valid & (words >= 0)]
    if w.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    ids, counts = np.unique(w, return_counts=True)
    wts = (_host_weights(voc)[ids] * counts).astype(np.float32)
    s = wts.sum()
    if s > 0:
        wts /= s
    return ids.astype(np.int64), wts
