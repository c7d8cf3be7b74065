"""Keyframe database: BoW-based place recognition queries.

Re-designs `/root/reference/src/KeyFrameDatabase.cc`: the reference keeps a
word→keyframe inverted file and walks candidate lists serially; here every
keyframe's L1-normalized BoW vector is a row of a dense (max_kf, n_words)
matrix, so shared-word counting and L1 scoring over ALL keyframes are single
matvecs (the vocabulary is small enough that dense beats the inverted file
on TPU-style hardware; the inverted file IS the sparsity pattern of this
matrix).

Implements the reference's two-stage candidate logic:
- DetectLoopCandidates (`:76-198`): exclude covisible KFs, floor on shared
  words (0.8·max), accumulate covisibility-group scores, 0.75·bestAcc cut.
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
        self.bows = np.zeros((store.max_kf, voc.n_words), np.float32)
        self.has_words = np.zeros((store.max_kf, voc.n_words), bool)
        self.registered = np.zeros(store.max_kf, bool)
        # per-frame caches (word/node ids for BoW-constrained matching)
        self.kf_words = {}
        self.kf_nodes = {}

    # ------------------------------------------------------------------
    def transform_frame(self, kp: Keypoints):
        import jax.numpy as jnp

        bow, words, nodes = transform(self.voc, kp.desc_pm1, kp.valid)
        return np.asarray(bow), np.asarray(words), np.asarray(nodes)

    def add_keyframe(self, kf: int, kp: Keypoints):
        bow, words, nodes = self.transform_frame(kp)
        self.bows[kf] = bow
        self.has_words[kf] = bow > 0
        self.registered[kf] = True
        self.kf_words[kf] = words
        self.kf_nodes[kf] = nodes

    def erase_keyframe(self, kf: int):
        self.registered[kf] = False
        self.bows[kf] = 0
        self.has_words[kf] = False

    # ------------------------------------------------------------------
    def _common_words(self, bow):
        q = bow > 0
        return (self.has_words & q[None, :]).sum(1)

    def _l1_scores(self, bow):
        return np.minimum(self.bows, bow[None, :]).sum(1)

    def detect_loop_candidates(self, kf: int, min_score: float):
        store = self.store
        active = self.registered & store.kf_valid[: store.max_kf]
        active[kf] = False
        # exclude covisible keyframes (the loop must close a long cycle)
        connected = store.covis[kf] >= 15
        cand_mask = active & ~connected
        if not cand_mask.any():
            return np.zeros(0, np.int64)
        bow = self.bows[kf]
        common = self._common_words(bow)
        common[~cand_mask] = 0
        max_common = common.max()
        if max_common < 1:
            return np.zeros(0, np.int64)
        min_common = max(int(0.8 * max_common), 1)
        scores = self._l1_scores(bow)
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
        bow, _, _ = self.transform_frame(kp)
        active = self.registered & store.kf_valid[: store.max_kf]
        if not active.any():
            return np.zeros(0, np.int64)
        common = self._common_words(bow)
        common[~active] = 0
        max_common = common.max()
        if max_common < 1:
            return np.zeros(0, np.int64)
        min_common = max(int(0.8 * max_common), 1)
        scores = self._l1_scores(bow)
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
        store = self.store
        neighbors = store.covisible_kfs(kf, min_weight=15)
        if len(neighbors) == 0:
            return 0.0
        scores = self._l1_scores(self.bows[kf])
        return float(scores[neighbors].min())
