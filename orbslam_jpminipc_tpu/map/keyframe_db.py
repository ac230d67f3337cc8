"""Keyframe database: loop-closure and relocalization candidate retrieval.

Replaces src/KeyFrameDatabase.cc (310 LoC). The reference keeps an inverted
file (word id -> list of keyframes) and scans shared-word counts; here the
database is a dense (MAX_KF, W) matrix of BoW vectors, and every query is
one L1-similarity pass over all keyframes (vocab.score_l1) followed by the
reference's exact gating logic:

  DetectLoopCandidates (KeyFrameDatabase.cc:75-196):
    - exclude the query's covisible keyframes,
    - require score >= minScore (min BoW similarity among covisible KFs),
    - accumulate scores over each candidate's top-10 covisibility group,
    - return candidates whose group score > 0.75 * best group score.

  DetectRelocalisationCandidates (:198-308): same without the covisibility
  exclusion / minScore gate.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..vocab import vocabulary as voc


class KeyFrameDatabase:
    def __init__(self, vocab: voc.Vocabulary, max_kf: int):
        self.vocab = vocab
        self.bow = np.zeros((max_kf, vocab.n_words), np.float32)
        self.present = np.zeros(max_kf, bool)

    def add(self, kf: int, desc: np.ndarray, feat_valid: np.ndarray):
        self.bow[kf] = np.asarray(
            voc.transform(jnp.array(desc), jnp.array(feat_valid), self.vocab)
        )
        self.present[kf] = True

    def erase(self, kf: int):
        self.present[kf] = False
        self.bow[kf] = 0

    def clear(self):
        self.present[:] = False
        self.bow[:] = 0

    def query_bow(self, desc: np.ndarray, feat_valid: np.ndarray) -> np.ndarray:
        return np.asarray(
            voc.transform(jnp.array(desc), jnp.array(feat_valid), self.vocab)
        )

    def scores(self, query_bow: np.ndarray) -> np.ndarray:
        s = np.array(voc.score_l1(jnp.array(query_bow), jnp.array(self.bow)))
        s[~self.present] = -1.0
        return s

    def detect_loop_candidates(
        self,
        query_kf: int,
        query_bow: np.ndarray,
        covis_weights: np.ndarray,   # (MAX_KF,) covisibility row of query
        min_covis_weight: int = 15,
        top_group: int = 10,
    ) -> list[int]:
        scores = self.scores(query_bow)
        connected = covis_weights >= min_covis_weight
        connected[query_kf] = True

        # minScore: lowest similarity to a covisible KF (LoopClosing.cc:136-150)
        covis_scores = scores[connected & self.present]
        min_score = covis_scores.min() if len(covis_scores) else 0.0

        cand = np.nonzero(self.present & ~connected & (scores >= min_score))[0]
        if len(cand) == 0:
            return []

        # group score: candidate + its top-N covisible neighbors that are
        # also candidates (KeyFrameDatabase.cc:146-180)
        cand_set = set(cand.tolist())
        acc = {}
        best_of_group = {}
        for c in cand:
            group = [c]
            # neighbors by covisibility of c: caller passes only the query
            # row, so neighbor lookup is delegated via self._covis hook
            if self._covis_matrix is not None:
                row = self._covis_matrix[c].copy()
                row[c] = 0
                order = np.argsort(-row)[:top_group]
                group += [int(g) for g in order if row[g] >= min_covis_weight and int(g) in cand_set]
            sc = float(scores[group].sum())
            top = int(group[int(np.argmax(scores[group]))])
            acc[c] = sc
            best_of_group[c] = top
        best_acc = max(acc.values())
        keep = {best_of_group[c] for c, s in acc.items() if s > 0.75 * best_acc}
        return sorted(keep)

    _covis_matrix: np.ndarray | None = None

    def set_covisibility(self, covis: np.ndarray):
        """Provide the full covisibility matrix for group accumulation."""
        self._covis_matrix = covis

    def detect_reloc_candidates(self, query_bow: np.ndarray, top_group: int = 10,
                                min_covis_weight: int = 15) -> list[int]:
        scores = self.scores(query_bow)
        cand = np.nonzero(self.present & (scores > 0))[0]
        if len(cand) == 0:
            return []
        cand_set = set(cand.tolist())
        acc, best_of_group = {}, {}
        for c in cand:
            group = [c]
            if self._covis_matrix is not None:
                row = self._covis_matrix[c].copy()
                row[c] = 0
                order = np.argsort(-row)[:top_group]
                group += [int(g) for g in order if row[g] >= min_covis_weight and int(g) in cand_set]
            acc[c] = float(scores[group].sum())
            best_of_group[c] = int(group[int(np.argmax(scores[group]))])
        best_acc = max(acc.values())
        keep = {best_of_group[c] for c, s in acc.items() if s > 0.75 * best_acc}
        return sorted(keep)
