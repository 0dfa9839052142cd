"""Keyword-extraction ranking algebra: cosine top-k, MMR, MaxSum.

Reproduces /root/reference/src/pipelines/keywords_extraction/scorer.rs:
- ``cosine_similarity`` (:63-74): L2-normalize rows, matmul;
- ``cosine_similarity_score`` (:76-88): top-k by doc↔word similarity;
- ``maximal_margin_relevance_score`` (:90-135): greedy
  argmax(sim_doc·(1−d) − max_sim_chosen·d), first pick = plain argmax;
- ``max_sum_score`` (:137-183): take top ``max_sum_candidates`` by doc
  similarity, enumerate C(n, k) combinations, pick the one minimizing the
  total pairwise internal similarity (sum over the full k×k submatrix).

All scores returned are the doc↔word cosine similarity of the chosen
words, as in the reference.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from rust_bert_ray.decode.pooling import l2_normalize


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise cosine similarity between rows of a and rows of b."""
    return l2_normalize(np.atleast_2d(a)) @ l2_normalize(np.atleast_2d(b)).T


def cosine_topk(
    doc_embedding: np.ndarray, word_embeddings: np.ndarray, k: int
) -> list[tuple[int, float]]:
    sims = cosine_matrix(doc_embedding, word_embeddings).ravel()
    k = min(k, sims.shape[0])
    order = np.argsort(-sims, kind="stable")[:k]
    return [(int(i), float(sims[i])) for i in order]


def mmr(
    doc_embedding: np.ndarray,
    word_embeddings: np.ndarray,
    k: int,
    diversity: float = 0.5,
) -> list[tuple[int, float]]:
    doc_sims = cosine_matrix(doc_embedding, word_embeddings).ravel()
    word_sims = cosine_matrix(word_embeddings, word_embeddings)
    n = doc_sims.shape[0]
    chosen = [int(np.argmax(doc_sims))]
    candidates = [i for i in range(n) if i != chosen[0]]
    for _ in range(min(k - 1, n - 1)):
        cand = np.array(candidates)
        cand_doc = doc_sims[cand]
        cand_chosen_max = word_sims[np.ix_(cand, chosen)].max(axis=1)
        scores = cand_doc * (1.0 - diversity) - cand_chosen_max * diversity
        pick = int(cand[int(np.argmax(scores))])
        chosen.append(pick)
        candidates.remove(pick)
    return [(i, float(doc_sims[i])) for i in chosen]


def max_sum(
    doc_embedding: np.ndarray,
    word_embeddings: np.ndarray,
    k: int,
    max_sum_candidates: int = 20,
) -> list[tuple[int, float]]:
    max_sum_candidates = max(k, max_sum_candidates)
    doc_sims = cosine_matrix(doc_embedding, word_embeddings).ravel()
    word_sims = cosine_matrix(word_embeddings, word_embeddings)
    top = np.argsort(-doc_sims, kind="stable")[: min(max_sum_candidates, doc_sims.shape[0])]
    best_combo: tuple[int, ...] | None = None
    best_score = None
    for combo in combinations([int(i) for i in top], min(k, top.shape[0])):
        idx = np.array(combo)
        score = float(word_sims[np.ix_(idx, idx)].sum())
        if best_score is None or score < best_score:
            best_score = score
            best_combo = combo
    assert best_combo is not None
    return [(i, float(doc_sims[i])) for i in best_combo]
