"""Question-answering span decode algebra.

Reproduces ``QuestionAnsweringModel::decode`` and the surrounding
per-feature postprocessing at
/root/reference/src/pipelines/question_answering.rs:828-917:

- p_mask positions get -inf before softmax;
- candidates = outer product start ⊗ end, upper-triangular, band-limited
  to ``max_answer_len`` (``triu(0).tril(max_answer_len - 1)``);
- top-k by flattened score; start = flat // n, end = flat % n;
- answers across windows of one example are merged, deduplicated by full
  struct equality keeping first occurrence (question_answering.rs:114-132),
  sorted descending by score, truncated to top_k;
- answer text sliced from the context by **characters**
  (question_answering.rs:858-863).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Answer:
    """question_answering.rs:102-112."""

    score: float
    start: int
    end: int
    answer: str


def masked_softmax(logits: np.ndarray, p_mask: np.ndarray) -> np.ndarray:
    """Softmax with masked positions forced to probability ~0."""
    x = np.where(p_mask.astype(bool), -np.inf, logits.astype(np.float64))
    x = x - np.max(x)
    e = np.exp(x)
    return e / e.sum()


def decode_spans(
    start: np.ndarray, end: np.ndarray, top_k: int, max_answer_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(starts, ends, scores) for the top_k band-limited spans."""
    outer = np.outer(start, end)
    n = outer.shape[0]
    candidates = np.triu(np.tril(outer, max_answer_len - 1))
    flat = candidates.reshape(-1)
    if top_k == 1:
        idx = np.array([int(np.argmax(flat))])
    else:
        order = np.argsort(-flat, kind="stable")
        idx = order[: min(top_k, flat.shape[0])]
    return idx // n, idx % n, flat[idx]


def merge_and_rank(answers: list[Answer], top_k: int) -> list[Answer]:
    """Dedup (first occurrence, full equality) → sort desc → truncate."""
    seen: set[Answer] = set()
    unique: list[Answer] = []
    for a in answers:
        if a not in seen:
            seen.add(a)
            unique.append(a)
    unique.sort(key=lambda a: -a.score)
    return unique[:top_k]


def slice_answer(context: str, start_char: int, end_char: int) -> str:
    """Char-based slice (Python str indexing is already by code point)."""
    return context[start_char:end_char]
