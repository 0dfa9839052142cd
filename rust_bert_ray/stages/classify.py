"""Sequence-classification stages: sentiment and zero-shot.

Mirrors the decode semantics of the reference:

- ``SentimentStage`` — sequence-classification softmax+argmax
  (/root/reference/src/pipelines/sequence_classification.rs:745-752) with
  the sentiment id→polarity rule (id==1 → Positive,
  /root/reference/src/pipelines/sentiment.rs:184-203).  The model backend
  is a deterministic lexicon scorer: logits = occurrence counts of
  positive/negative lexicon words (vectorized substring counts).
- ``ZeroShotStage`` — label → hypothesis text via the template
  ``"This example is about {}."`` (zero_shot_classification.rs:717-738),
  one entailment logit per (premise, hypothesis) pair, softmax across
  labels, argmax (first-max tie-break, matching np.argmax).

Both are stateless-per-batch actor stages (lexicons compiled once in
``__init__``), fully vectorized via ``pyarrow.compute.count_substring``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rust_bert_ray.scorers import softmax

POS_LEXICON = ["fast", "small"]
NEG_LEXICON = ["slow", "big"]

ZERO_SHOT_TEMPLATE = "This example is about {}."
ZERO_SHOT_LABELS = ["querying", "storage", "streaming"]  # tie-break order
ZERO_SHOT_KEYWORDS = {
    "querying": ["join", "filter", "sort"],
    "storage": ["table", "row", "column"],
    "streaming": ["stream", "window", "batch"],
}


def _count_terms(texts: pa.ChunkedArray | pa.Array, terms: list[str]) -> np.ndarray:
    total = np.zeros(len(texts), dtype=np.int64)
    for term in terms:
        total += pc.count_substring(texts, term).to_numpy(zero_copy_only=False)
    return total


class SentimentStage:
    """documents → (doc_id, pos_cnt, neg_cnt, label, score)."""

    def __init__(self, pos: list[str] | None = None, neg: list[str] | None = None):
        self.pos = pos if pos is not None else POS_LEXICON
        self.neg = neg if neg is not None else NEG_LEXICON

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        pos_cnt = _count_terms(texts, self.pos)
        neg_cnt = _count_terms(texts, self.neg)
        logits = np.stack([neg_cnt, pos_cnt], axis=1).astype(np.float64)
        probs = softmax(logits, axis=1)
        ids = probs.argmax(axis=1)  # ties → id 0 (negative), like np.argmax
        labels = np.where(ids == 1, "positive", "negative")
        scores = probs[np.arange(len(ids)), ids]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "pos_cnt": pa.array(pos_cnt, type=pa.int64()),
                "neg_cnt": pa.array(neg_cnt, type=pa.int64()),
                "label": pa.array(labels.tolist(), type=pa.string()),
                "score": pa.array(np.round(scores, 5), type=pa.float64()),
            }
        )


SENTIMENT_SQL = f"""
SELECT doc_id,
       (length(text) - length(replace(text, 'fast', ''))) // 4
     + (length(text) - length(replace(text, 'small', ''))) // 5 AS pos_cnt,
       (length(text) - length(replace(text, 'slow', ''))) // 4
     + (length(text) - length(replace(text, 'big', ''))) // 3   AS neg_cnt,
       CASE WHEN pos_cnt > neg_cnt THEN 'positive' ELSE 'negative' END AS label
FROM documents
"""


class ZeroShotStage:
    """documents × labels → best label per doc (entailment-style)."""

    def __init__(self, labels: list[str] | None = None, template=None):
        # ``template``: str with one {} slot or a callable label→hypothesis,
        # mirroring the ZeroShotTemplate closure hook
        # (zero_shot_classification.rs:717-722)
        self.labels = labels if labels is not None else ZERO_SHOT_LABELS
        if template is None:
            template = ZERO_SHOT_TEMPLATE
        self.hypotheses = [
            template(l) if callable(template) else template.format(l)
            for l in self.labels
        ]
        self.keywords = [ZERO_SHOT_KEYWORDS[l] for l in self.labels]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        counts = np.stack(
            [_count_terms(texts, kws) for kws in self.keywords], axis=1
        ).astype(np.float64)
        probs = softmax(counts, axis=1)
        best = probs.argmax(axis=1)  # first max wins, matches SQL tie order
        out = {
            "doc_id": batch.column("doc_id"),
            "label_pred": pa.array(
                [self.labels[i] for i in best], type=pa.string()
            ),
            "score": pa.array(
                np.round(probs[np.arange(len(best)), best], 5), type=pa.float64()
            ),
        }
        for j, label in enumerate(self.labels):
            out[f"c_{label}"] = pa.array(counts[:, j].astype(np.int64), type=pa.int64())
        return pa.Table.from_pydict(out)


ZERO_SHOT_SQL = """
SELECT doc_id,
       (length(text) - length(replace(text, 'join', ''))) // 4
     + (length(text) - length(replace(text, 'filter', ''))) // 6
     + (length(text) - length(replace(text, 'sort', ''))) // 4   AS c_querying,
       (length(text) - length(replace(text, 'table', ''))) // 5
     + (length(text) - length(replace(text, 'row', ''))) // 3
     + (length(text) - length(replace(text, 'column', ''))) // 6 AS c_storage,
       (length(text) - length(replace(text, 'stream', ''))) // 6
     + (length(text) - length(replace(text, 'window', ''))) // 6
     + (length(text) - length(replace(text, 'batch', ''))) // 5  AS c_streaming,
       CASE WHEN c_querying >= c_storage AND c_querying >= c_streaming THEN 'querying'
            WHEN c_storage >= c_streaming THEN 'storage'
            ELSE 'streaming' END AS label_pred
FROM documents
"""


class ZeroShotMultiLabelStage(ZeroShotStage):
    """Zero-shot **multilabel**: each (premise, hypothesis) pair is scored
    independently by a softmax over its (contradiction, entailment) logits
    and the entailment probability is returned for EVERY label
    (zero_shot_classification.rs:983-1031: ``output.slice(-1, 0, 3, 2)
    .softmax(-1).select(-1, -1)`` — no argmax across labels, no
    threshold).  softmax([c, e])[1] == sigmoid(e − c).

    Deterministic backend: entailment logit = keyword count, contradiction
    logit = ``bias`` — so score = sigmoid(count − bias).
    """

    def __init__(self, labels: list[str] | None = None, template=None,
                 bias: float = 2.0):
        super().__init__(labels, template)
        self.bias = bias

    def __call__(self, batch: pa.Table) -> pa.Table:
        from rust_bert_ray.functions.util import round_ha

        texts = batch.column("text")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        counts = np.stack(
            [_count_terms(texts, kws) for kws in self.keywords], axis=1
        ).astype(np.float64)
        # per-pair two-way softmax == sigmoid(entailment − contradiction)
        scores = 1.0 / (1.0 + np.exp(-(counts - self.bias)))
        n = len(doc_ids)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.repeat(doc_ids, len(self.labels)),
                                   type=pa.int64()),
                "label": pa.array(self.labels * n, type=pa.string()),
                "score": pa.array(
                    round_ha(scores.reshape(-1), 5), type=pa.float64()
                ),
            }
        )


# per-pair sigmoid(count − 2), every (doc, label) emitted
ZERO_SHOT_MULTI_SQL = """
SELECT doc_id, label, ROUND(1 / (1 + EXP(-(c - 2.0))), 5) AS score FROM (
  SELECT doc_id, 'querying' AS label,
         (length(text) - length(replace(text, 'join', ''))) // 4
       + (length(text) - length(replace(text, 'filter', ''))) // 6
       + (length(text) - length(replace(text, 'sort', ''))) // 4 AS c
  FROM documents
  UNION ALL
  SELECT doc_id, 'storage',
         (length(text) - length(replace(text, 'table', ''))) // 5
       + (length(text) - length(replace(text, 'row', ''))) // 3
       + (length(text) - length(replace(text, 'column', ''))) // 6
  FROM documents
  UNION ALL
  SELECT doc_id, 'streaming',
         (length(text) - length(replace(text, 'stream', ''))) // 6
       + (length(text) - length(replace(text, 'window', ''))) // 6
       + (length(text) - length(replace(text, 'batch', ''))) // 5
  FROM documents
)
"""


class MultiLabelStage:
    """Multilabel sequence classification: sigmoid(logit) ≥ threshold per
    label, independently (sequence_classification.rs:799-848 semantics —
    ``predict_multilabel`` applies sigmoid and keeps every label above the
    threshold, zero or many per input).

    Deterministic backend: logit per label = keyword count − ``bias`` so
    sigmoid(logit) ≥ 0.5 ⟺ count ≥ bias.  Emits one row per (doc, label).
    """

    def __init__(self, labels: list[str] | None = None, bias: float = 2.0,
                 threshold: float = 0.5):
        self.labels = labels if labels is not None else ZERO_SHOT_LABELS
        self.keywords = [ZERO_SHOT_KEYWORDS[l] for l in self.labels]
        self.bias = bias
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        counts = np.stack(
            [_count_terms(texts, kws) for kws in self.keywords], axis=1
        ).astype(np.float64)
        probs = 1.0 / (1.0 + np.exp(-(counts - self.bias)))
        keep = probs >= self.threshold
        rows = {"doc_id": [], "label": [], "score": []}
        for j, label in enumerate(self.labels):
            idx = np.nonzero(keep[:, j])[0]
            rows["doc_id"].extend(doc_ids[idx].tolist())
            rows["label"].extend([label] * len(idx))
            rows["score"].extend(np.round(probs[idx, j], 5).tolist())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "label": pa.array(rows["label"], type=pa.string()),
                "score": pa.array(rows["score"], type=pa.float64()),
            }
        )


# sigmoid(count − 2) ≥ 0.5 ⟺ count ≥ 2
MULTILABEL_SQL = """
SELECT doc_id, label FROM (
  SELECT doc_id, 'querying' AS label,
         (length(text) - length(replace(text, 'join', ''))) // 4
       + (length(text) - length(replace(text, 'filter', ''))) // 6
       + (length(text) - length(replace(text, 'sort', ''))) // 4 AS c
  FROM documents
  UNION ALL
  SELECT doc_id, 'storage',
         (length(text) - length(replace(text, 'table', ''))) // 5
       + (length(text) - length(replace(text, 'row', ''))) // 3
       + (length(text) - length(replace(text, 'column', ''))) // 6
  FROM documents
  UNION ALL
  SELECT doc_id, 'streaming',
         (length(text) - length(replace(text, 'stream', ''))) // 6
       + (length(text) - length(replace(text, 'window', ''))) // 6
       + (length(text) - length(replace(text, 'batch', ''))) // 5
  FROM documents
) WHERE c >= 2
"""
