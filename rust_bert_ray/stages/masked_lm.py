"""Masked-language-model stage.

Mirrors ``MaskedLanguageModel::predict``
(/root/reference/src/pipelines/masked_language.rs):

- the user-facing mask string (default ``<mask>``) is replaced by the
  tokenizer's mask token before encoding (masked_language.rs:580-593);
- for every mask position, the top-k tokens by RAW LOGIT are returned —
  scores are NOT softmaxed (tests/bert.rs:135 asserts logit ≈ 8.09);
- output: one row per (doc, mask position, rank).

Deterministic backend: a unigram LM whose logit for token *t* is its
occurrence count in the visible (unmasked) part of the document — a real
statistical LM, reproducible everywhere.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

MASK_TOKEN = "<mask>"

MLM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("mask_index", pa.int32()),
        ("rank", pa.int32()),
        ("token", pa.string()),
        ("score", pa.float64()),  # raw logit (count), not a probability
    ]
)


class MaskedLmStage:
    """rows (doc_id, text with <mask>) → top-k predictions per mask."""

    def __init__(self, top_k: int = 1, mask_token: str = MASK_TOKEN):
        self.top_k = top_k
        self.mask_token = mask_token

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: dict[str, list] = {n: [] for n in MLM_SCHEMA.names}
        for doc_id, text in zip(doc_ids, texts):
            tokens = text.split(" ")
            mask_positions = [i for i, t in enumerate(tokens) if t == self.mask_token]
            if not mask_positions:
                continue
            visible = Counter(t for t in tokens if t != self.mask_token and t)
            # deterministic order: count desc, then token asc
            ranked = sorted(visible.items(), key=lambda kv: (-kv[1], kv[0]))
            for m_idx, pos in enumerate(mask_positions):
                for rank, (tok, count) in enumerate(ranked[: self.top_k]):
                    rows["doc_id"].append(doc_id)
                    rows["mask_index"].append(m_idx)
                    rows["rank"].append(rank)
                    rows["token"].append(tok)
                    rows["score"].append(float(count))
        return pa.Table.from_pydict(rows, schema=MLM_SCHEMA)


def mask_nth_token(batch: pa.Table, n: int = 2) -> pa.Table:
    """Replace the n-th token of each doc with the mask token (test prep)."""
    texts = batch.column("text").to_pylist()
    masked = []
    for t in texts:
        toks = t.split(" ")
        if len(toks) > n:
            toks[n] = MASK_TOKEN
        masked.append(" ".join(toks))
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", pa.array(masked)
    )
