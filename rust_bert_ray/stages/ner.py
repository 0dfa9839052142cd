"""Triple-extraction stages: NER over interleaved docs, then relation
classification over entity pairs.

``NerStage`` mirrors the end-to-end decode of ``NERModel::predict_full_entities``
(/root/reference/src/pipelines/ner.rs:324-352 →
token_classification.rs:957-1235): tokenize with char offsets → sliding-window
featurize → batched logits → softmax → argmax → per-token decode (owned,
non-special positions only) → sub-token consolidation → BIOES chunking.
The model backend is a pluggable scorer (see rust_bert_ray.scorers); the
decode algebra is the reference's, unchanged.

Both stages are **actor classes** for ``map_batches(Cls, concurrency=N)``:
tokenizer/scorer construction happens once per actor in ``__init__``
(the reference's load-once ``VarStore::load`` boundary,
token_classification.rs:511-513), per-batch work in ``__call__``.

Scale notes (100 TB):
- rows stay zero-copy Arrow until the per-document text loop, which is the
  irreducible NLP hot path (the reference loops per token in Rust too);
  logits/softmax are vectorized per feature-batch with numpy;
- a bounded memo on exact span text amortizes repeated content (dedup'd
  web corpora repeat heavily); cache is per-actor, no shared state;
- the ``spans`` column is carried through *untouched* (never reconstructed)
  to honor the per-row span-sequence invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rust_bert_ray.decode.chunking import Entity, consolidate_entities
from rust_bert_ray.decode.consolidate import AGG_FIRST, Token, consolidate_tokens
from rust_bert_ray.decode.featurize import generate_features
from rust_bert_ray.scorers import (
    NER_LABELS,
    DeterministicRelationScorer,
    DeterministicTagScorer,
    PREDICATES,
    softmax,
)
from rust_bert_ray.tokenization import MASK_SPECIAL, SubwordTokenizer

ENTITY_STRUCT = pa.struct(
    [
        ("sent_idx", pa.int32()),
        ("word", pa.string()),
        ("label", pa.string()),
        ("score", pa.float64()),
        ("begin", pa.int32()),
        ("end", pa.int32()),
    ]
)
ENTITY_LIST_TYPE = pa.list_(ENTITY_STRUCT)

TRIPLE_FIELDS = [
    ("doc_id", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj", pa.string()),
    ("subj_label", pa.string()),
    ("subj_begin", pa.int32()),
    ("subj_end", pa.int32()),
    ("subj_score", pa.float64()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_label", pa.string()),
    ("obj_begin", pa.int32()),
    ("obj_end", pa.int32()),
    ("obj_score", pa.float64()),
    ("rel_score", pa.float64()),
]
TRIPLE_SCHEMA = pa.schema(TRIPLE_FIELDS)


class NerStage:
    """docs(doc_id, spans) → docs + entities list column."""

    def __init__(
        self,
        gazetteer: dict[str, str],
        max_length: int = 64,
        piece_len: int = 4,
        label_aggregation: str = AGG_FIRST,
        memo_cap: int = 200_000,
        tokenizer=None,
        scorer=None,
    ):
        # ``tokenizer``/``scorer`` are injectable (the reference's
        # new_with_tokenizer + ModelResource hooks, SURVEY.md §2.10): any
        # object with .encode() / .tag_words()+.logits_for_pieces() works.
        self.tokenizer = tokenizer or SubwordTokenizer(piece_len=piece_len)
        self.scorer = scorer or DeterministicTagScorer(gazetteer)
        self.max_length = max_length
        self.label_aggregation = label_aggregation
        self.memo: dict[str, list[Entity]] = {}
        self.memo_cap = memo_cap

    def _entities_for_text(self, text: str) -> list[Entity]:
        cached = self.memo.get(text)
        if cached is not None:
            return cached
        enc = self.tokenizer.encode(text)
        # word-level tags once per text (the scorer's view of "weights")
        word_tags = self.scorer.tag_words(enc.words or [])
        if all(t == "O" for t in word_tags):
            # exact shortcut: all-O spans decode to zero entities
            # (consolidation keeps labels, chunker emits nothing) — skip
            # windowing and the per-position decode for the no-entity case
            if len(self.memo) < self.memo_cap:
                self.memo[text] = []
            return []
        features = generate_features(enc, example_index=0, max_length=self.max_length)

        tokens: list[Token] = []
        for f in features:
            logits = self.scorer.logits_for_pieces(
                word_tags, f.word_indices, f.input_ids
            )
            probs = softmax(logits, axis=-1)
            label_ids = probs.argmax(axis=-1)
            for pos in range(len(f.input_ids)):
                if f.masks[pos] == MASK_SPECIAL or not f.reference_feature[pos]:
                    continue
                li = int(label_ids[pos])
                b, e = f.offsets[pos]
                tokens.append(
                    Token(
                        text=text[b:e],
                        score=float(probs[pos, li]),
                        label=NER_LABELS[li],
                        label_index=li,
                        sentence=0,
                        index=pos,
                        word_index=f.word_indices[pos],
                        offset=(b, e),
                        mask=f.masks[pos],
                    )
                )
        merged = consolidate_tokens(tokens, self.label_aggregation)
        entities = consolidate_entities(merged)
        if len(self.memo) < self.memo_cap:
            self.memo[text] = entities
        return entities

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        all_entities = []
        for spans in spans_col:
            doc_entities = []
            for span in spans or []:
                if span["kind"] != "text" or not span["text"]:
                    continue
                for ent in self._entities_for_text(span["text"]):
                    doc_entities.append(
                        {
                            "sent_idx": span["offset"],
                            "word": ent.word,
                            "label": ent.label,
                            "score": ent.score,
                            "begin": ent.offset[0],
                            "end": ent.offset[1],
                        }
                    )
            all_entities.append(doc_entities)
        return batch.append_column(
            "entities", pa.array(all_entities, type=ENTITY_LIST_TYPE)
        )


class RelationStage:
    """docs+entities → exploded (subj, pred, obj) candidate triple rows.

    Sequence-classification semantics (softmax + argmax over predicate
    logits, /root/reference/src/pipelines/sequence_classification.rs:745-752)
    applied to each ordered entity pair within one text span; candidates
    scoring ``no_relation`` or below ``min_score`` are dropped.  Entirely
    row-local — no shuffle.
    """

    def __init__(self, min_score: float = 0.5, memo_cap: int = 500_000):
        self.scorer = DeterministicRelationScorer()
        self.min_score = min_score
        self.memo: dict[tuple[str, str, str], tuple[str, float]] = {}
        self.memo_cap = memo_cap

    def _classify(self, gap: str, s_label: str, o_label: str) -> tuple[str, float]:
        key = (gap, s_label, o_label)
        cached = self.memo.get(key)
        if cached is not None:
            return cached
        logits = self.scorer.logits_for_pair(gap, s_label, o_label)
        probs = softmax(logits)
        idx = int(probs.argmax())
        out = (PREDICATES[idx], float(probs[idx]))
        if len(self.memo) < self.memo_cap:
            self.memo[key] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        entities_col = batch.column("entities").to_pylist()
        rows: dict[str, list] = {name: [] for name, _ in TRIPLE_FIELDS}
        for doc_id, spans, entities in zip(doc_ids, spans_col, entities_col):
            if not entities:
                continue
            text_by_offset = {
                s["offset"]: s["text"] for s in spans or [] if s["kind"] == "text"
            }
            by_sent: dict[int, list[dict]] = {}
            for ent in entities:
                by_sent.setdefault(ent["sent_idx"], []).append(ent)
            for sent_idx, ents in by_sent.items():
                text = text_by_offset.get(sent_idx, "")
                ents.sort(key=lambda e: e["begin"])
                for i, subj in enumerate(ents):
                    for obj in ents[i + 1 :]:
                        gap = text[subj["end"] : obj["begin"]]
                        pred, score = self._classify(
                            gap, subj["label"], obj["label"]
                        )
                        if pred == "no_relation" or score < self.min_score:
                            continue
                        rows["doc_id"].append(doc_id)
                        rows["sent_idx"].append(sent_idx)
                        rows["subj"].append(subj["word"])
                        rows["subj_label"].append(subj["label"])
                        rows["subj_begin"].append(subj["begin"])
                        rows["subj_end"].append(subj["end"])
                        rows["subj_score"].append(subj["score"])
                        rows["pred"].append(pred)
                        rows["obj"].append(obj["word"])
                        rows["obj_label"].append(obj["label"])
                        rows["obj_begin"].append(obj["begin"])
                        rows["obj_end"].append(obj["end"])
                        rows["obj_score"].append(obj["score"])
                        rows["rel_score"].append(score)
        return pa.Table.from_pydict(rows, schema=TRIPLE_SCHEMA)
