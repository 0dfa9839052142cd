"""Question-answering stage (extractive span prediction).

Mirrors ``QuestionAnsweringModel::predict``
(/root/reference/src/pipelines/question_answering.rs:612-1083):

- question encoded first and truncated to ``max_query_length`` tokens;
  the context is windowed with ``doc_stride`` into features of
  ``max_seq_length`` ([CLS] question [SEP] context-window [SEP]);
- ``p_mask`` marks non-answer positions (question + specials,
  question_answering.rs:919-1018);
- per feature: p-masked softmax over start/end logits, banded
  outer-product span decode, top-k (question_answering.rs:830-917);
- answers merged across windows, deduplicated (first occurrence),
  sorted by score desc, truncated to top_k; answer text is a
  **character** slice of the context (question_answering.rs:852-863).

The model backend is a deterministic scorer: the question word selects a
target entity kind (Where→LOC, Who→PER, "what company"→ORG) and the
start/end logits peak at context positions whose gazetteer tag matches —
standing in for a trained QA head while the entire decode path stays the
reference's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rust_bert_ray.decode.qa import Answer, decode_spans, masked_softmax, merge_and_rank
from rust_bert_ray.scorers import DeterministicTagScorer
from rust_bert_ray.tokenization import MASK_SPECIAL, SubwordTokenizer
from rust_bert_ray.decode.featurize import generate_features

QA_SCHEMA = pa.schema(
    [
        ("qa_id", pa.string()),
        ("question", pa.string()),
        ("answer", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("score", pa.float64()),
    ]
)

_QUESTION_KIND = [
    ("where", "LOC"),
    ("who", "PER"),
    ("what company", "ORG"),
    ("what organization", "ORG"),
]


def qa_inputs_from_docs(batch: pa.Table) -> pa.Table:
    """Interleaved docs → (qa_id, question, context) rows for the demo
    corpus: each "My name is {P}. I live in {L}." span asks where P lives.
    Plain batch fn — used by the driver query AND the expected-table
    builder so both sides see identical inputs."""
    rows: dict[str, list] = {"qa_id": [], "question": [], "context": []}
    for doc_id, spans in zip(
        batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
    ):
        for span in spans or []:
            if span["kind"] != "text" or "I live in" not in span["text"]:
                continue
            name = span["text"].split("My name is ")[-1].split(".")[0]
            rows["qa_id"].append(f"{doc_id}:{span['offset']}")
            rows["question"].append(f"Where does {name} live ?")
            rows["context"].append(span["text"])
    # explicit schema: a batch with zero QA spans must still emit string
    # columns, not null-typed ones (block schema unification)
    return pa.Table.from_pydict(
        rows,
        schema=pa.schema(
            [("qa_id", pa.string()), ("question", pa.string()),
             ("context", pa.string())]
        ),
    )


class QaStage:
    """rows (qa_id, question, context) → extracted answers."""

    def __init__(
        self,
        gazetteer: dict[str, str],
        max_seq_length: int = 384,
        doc_stride: int = 128,
        max_query_length: int = 64,
        max_answer_length: int = 15,
        top_k: int = 1,
        tokenizer=None,
    ):
        # injectable tokenizer (same slot as NerStage): any object with
        # .encode() producing EncodedText works — WordPieceTokenizer is a
        # drop-in (test_wordpiece/test_nlp_stages exercise it)
        self.tokenizer = tokenizer or SubwordTokenizer()
        self.tagger = DeterministicTagScorer(gazetteer)
        self.max_seq_length = max_seq_length
        self.doc_stride = doc_stride
        self.max_query_length = max_query_length
        self.max_answer_length = max_answer_length
        self.top_k = top_k

    def _target_kind(self, question: str) -> str:
        q = question.lower()
        for needle, kind in _QUESTION_KIND:
            if needle in q:
                return kind
        return "PER"

    def _answers_for(self, question: str, context: str) -> list[Answer]:
        kind = self._target_kind(question)
        enc = self.tokenizer.encode(context)
        # word-level tags once per context (the scorer's "weights")
        tags = self.tagger.tag_words(enc.words or [])

        # window the context like the reference (question + specials are
        # prepended conceptually; content budget = max_seq - query - 3)
        q_len = min(
            len(self.tokenizer.encode(question).ids), self.max_query_length
        )
        content = max(8, self.max_seq_length - q_len - 3)
        features = generate_features(
            enc,
            example_index=0,
            max_length=min(content + 2, self.max_seq_length),
            doc_stride=self.doc_stride,
        )
        answers: list[Answer] = []
        for f in features:
            n = len(f.input_ids)
            start_logits = np.zeros(n)
            end_logits = np.zeros(n)
            p_mask = np.zeros(n)
            def in_entity(pos: int) -> bool:
                if pos >= n or f.masks[pos] == MASK_SPECIAL:
                    return False
                w = f.word_indices[pos]
                return 0 <= w < len(tags) and tags[w].endswith(kind) and tags[w] != "O"

            from rust_bert_ray.tokenization import MASK_CONTINUATION

            for pos in range(n):
                if f.masks[pos] == MASK_SPECIAL:
                    p_mask[pos] = 1  # specials are non-answer positions
                    continue
                if not in_entity(pos):
                    continue
                w = f.word_indices[pos]
                tag = tags[w]
                # start peaks at the entity's FIRST piece (word-initial piece
                # of a B-tagged word)
                if tag.startswith("B") and f.masks[pos] != MASK_CONTINUATION:
                    start_logits[pos] = 8.0
                # end peaks at the entity's LAST piece: next piece either
                # leaves the entity or starts a new one (B-word boundary)
                nxt = pos + 1
                continues = (
                    in_entity(nxt)
                    and (
                        f.word_indices[nxt] == w  # same word, more pieces
                        or tags[f.word_indices[nxt]].startswith("I")
                    )
                )
                end_logits[pos] = 4.0 if continues else 8.0
            start = masked_softmax(start_logits, p_mask)
            end = masked_softmax(end_logits, p_mask)
            starts, ends, scores = decode_spans(
                start, end, self.top_k, self.max_answer_length
            )
            for s_pos, e_pos, sc in zip(starts, ends, scores):
                so = f.offsets[int(s_pos)]
                eo = f.offsets[int(e_pos)]
                begin = so[0] if so else 0
                stop = eo[1] if eo else 0
                answers.append(
                    Answer(
                        score=float(sc),
                        start=begin,
                        end=stop,
                        answer=context[begin:stop],
                    )
                )
        return merge_and_rank(answers, self.top_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qa_ids = batch.column("qa_id").to_pylist()
        questions = batch.column("question").to_pylist()
        contexts = batch.column("context").to_pylist()
        rows: dict[str, list] = {n: [] for n in QA_SCHEMA.names}
        for qa_id, q, ctx in zip(qa_ids, questions, contexts):
            for a in self._answers_for(q, ctx):
                rows["qa_id"].append(qa_id)
                rows["question"].append(q)
                rows["answer"].append(a.answer)
                rows["start"].append(a.start)
                rows["end"].append(a.end)
                rows["score"].append(round(a.score, 5))
        return pa.Table.from_pydict(rows, schema=QA_SCHEMA)
