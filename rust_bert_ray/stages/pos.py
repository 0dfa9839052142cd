"""Part-of-speech tagging stage.

Mirrors ``POSModel`` (/root/reference/src/pipelines/pos_tagging.rs:164-294)
— a token-classification pipeline whose labels are POS tags — including
the punctuation override (pos_tagging.rs:271-293): a token made entirely
of ASCII punctuation whose predicted score is < 0.5 is relabeled ``"."``
with score 1.0.

Deterministic backend: suffix/shape-rule logits over a small UPOS-ish tag
set (stands in for the trained MobileBERT head); softmax + argmax decode
is the reference's.
"""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa

from rust_bert_ray.scorers import softmax
from rust_bert_ray.tokenization import SubwordTokenizer

POS_TAGS = ["NOUN", "VERB", "ADJ", "ADP", "DET", "PRON", "NUM", "PUNCT", "X"]
_TAG_INDEX = {t: i for i, t in enumerate(POS_TAGS)}

_DETS = {"the", "a", "an", "this", "that", "these", "those"}
_ADPS = {"in", "on", "at", "of", "for", "with", "by", "from", "to", "about"}
_PRONS = {"i", "you", "he", "she", "it", "we", "they", "my", "your"}
_VERB_SUFFIX = ("ing", "ed", "ize", "ise", "ate")
_ADJ_SUFFIX = ("ous", "ful", "ive", "able", "ible", "al", "ic")

POS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("word", pa.string()),
        ("label", pa.string()),
        ("score", pa.float64()),
        ("begin", pa.int32()),
        ("end", pa.int32()),
    ]
)


def is_punctuation(token: str) -> bool:
    """All chars ASCII punctuation (pos_tagging.rs:291-293)."""
    return len(token) > 0 and all(c in string.punctuation for c in token)


def _word_logits(word: str) -> np.ndarray:
    logits = np.zeros(len(POS_TAGS))
    w = word.lower()
    if w.isdigit():
        logits[_TAG_INDEX["NUM"]] = 5.0
    elif is_punctuation(word):
        # deliberately low-confidence so the punctuation override fires,
        # exercising the reference's fixup path
        logits[_TAG_INDEX["X"]] = 0.3
    elif w in _DETS:
        logits[_TAG_INDEX["DET"]] = 5.0
    elif w in _ADPS:
        logits[_TAG_INDEX["ADP"]] = 5.0
    elif w in _PRONS:
        logits[_TAG_INDEX["PRON"]] = 5.0
    elif w.endswith(_VERB_SUFFIX):
        logits[_TAG_INDEX["VERB"]] = 4.5
    elif w.endswith(_ADJ_SUFFIX):
        logits[_TAG_INDEX["ADJ"]] = 4.5
    else:
        logits[_TAG_INDEX["NOUN"]] = 3.0
    return logits


class PosStage:
    """documents → one row per word with POS label + char span."""

    def __init__(self):
        self.tokenizer = SubwordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {n: [] for n in POS_SCHEMA.names}
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            enc = self.tokenizer.encode(text)
            # word-initial pieces define the word list (subwords share tags)
            seen: set[int] = set()
            for pos, w_idx in enumerate(enc.word_indices):
                if w_idx in seen or enc.offsets[pos] is None:
                    continue
                seen.add(w_idx)
                # reconstruct the full word from its pieces
                b = enc.offsets[pos][0]
                e = enc.offsets[pos][1]
                for p2 in range(pos + 1, len(enc.word_indices)):
                    if enc.word_indices[p2] != w_idx:
                        break
                    e = enc.offsets[p2][1]
                word = text[b:e]
                probs = softmax(_word_logits(word))
                li = int(probs.argmax())
                label, score = POS_TAGS[li], float(probs[li])
                # punctuation override: pos_tagging.rs:271-293
                if score < 0.5 and is_punctuation(word):
                    label, score = ".", 1.0
                rows["doc_id"].append(doc_id)
                rows["word"].append(word)
                rows["label"].append(label)
                rows["score"].append(round(score, 5))
                rows["begin"].append(b)
                rows["end"].append(e)
        return pa.Table.from_pydict(rows, schema=POS_SCHEMA)
