"""Unigram-LM (SentencePiece-family) tokenizer tests."""

from __future__ import annotations

import math

import pytest

from rust_bert_ray.tokenization import MASK_CONTINUATION, MASK_NONE
from rust_bert_ray.unigram import UnigramTokenizer


@pytest.fixture(scope="module")
def tk():
    return UnigramTokenizer()


def test_segmentation_is_total_and_lossless(tk):
    for w in ["Paris", "headquartered", "xyzzy", "a", "00001234x5", "ÀÉ日"]:
        pieces = tk.segment(w)
        assert "".join(pieces) == w


def test_viterbi_matches_exhaustive_enumeration(tk):
    """DP result == brute-force best over ALL segmentations under the
    global rule (max score, fewest pieces, longest-last-piece tuple) —
    including adversarial repeated-char tie cases."""
    logp = tk.logp
    unk = tk.unk_logp
    max_len = tk.max_piece_len

    def brute(word):
        best_key, best = None, None
        stack = [(0, 0.0, [])]
        while stack:
            pos, score, pieces = stack.pop()
            if pos == len(word):
                key = (score, -len(pieces),
                       tuple(len(p) for p in reversed(pieces)))
                if best_key is None or key > best_key:
                    best_key, best = key, pieces
                continue
            for end in range(pos + 1, min(len(word), pos + max_len) + 1):
                piece = word[pos:end]
                lp = logp.get(piece)
                if lp is None:
                    if end - pos == 1:
                        lp = unk
                    else:
                        continue
                stack.append((end, score + lp, pieces + [piece]))
        return best

    words = ["Paris", "Amsterdam", "corporation", "aaaa", "....", "0000",
             "ililil", "sssss", "Initech", "headquartered", "ref"]
    for w in words:
        assert tk.segment(w) == brute(w), w


def test_encode_offsets_and_masks(tk):
    text = "Acme Corporation in Amsterdam."
    enc = tk.encode(text)
    # offsets slice back to the piece surfaces
    for (b, e), i in zip(enc.offsets, enc.ids):
        piece = tk.inv_vocab[i]
        if piece != "<unk>":
            assert text[b:e] == piece
    seen = set()
    for m, w in zip(enc.masks, enc.word_indices):
        if w in seen:
            assert m == MASK_CONTINUATION
        else:
            assert m == MASK_NONE
            seen.add(w)


def test_decode_word_joined(tk):
    enc = tk.encode("My name is Amy")
    assert tk.decode(enc.ids, enc.word_indices) == "My name is Amy"


def test_unknown_chars_become_unk(tk):
    enc = tk.encode("日本")
    assert all(i == tk.unk_id for i in enc.ids)
    assert tk.decode(enc.ids, enc.word_indices) == "<unk><unk>"


def test_model_probabilities_normalized(tk):
    total = sum(math.exp(lp) for lp in tk.logp.values())
    assert total == pytest.approx(1.0, rel=1e-6)


def test_ner_stage_accepts_unigram_tokenizer(tk):
    """The unigram tokenizer slots into NerStage's injectable-tokenizer
    contract (words from the shared regex → gazetteer tagging works;
    piece offsets/masks drive the reference decode path)."""
    import pyarrow as pa

    from rust_bert_ray.corpus import DOCS_SCHEMA, GAZETTEER
    from rust_bert_ray.stages.ner import NerStage

    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "u-0",
                "spans": [
                    {"kind": "text", "text": "Amy visited Paris last spring.",
                     "media_ref": "", "offset": 0}
                ],
            }
        ],
        schema=DOCS_SCHEMA,
    )
    stage = NerStage(gazetteer=GAZETTEER, tokenizer=tk)
    assert not stage._fast  # injected backend → reference path
    ents = stage(docs).column("entities").to_pylist()[0]
    found = {(e["word"], e["label"]) for e in ents}
    assert ("Amy", "PER") in found and ("Paris", "LOC") in found
    # offsets point at the surface
    for e in ents:
        assert "Amy visited Paris last spring."[e["begin"]:e["end"]] == e["word"]
