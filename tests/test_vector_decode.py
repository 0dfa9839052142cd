"""Bit-equality of the batch-flat vectorized NER decode vs the per-text
reference path (decode/vector.py + stages/ner.py fast path).

The fast path must be an *exact* reimplementation of
``NerStage._entities_for_text`` (token_classification.rs decode algebra)
for the default stack — same entities, same float scores, same offsets —
including fallback cases (multi-window texts, unicode, splitter
disagreement)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_bert_ray.corpus import DOCS_SCHEMA, GAZETTEER, generate
from rust_bert_ray.decode.vector import BatchWordSplitter, bio_runs
from rust_bert_ray.stages.ner import NerStage
from rust_bert_ray.tokenization import SubwordTokenizer

_WORD_RE = re.compile(r"(?u)\w+|[^\w\s]")


def _legacy_stage() -> NerStage:
    # Injecting the (default) tokenizer explicitly disables the fast path.
    stage = NerStage(GAZETTEER, tokenizer=SubwordTokenizer(piece_len=4))
    assert not stage._fast
    return stage


def _docs_table(texts_per_doc: list[list[str]]) -> pa.Table:
    rows = []
    for i, texts in enumerate(texts_per_doc):
        spans = [
            {"kind": "text", "text": t, "media_ref": "", "offset": off}
            for off, t in enumerate(texts)
        ]
        rows.append({"doc_id": f"d{i}", "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def _assert_same(docs: pa.Table) -> None:
    fast = NerStage(GAZETTEER)
    assert fast._fast
    out_fast = fast(docs).column("entities").to_pylist()
    out_legacy = _legacy_stage()(docs).column("entities").to_pylist()
    assert out_fast == out_legacy


def test_fast_equals_legacy_on_corpus():
    docs, _ = generate(300, diversify=True)
    _assert_same(docs)


def test_fast_equals_legacy_plain_corpus():
    docs, _ = generate(300, diversify=False)
    _assert_same(docs)


def test_multiwindow_text_falls_back_and_matches():
    # > 62 pieces → multi-window → per-text path inside the fast stage
    long_text = ("John Smith works for Acme Corp. " * 12) + "tail"
    docs = _docs_table([[long_text], ["Amy visited Paris last spring."]])
    _assert_same(docs)


def test_unicode_and_punctuation():
    docs = _docs_table(
        [
            ["Amy, née Durand, visited Paris — twice!"],
            ["чушь Amy visited Paris 北京 ok"],
            ["...---..."],
            [""],
        ]
    )
    _assert_same(docs)


def test_media_only_and_empty_docs():
    rows = [
        {"doc_id": "m0", "spans": [
            {"kind": "image", "text": "", "media_ref": "media://x", "offset": 0}
        ]},
        {"doc_id": "m1", "spans": []},
        {"doc_id": "m2", "spans": [
            {"kind": "text", "text": "Amy visited Paris last spring.",
             "media_ref": "", "offset": 3}
        ]},
    ]
    docs = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    _assert_same(docs)
    # sent_idx carries the span offset
    ents = NerStage(GAZETTEER)(docs).column("entities").to_pylist()
    assert ents[0] == [] and ents[1] == []
    assert all(e["sent_idx"] == 3 for e in ents[2])


def test_entity_at_text_boundaries():
    # entity surface as the very first and very last words of a text,
    # and adjacent texts whose entities must not merge across texts
    docs = _docs_table(
        [
            ["Paris is a city in France."],
            ["Amy", "Paris"],
            ["in Paris", "Amy works for Acme Corp."],
        ]
    )
    _assert_same(docs)


def test_gazetteer_multiword_no_cross_text_match():
    # "John Smith" split across two spans must NOT match as one entity
    docs = _docs_table([["Asked John", "Smith about Acme Corp"]])
    fast_out = NerStage(GAZETTEER)(docs).column("entities").to_pylist()
    _assert_same(docs)
    words = {e["word"] for e in fast_out[0]}
    assert "John Smith" not in words


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("abz ÀΩ9_.,!-\n\tÉ日")), max_size=12),
        max_size=6,
    )
)
def test_splitter_matches_finditer(texts):
    split = BatchWordSplitter().split(texts)
    assert split is not None
    words, begins, tid = split
    exp_words, exp_begins, exp_tid = [], [], []
    for i, t in enumerate(texts):
        for m in _WORD_RE.finditer(t):
            exp_words.append(m.group(0))
            exp_begins.append(m.start())
            exp_tid.append(i)
    assert words == exp_words
    assert begins.tolist() == exp_begins
    assert tid.tolist() == exp_tid


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=6), max_size=30))
def test_bio_runs_matches_reference_chunker(lids):
    from rust_bert_ray.decode.chunking import consolidate_entities
    from rust_bert_ray.decode.consolidate import Token
    from rust_bert_ray.scorers import NER_LABELS

    tokens = [
        Token(
            text=f"w{i}",
            score=0.5,
            label=NER_LABELS[lid],
            label_index=lid,
            sentence=0,
            index=i,
            word_index=i,
            offset=(i, i + 1),
            mask=0,
        )
        for i, lid in enumerate(lids)
    ]
    expected = [
        (e.word.split(" "), e.label) for e in consolidate_entities(tokens)
    ]
    arr = np.asarray(lids, dtype=np.int64)
    nz, rs, re_ = bio_runs(arr, np.array([0], dtype=np.int64)[: len(lids)])
    got = []
    for k in range(len(rs)):
        members = nz[rs[k] : re_[k] + 1]
        typ = (arr[members[0]] + 1) // 2
        label = ["", "PER", "ORG", "LOC"][typ]
        got.append(([f"w{m}" for m in members.tolist()], label))
    assert got == expected


def test_fast_path_invariant_to_batch_boundaries():
    """The batch-flat decode must produce identical entities regardless
    of how docs are sliced into batches (block-boundary invariance)."""
    import pyarrow as pa

    docs, _ = generate(120, diversify=True)
    whole = NerStage(GAZETTEER)(docs).column("entities").to_pylist()
    stage = NerStage(GAZETTEER)  # shared caches across batches
    pieces = []
    for lo, hi in ((0, 7), (7, 40), (40, 41), (41, 120)):
        out = stage(docs.slice(lo, hi - lo))
        pieces.extend(out.column("entities").to_pylist())
    assert pieces == whole
