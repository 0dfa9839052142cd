"""Stress/edge-case corpus through the full Ray extraction pipeline:
multi-window long docs, unicode, empty text spans, media-only docs."""

import pyarrow as pa
import pytest

from rust_bert_ray.corpus import DOCS_SCHEMA, GAZETTEER
from rust_bert_ray.pipelines.kg import extract_and_link, enrich_docs


def _docs_table():
    long_text = (
        "Asked John Smith about Acme Corp . "
        + " ".join(f"filler{i}" for i in range(3000))  # ≫ max_length subwords
        + " My name is Amy. I live in Paris."
    )
    rows = [
        {
            "doc_id": "stress-long",
            "spans": [
                {"kind": "text", "text": long_text, "media_ref": "", "offset": 0}
            ],
        },
        {
            "doc_id": "stress-unicode",
            "spans": [
                {
                    "kind": "text",
                    "text": "Müller 北京 emoji 🎉 then My name is Amy. I live in Paris.",
                    "media_ref": "",
                    "offset": 0,
                }
            ],
        },
        {
            "doc_id": "stress-empty-text",
            "spans": [{"kind": "text", "text": "", "media_ref": "", "offset": 0}],
        },
        {
            "doc_id": "stress-media-only",
            "spans": [
                {"kind": "image", "text": "", "media_ref": "media://ff", "offset": 0},
                {"kind": "audio", "text": "", "media_ref": "media://aa", "offset": 1},
            ],
        },
        {"doc_id": "stress-no-spans", "spans": []},
    ]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


@pytest.fixture(scope="module")
def stress_linked(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table())
    return extract_and_link(docs).to_pandas()


def test_long_doc_entities_survive_windowing(stress_linked):
    df = stress_linked[stress_linked.doc_id == "stress-long"]
    triples = set(zip(df.subj, df.pred, df.obj))
    # entities sit at the two extremes of a doc spanning dozens of windows
    assert ("John Smith", "affiliated_with", "Acme Corp") in triples
    assert ("Amy", "lives_in", "Paris") in triples


def test_long_doc_offsets_slice_back(stress_linked):
    df = stress_linked[stress_linked.doc_id == "stress-long"]
    long_text = _docs_table().to_pylist()[0]["spans"][0]["text"]
    for _, r in df.iterrows():
        assert long_text[r.subj_begin : r.subj_end] == r.subj
        assert long_text[r.obj_begin : r.obj_end] == r.obj


def test_unicode_doc_offsets(stress_linked):
    df = stress_linked[stress_linked.doc_id == "stress-unicode"]
    assert not df.empty
    text = _docs_table().to_pylist()[1]["spans"][0]["text"]
    for _, r in df.iterrows():
        assert text[r.subj_begin : r.subj_end] == r.subj


def test_degenerate_docs_produce_no_triples_and_no_errors(stress_linked):
    for doc_id in ("stress-empty-text", "stress-media-only", "stress-no-spans"):
        assert stress_linked[stress_linked.doc_id == doc_id].empty


def test_enrich_preserves_spans_for_degenerate_docs(ray_session):
    import ray.data

    docs = ray.data.from_arrow(_docs_table())
    out = enrich_docs(docs).to_pandas().set_index("doc_id")
    src = {r["doc_id"]: r["spans"] for r in _docs_table().to_pylist()}
    for doc_id, spans in src.items():
        got = [
            {k: s[k] for k in ("kind", "text", "media_ref", "offset")}
            for s in out.loc[doc_id, "spans"]
        ]
        assert got == spans


def test_wordpiece_backend_survives_stress_docs(ray_session):
    """Real-WordPiece NER over the stress corpus: unicode words fall to
    [UNK] spanning the whole word, offsets still slice the source, and
    long docs window identically to the default backend."""
    import ray.data

    from rust_bert_ray.stages.ner import NerStage
    from rust_bert_ray.tokenization import WordPieceTokenizer

    docs = ray.data.from_arrow(_docs_table())
    out = docs.map_batches(
        NerStage,
        fn_constructor_kwargs={
            "gazetteer": GAZETTEER,
            "tokenizer": WordPieceTokenizer(),
        },
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    by_id = dict(zip(out["doc_id"], out["entities"]))
    texts = {
        r["doc_id"]: (r["spans"][0]["text"] if len(r["spans"]) else "")
        for r in _docs_table().to_pylist()
    }
    for doc_id, n_expected in (("stress-long", 4), ("stress-unicode", 2)):
        ents = by_id[doc_id]
        assert len(ents) >= n_expected  # John Smith, Acme Corp, Amy, Paris
        for e in ents:
            assert texts[doc_id][e["begin"]:e["end"]] == e["word"]
    assert list(by_id["stress-empty-text"]) == []
    assert list(by_id["stress-no-spans"]) == []
