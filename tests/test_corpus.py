"""Corpus generator: determinism, schema, fixture docs."""

import pyarrow as pa

from rust_bert_ray.corpus import DOCS_SCHEMA, TRIPLES_SCHEMA, generate


def test_deterministic_across_calls():
    d1, t1 = generate(50, seed=13)
    d2, t2 = generate(50, seed=13)
    assert d1.equals(d2)
    assert t1.equals(t2)


def test_seed_changes_output():
    d1, _ = generate(50, seed=13)
    d2, _ = generate(50, seed=14)
    assert not d1.equals(d2)


def test_schema_matches_input_hint():
    d, t = generate(10)
    assert d.schema.equals(DOCS_SCHEMA)
    assert t.schema.equals(TRIPLES_SCHEMA)
    span_type = d.schema.field("spans").type
    assert pa.types.is_list(span_type)
    names = [span_type.value_type.field(i).name for i in range(4)]
    assert names == ["kind", "text", "media_ref", "offset"]


def test_fixture_docs_first():
    d, t = generate(10)
    rows = d.slice(0, 2).to_pylist()
    assert rows[0]["spans"][0]["text"] == "My name is Amy. I live in Paris."
    assert rows[1]["spans"][0]["text"] == "Paris is a city in France."
    trip = t.to_pylist()
    assert {"doc_id": "doc-00000000", "subj": "Amy", "pred": "lives_in",
            "obj": "Paris"} in trip


def test_offsets_are_ordinal():
    d, _ = generate(40)
    for row in d.to_pylist():
        assert [s["offset"] for s in row["spans"]] == list(range(len(row["spans"])))


def test_media_spans_have_ref_and_no_text():
    d, _ = generate(60)
    saw_media = False
    for row in d.to_pylist():
        for s in row["spans"]:
            if s["kind"] != "text":
                saw_media = True
                assert s["media_ref"].startswith("media://")
                assert s["text"] == ""
            else:
                assert s["media_ref"] == ""
    assert saw_media
