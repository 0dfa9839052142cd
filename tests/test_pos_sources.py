"""POS stage, resource providers, SQuAD reader."""

import json
import os

import pyarrow as pa
import pytest

from rust_bert_ray.sources.resources import (
    BufferResource,
    CachedResource,
    LocalResource,
)
from rust_bert_ray.sources.squad import squad_to_table
from rust_bert_ray.stages.pos import PosStage, is_punctuation


def doc_batch(texts):
    return pa.Table.from_pydict(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )


# ------------------------------------------------------------------- POS

def test_pos_basic_tags():
    out = PosStage()(doc_batch(["the running dog in a box"])).to_pylist()
    by_word = {r["word"]: r["label"] for r in out}
    assert by_word["the"] == "DET"
    assert by_word["running"] == "VERB"
    assert by_word["in"] == "ADP"
    assert by_word["dog"] == "NOUN"


def test_pos_punctuation_override():
    # all-punctuation token with low score → label "." score 1.0
    # (pos_tagging.rs:271-293)
    out = PosStage()(doc_batch(["hello , world !"])).to_pylist()
    punct = [r for r in out if r["word"] in {",", "!"}]
    assert punct and all(r["label"] == "." and r["score"] == 1.0 for r in punct)


def test_pos_char_spans_slice_back():
    text = "numbers 42 here ."
    out = PosStage()(doc_batch([text])).to_pylist()
    for r in out:
        assert text[r["begin"] : r["end"]] == r["word"]
    assert {r["word"]: r["label"] for r in out}["42"] == "NUM"


def test_is_punctuation():
    assert is_punctuation("!?.")
    assert not is_punctuation("a.")
    assert not is_punctuation("")


# -------------------------------------------------------------- resources

def test_local_resource(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_bytes(b"hello")
    r = LocalResource(str(p))
    assert r.get_local_path() == str(p)
    assert r.get_bytes() == b"hello"
    with pytest.raises(FileNotFoundError):
        LocalResource(str(tmp_path / "missing")).get_local_path()


def test_buffer_resource_materializes_once(tmp_path, monkeypatch):
    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path))
    r = BufferResource(b"weights", name="w.bin")
    p1 = r.get_local_path()
    p2 = r.get_local_path()
    assert p1 == p2 and open(p1, "rb").read() == b"weights"
    assert str(tmp_path) in p1


def test_cached_resource_fetches_once(tmp_path, monkeypatch):
    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path))
    calls = []

    def fetch(target):
        calls.append(target)
        with open(target, "w") as f:
            f.write("model")

    r = CachedResource("model.bin", "my-model", fetch)
    p1 = r.get_local_path()
    p2 = r.get_local_path()
    assert p1 == p2 and len(calls) == 1
    assert r.get_bytes() == b"model"


# ------------------------------------------------------------------ SQuAD

def test_squad_reader(tmp_path):
    payload = {
        "data": [
            {
                "paragraphs": [
                    {
                        "context": "Amy lives in Amsterdam",
                        "qas": [
                            {"id": "q1", "question": "Where does Amy live ?"},
                            {"id": "q2", "question": "Who lives there ?"},
                        ],
                    }
                ]
            }
        ]
    }
    p = tmp_path / "squad.json"
    p.write_text(json.dumps(payload))
    t = squad_to_table(str(p))
    assert t.num_rows == 2
    assert t.column("context").to_pylist() == ["Amy lives in Amsterdam"] * 2
    assert t.column("qa_id").to_pylist() == ["q1", "q2"]


def test_squad_reader_composes_with_qa_stage(tmp_path):
    from rust_bert_ray.stages.qa import QaStage

    payload = {
        "data": [
            {
                "paragraphs": [
                    {
                        "context": "Amy lives in Amsterdam",
                        "qas": [{"id": "q1", "question": "Where does Amy live ?"}],
                    }
                ]
            }
        ]
    }
    p = tmp_path / "squad.json"
    p.write_text(json.dumps(payload))
    out = QaStage({"Amy": "PER", "Amsterdam": "LOC"})(squad_to_table(str(p))).to_pylist()
    # FIXTURES.md §3.4: answer "Amsterdam", char span [13, 22)
    assert out[0]["answer"] == "Amsterdam"
    assert (out[0]["start"], out[0]["end"]) == (13, 22)


def test_sst2_reader(tmp_path, ray_session):
    from rust_bert_ray.sources.sst2 import read_sst2

    p = tmp_path / "train.tsv"
    p.write_text("sentence\tlabel\nthis is fast\t1\nso very slow\t0\n")
    ds = read_sst2(str(p))
    rows = ds.to_pandas()
    assert list(rows.columns) == ["sentence", "label"]
    assert sorted(rows["sentence"].tolist()) == ["so very slow", "this is fast"]


def test_sst2_reader_composes_with_sentiment(tmp_path, ray_session):
    import pyarrow as pa

    from rust_bert_ray.sources.sst2 import read_sst2
    from rust_bert_ray.stages.classify import SentimentStage

    p = tmp_path / "dev.tsv"
    p.write_text("sentence\tlabel\nfast fast small\t1\nslow big big\t0\n")

    def adapt(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": list(range(t.num_rows)), "text": t.column("sentence")}
        )

    out = (
        read_sst2(str(p), include_labels=False)
        .map_batches(adapt, batch_format="pyarrow")
        .map_batches(SentimentStage, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert sorted(out["label"].tolist()) == ["negative", "positive"]


def test_sst2_reader_rejects_wrong_schema(tmp_path, ray_session):
    import pytest as _pytest

    from rust_bert_ray.sources.sst2 import read_sst2

    p = tmp_path / "bad.tsv"
    p.write_text("a\tb\n1\t2\n")
    with _pytest.raises(ValueError, match="sentence"):
        read_sst2(str(p))


def test_sst2_reader_tolerates_quotes(tmp_path, ray_session):
    """Real SST-2 sentences carry unbalanced double quotes; the reader
    must parse raw TSV without quote handling."""
    from rust_bert_ray.sources.sst2 import read_sst2

    p = tmp_path / "q.tsv"
    p.write_text('sentence\tlabel\nhe said " go fast\t1\nplain row\t0\n')
    rows = read_sst2(str(p)).to_pandas()
    assert sorted(rows["sentence"].tolist()) == ['he said " go fast', "plain row"]


# ---------------------------------------------------- RemoteResource

def _file_url(p):
    return "file://" + str(p)


def test_remote_resource_cache_hit_and_miss(tmp_path, monkeypatch):
    import hashlib

    from rust_bert_ray.sources.resources import RemoteResource

    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "weights.bin"
    src.write_bytes(b"model-bytes-v1")
    sha = hashlib.sha256(b"model-bytes-v1").hexdigest()
    res = RemoteResource(_file_url(src), cache_subdir="m1", sha256=sha)
    p1 = res.get_local_path()
    assert open(p1, "rb").read() == b"model-bytes-v1"
    # cache hit: deleting the source must not matter
    src.unlink()
    assert res.get_local_path() == p1
    assert res.get_bytes() == b"model-bytes-v1"


def test_remote_resource_corrupted_cache_refetches(tmp_path, monkeypatch):
    import hashlib

    from rust_bert_ray.sources.resources import RemoteResource

    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "w.bin"
    src.write_bytes(b"good-content")
    sha = hashlib.sha256(b"good-content").hexdigest()
    res = RemoteResource(_file_url(src), cache_subdir="m2", sha256=sha)
    p = res.get_local_path()
    # corrupt the cached artifact (simulates a partial download that
    # landed before checksums, or disk corruption) → next call re-fetches
    open(p, "wb").write(b"corrupted")
    assert open(res.get_local_path(), "rb").read() == b"good-content"


def test_remote_resource_retries_then_fails(tmp_path, monkeypatch):
    from rust_bert_ray.sources.resources import RemoteResource

    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path / "cache"))
    calls = {"n": 0}

    def flaky_opener(url, timeout):
        calls["n"] += 1
        raise ConnectionError("boom")

    res = RemoteResource(
        "http://example.invalid/model.bin", cache_subdir="m3",
        max_retries=2, opener=flaky_opener,
    )
    with pytest.raises(IOError, match="failed to fetch"):
        res.get_local_path()
    assert calls["n"] == 3  # initial + 2 retries
    # no partial file left behind
    import glob
    assert not glob.glob(str(tmp_path / "cache" / "m3" / "*"))


def test_remote_resource_checksum_mismatch_rejected(tmp_path, monkeypatch):
    from rust_bert_ray.sources.resources import RemoteResource

    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "x.bin"
    src.write_bytes(b"whatever")
    res = RemoteResource(_file_url(src), cache_subdir="m4", sha256="0" * 64,
                         max_retries=0)
    with pytest.raises(IOError, match="checksum mismatch"):
        res.get_local_path()


def test_remote_resource_from_pretrained_layout(tmp_path, monkeypatch):
    from rust_bert_ray.sources.resources import RemoteResource

    monkeypatch.setenv("RUSTBERT_RAY_CACHE", str(tmp_path / "cache"))
    src = tmp_path / "rust_model.ot"
    src.write_bytes(b"w")
    res = RemoteResource.from_pretrained(("distilbert-sst2", _file_url(src)))
    p = res.get_local_path()
    assert p.endswith("distilbert-sst2/rust_model.ot")
