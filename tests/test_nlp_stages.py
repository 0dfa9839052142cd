"""Unit tests for the NLP pipeline stages (classify, QA, keywords, MLM).

These drive the stage callables directly on Arrow tables (no Ray session
needed) — the Ray plumbing is covered by the query-surface checks.
"""

import numpy as np
import pyarrow as pa
import pytest

from rust_bert_ray.stages.classify import SentimentStage, ZeroShotStage
from rust_bert_ray.stages.keywords import KeywordStage, ngram_candidates
from rust_bert_ray.stages.masked_lm import MASK_TOKEN, MaskedLmStage, mask_nth_token
from rust_bert_ray.stages.qa import QaStage


def doc_batch(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.Table.from_pydict({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


# ------------------------------------------------------------- sentiment

def test_sentiment_counts_and_label():
    out = SentimentStage()(doc_batch(["fast fast slow", "slow big big", "table row"]))
    rows = out.to_pylist()
    assert rows[0]["pos_cnt"] == 2 and rows[0]["neg_cnt"] == 1
    assert rows[0]["label"] == "positive"
    assert rows[1]["label"] == "negative"
    # tie → argmax first index → negative (id 0), like the reference argmax
    assert rows[2]["label"] == "negative"


def test_sentiment_score_is_softmax_of_counts():
    out = SentimentStage()(doc_batch(["fast slow slow"]))
    r = out.to_pylist()[0]
    e = np.exp([2, 1])
    assert r["score"] == pytest.approx(round(e[0] / e.sum(), 5))


# -------------------------------------------------------------- zero-shot

def test_zero_shot_argmax_and_tiebreak():
    out = ZeroShotStage()(
        doc_batch(["join filter sort", "table row column stream", "stream window"])
    )
    rows = out.to_pylist()
    assert rows[0]["label_pred"] == "querying"
    assert rows[1]["label_pred"] == "storage"
    assert rows[2]["label_pred"] == "streaming"
    # all-zero counts tie → first label in order wins
    out2 = ZeroShotStage()(doc_batch(["nothing relevant here"]))
    assert out2.to_pylist()[0]["label_pred"] == "querying"


# -------------------------------------------------------------------- QA

GAZ = {"Amy": "PER", "Paris": "LOC", "New York": "LOC", "Acme Corp": "ORG"}


def qa_batch(rows):
    return pa.Table.from_pydict(
        {
            "qa_id": [r[0] for r in rows],
            "question": [r[1] for r in rows],
            "context": [r[2] for r in rows],
        }
    )


def test_qa_reference_fixture_span():
    # FIXTURES.md §3.4 semantics: char offsets into the context
    stage = QaStage(GAZ)
    out = stage(qa_batch([("q0", "Where does Amy live ?", "Amy lives in Paris")])).to_pylist()
    assert out[0]["answer"] == "Paris"
    assert (out[0]["start"], out[0]["end"]) == (13, 18)
    assert out[0]["answer"] == "Amy lives in Paris"[13:18]


def test_qa_multiword_answer():
    stage = QaStage(GAZ)
    out = stage(
        qa_batch([("q0", "Where does Amy live ?", "Amy lives in New York now")])
    ).to_pylist()
    assert out[0]["answer"] == "New York"


def test_qa_question_kind_routing():
    stage = QaStage(GAZ)
    out = stage(
        qa_batch(
            [
                ("q0", "Who works there ?", "Amy works for Acme Corp in Paris"),
                ("q1", "What company is it ?", "Amy works for Acme Corp in Paris"),
            ]
        )
    ).to_pylist()
    assert out[0]["answer"] == "Amy"
    assert out[1]["answer"] == "Acme Corp"


def test_qa_no_matching_entity_gives_low_score():
    stage = QaStage(GAZ)
    out = stage(qa_batch([("q0", "Where is it ?", "no entities at all here")])).to_pylist()
    # uniform logits → uniform softmax; still emits a (low-score) span
    assert out[0]["score"] < 0.5


# ---------------------------------------------------------------- keywords

def test_ngram_candidates_stopwords_and_offsets():
    cands = ngram_candidates("The fast table and the fast join", (1, 2))
    assert "the" not in cands  # stopword
    assert "fast" in cands and len(cands["fast"]) == 2  # dedup collects offsets
    assert "fast table" in cands  # bigram
    assert "table and" not in cands  # gram containing stopword dropped
    text = "The fast table and the fast join"
    b, e = cands["fast"][0]
    assert text[b:e].lower() == "fast"


def test_keyword_stage_cosine_topk():
    out = KeywordStage(num_keywords=2)(doc_batch(["table table table join sort"]))
    rows = out.to_pylist()
    assert len(rows) == 2
    assert rows[0]["keyword"] == "table"  # dominant term wins cosine
    assert rows[0]["score"] >= rows[1]["score"]
    assert all(len(o) == 2 for o in rows[0]["offsets"])


def test_keyword_stage_mmr_diversifies():
    out = KeywordStage(scorer_type="mmr", num_keywords=2, diversity=0.9)(
        doc_batch(["table table join"])
    )
    kws = [r["keyword"] for r in out.to_pylist()]
    assert kws[0] == "table" and kws[1] == "join"


# ------------------------------------------------------------------- MLM

def test_mask_nth_token():
    out = mask_nth_token(doc_batch(["a b c d e"]), n=2)
    assert out.to_pylist()[0]["text"] == f"a b {MASK_TOKEN} d e"


def test_masked_lm_raw_logit_scores():
    # score is the RAW count (reference returns raw logits, tests/bert.rs:135)
    out = MaskedLmStage(top_k=2)(
        doc_batch([f"x x x y {MASK_TOKEN} z"])
    ).to_pylist()
    assert out[0]["token"] == "x" and out[0]["score"] == 3.0
    assert out[1]["token"] == "y"  # count 1, alphabetical before z


def test_masked_lm_multiple_masks():
    out = MaskedLmStage(top_k=1)(
        doc_batch([f"{MASK_TOKEN} a a {MASK_TOKEN}"])
    ).to_pylist()
    assert len(out) == 2
    assert {r["mask_index"] for r in out} == {0, 1}
    assert all(r["token"] == "a" for r in out)


def test_ner_stage_accepts_alternate_scorer():
    """NerStage is scorer-agnostic: swap the gazetteer backend for the
    capitalization-heuristic backend and decode still works end to end."""
    import pyarrow as pa

    from rust_bert_ray.corpus import DOCS_SCHEMA
    from rust_bert_ray.scorers import HeuristicTagScorer
    from rust_bert_ray.stages.ner import NerStage

    docs = pa.Table.from_pylist(
        [
            {
                "doc_id": "h-0",
                "spans": [
                    {
                        "kind": "text",
                        "text": "We asked John Smith about Acme Corp today .",
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
            }
        ],
        schema=DOCS_SCHEMA,
    )
    stage = NerStage(gazetteer={}, scorer=HeuristicTagScorer())
    ents = stage(docs).column("entities").to_pylist()[0]
    found = {(e["word"], e["label"]) for e in ents}
    assert ("John Smith", "PER") in found
    assert ("Acme Corp", "ORG") in found


def test_qa_inputs_empty_batch_keeps_string_schema():
    """Batches with no QA spans must emit string columns, not null-typed
    ones (block schema unification)."""
    import pyarrow as pa

    from rust_bert_ray.stages.qa import qa_inputs_from_docs
    from rust_bert_ray.corpus import SPAN_TYPE

    batch = pa.Table.from_pydict(
        {
            "doc_id": ["d0"],
            "spans": pa.array(
                [[{"kind": "image", "text": "", "media_ref": "m://x", "offset": 0}]],
                type=SPAN_TYPE,
            ),
        }
    )
    out = qa_inputs_from_docs(batch)
    assert out.num_rows == 0
    assert all(t == pa.string() for t in out.schema.types)
