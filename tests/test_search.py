"""BM25 postings-index search (functions/search.py)."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(ray_session):
    from rust_bert_ray.functions.search import ensure_bm25_index

    return ensure_bm25_index(SF)


def test_index_is_fingerprint_stable(index):
    from rust_bert_ray.functions.search import ensure_bm25_index

    base, meta = index
    st = os.stat(os.path.join(base, "meta.json"))
    base2, meta2 = ensure_bm25_index(SF)
    assert base2 == base and meta2 == meta
    # untouched: same inode mtime (no rebuild)
    assert os.stat(os.path.join(base, "meta.json")).st_mtime == st.st_mtime


def test_query_probes_only_term_buckets(index):
    from rust_bert_ray.functions.search import (
        N_BUCKETS,
        _probed_files,
        _term_bucket,
    )

    base, _ = index
    terms = ["customer", "join"]
    files = _probed_files(base, [_term_bucket(t) for t in terms])
    want = {f"bucket={_term_bucket(t)}" for t in terms}
    got = {os.path.basename(os.path.dirname(f)) for f in files}
    assert got <= want and len(got) <= len(terms) < N_BUCKETS


def test_bm25_topk_matches_single_process(index, ray_session):
    """Distributed result equals a fresh pandas/numpy BM25 on the same
    corpus (independent of the postings index)."""
    import math
    import re

    import pandas as pd
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.search import B, K1, bm25_search
    from rust_bert_ray.functions.util import round_ha

    query = "customer join dup scan"
    got = bm25_search(SF, query=query, k=10).to_pandas()

    tok = re.compile(r"[a-z0-9]+")
    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    rows = []
    lens = {}
    for doc_id, text in zip(
        docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()
    ):
        toks = tok.findall(text.lower())
        if toks:
            lens[doc_id] = len(toks)
            for t in set(toks):
                rows.append((doc_id, t, toks.count(t)))
    tf = pd.DataFrame(rows, columns=["doc_id", "term", "tf"])
    n = len(lens)
    avgdl = sum(lens.values()) / n
    terms = sorted(set(tok.findall(query.lower())))
    sub = tf[tf["term"].isin(terms)]
    df_map = sub.groupby("term")["doc_id"].size().to_dict()
    scores = {}
    for doc_id, term, tfv in sub.itertuples(index=False):
        idf = math.log((n - df_map[term] + 0.5) / (df_map[term] + 0.5) + 1.0)
        w = idf * tfv * (K1 + 1) / (tfv + K1 * (1 - B + B * lens[doc_id] / avgdl))
        scores[doc_id] = scores.get(doc_id, 0.0) + w
    exp = (
        pd.DataFrame(
            {"doc_id": list(scores), "score": round_ha(list(scores.values()), 6)}
        )
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    got = got.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hybrid_rrf_fusion(index, ray_session):
    """RRF combines both retrievers: every fused doc appears in at
    least one source list with the exact 1/(C+r) algebra."""
    from rust_bert_ray.functions.search import (
        HYBRID_POOL,
        RRF_C,
        bm25_search,
        hybrid_search,
    )
    from rust_bert_ray.pipelines.rag import RAG_QUERY, rag_search

    fused = hybrid_search(SF).to_pandas()
    assert len(fused) > 0
    dense = (
        rag_search(SF, query=RAG_QUERY, k=HYBRID_POOL)
        .to_pandas()
        .sort_values(["cos", "doc_id", "chunk_idx"], ascending=[False, True, True])
    )
    sparse = (
        bm25_search(SF, query=RAG_QUERY, k=HYBRID_POOL)
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
    )
    dense_rank = {}
    for d in dense["doc_id"]:
        if d not in dense_rank:
            dense_rank[d] = len(dense_rank) + 1
    sparse_rank = {d: i + 1 for i, d in enumerate(sparse["doc_id"])}
    for doc_id, rrf in zip(fused["doc_id"], fused["rrf"]):
        want = 0.0
        if doc_id in dense_rank:
            want += 1.0 / (RRF_C + dense_rank[doc_id])
        if doc_id in sparse_rank:
            want += 1.0 / (RRF_C + sparse_rank[doc_id])
        assert want > 0.0 and rrf == want
    # descending by score, ties by doc_id
    assert list(fused["rrf"]) == sorted(fused["rrf"], reverse=True)


def test_empty_and_unknown_queries_are_schema_stable(index, ray_session):
    from rust_bert_ray.functions.search import bm25_search

    for q in ["", "zzzqqqxx notinthecorpus"]:
        out = bm25_search(SF, query=q)
        # Ray's to_pandas drops columns on empty datasets; the schema is
        # the stable contract (same check as test_rag's empty path)
        assert out.schema().names == ["doc_id", "score"]
        assert out.count() == 0


def test_rerank_search(ray_session):
    """Rerank returns k rows ordered by the cross-encoder score, scores
    match a direct pair-scoring of the same candidates, and the
    candidate set is the widened dense pool."""
    import numpy as np

    from rust_bert_ray.functions.search import (
        RERANK_POOL,
        CrossEncoderStage,
        rerank_search,
    )
    from rust_bert_ray.pipelines.rag import RAG_QUERY, rag_search

    out = rerank_search(SF, k=5).to_pandas()
    assert list(out.columns) == ["doc_id", "chunk_idx", "ce_score"]
    assert len(out) == 5
    assert (out["ce_score"].to_numpy()[:-1] >= out["ce_score"].to_numpy()[1:]).all()

    # scores equal a direct joint-forward over the same candidate rows
    cand = rag_search(SF, k=RERANK_POOL).to_pandas()
    stage = CrossEncoderStage(RAG_QUERY)
    direct = {
        (int(d), int(c)): s
        for d, c, s in zip(
            cand["doc_id"],
            cand["chunk_idx"],
            stage.score_batch(cand["chunk_text"].tolist()),
        )
    }
    for d, c, s in zip(out["doc_id"], out["chunk_idx"], out["ce_score"]):
        assert direct[(int(d), int(c))] == s
    # reranked ids are a subset of the candidate pool
    assert set(zip(out["doc_id"], out["chunk_idx"])) <= set(direct)

    # the joint encoding is genuinely pair-dependent: a different query
    # produces different pair scores for the same passages
    other = CrossEncoderStage("completely different words entirely")
    texts = cand["chunk_text"].tolist()[:4]
    assert not np.allclose(stage.score_batch(texts), other.score_batch(texts))


def test_bm25_search_many_equals_per_query(index, ray_session):
    """The one-scan batched path returns, per query, EXACTLY the single-
    query bm25_search result (same scoring algebra, same top-k order)."""
    from rust_bert_ray.functions.search import (
        MANY_QUERIES,
        bm25_search,
        bm25_search_many,
    )

    got = bm25_search_many(SF, k=5).to_pandas()
    assert list(got.columns) == ["query_id", "doc_id", "score"]
    for qid, q in MANY_QUERIES.items():
        g = got[got["query_id"] == qid].reset_index(drop=True)
        want = bm25_search(SF, query=q, k=5).to_pandas()
        assert g["doc_id"].tolist() == want["doc_id"].tolist()
        assert g["score"].tolist() == want["score"].tolist()


def test_bm25_search_many_empty_queries_schema_stable(index, ray_session):
    from rust_bert_ray.functions.search import bm25_search_many

    out = bm25_search_many(SF, queries={0: "???", 1: ""}, k=5)
    assert out.schema().names == ["query_id", "doc_id", "score"]
    assert out.count() == 0


def test_rag_search_many_equals_per_query(index, ray_session):
    """One union-probed chunk-index scan returns, per query, bit-identical
    rows to the single-query rag_search (content-side SRP bucket
    recompute restricts each query to ITS probe set; same matvec cosine
    expression and total order)."""
    from rust_bert_ray.functions.search import MANY_QUERIES
    from rust_bert_ray.pipelines.rag import rag_search, rag_search_many

    got = rag_search_many(SF, k=5).to_pandas()
    assert list(got.columns) == [
        "query_id", "doc_id", "chunk_idx", "cos", "chunk_text",
    ]
    for qid, q in MANY_QUERIES.items():
        g = got[got["query_id"] == qid].reset_index(drop=True)
        want = rag_search(SF, query=q, k=5).to_pandas()
        assert g["doc_id"].tolist() == want["doc_id"].tolist()
        assert g["chunk_idx"].tolist() == want["chunk_idx"].tolist()
        assert g["cos"].tolist() == want["cos"].tolist()
        assert g["chunk_text"].tolist() == want["chunk_text"].tolist()


def test_hybrid_search_many_equals_per_query(index, ray_session):
    """Per-query fusion over the two batched retrievers equals the
    single-query hybrid_search on the same query text."""
    from rust_bert_ray.functions.search import (
        MANY_QUERIES,
        hybrid_search,
        hybrid_search_many,
    )

    got = hybrid_search_many(SF, k=5).to_pandas()
    assert list(got.columns) == ["query_id", "doc_id", "rrf"]
    for qid, q in MANY_QUERIES.items():
        g = got[got["query_id"] == qid].reset_index(drop=True)
        want = hybrid_search(SF, query=q, k=5).to_pandas()
        assert g["doc_id"].tolist() == want["doc_id"].tolist()
        assert g["rrf"].tolist() == want["rrf"].tolist()


def test_rerank_search_many_empty_queries_schema_stable(index, ray_session):
    from rust_bert_ray.functions.search import rerank_search_many

    out = rerank_search_many(SF, queries={}, k=5)
    assert out.schema().names == ["query_id", "doc_id", "chunk_idx", "ce_score"]
    assert out.count() == 0


def test_rerank_search_many_equals_per_query(index, ray_session):
    """Batched retrieve-then-rerank returns, per query, bit-identical
    rows to the single-query rerank_search: the multi-query stage scores
    each query's candidates through the SAME CrossEncoderStage kernel in
    query-partitioned sub-batches (row-independent embedder + per-row
    matvec dot ⇒ sub-batching can't change the floats)."""
    from rust_bert_ray.functions.search import (
        MANY_QUERIES,
        rerank_search,
        rerank_search_many,
    )

    got = rerank_search_many(SF, k=5).to_pandas()
    assert list(got.columns) == ["query_id", "doc_id", "chunk_idx", "ce_score"]
    for qid, q in MANY_QUERIES.items():
        g = got[got["query_id"] == qid].reset_index(drop=True)
        want = rerank_search(SF, query=q, k=5).to_pandas()
        assert g["doc_id"].tolist() == want["doc_id"].tolist()
        assert g["chunk_idx"].tolist() == want["chunk_idx"].tolist()
        assert g["ce_score"].tolist() == want["ce_score"].tolist()
