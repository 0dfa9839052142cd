"""BM25 full-text search over a persisted, term-partitioned postings index.

The lexical-retrieval counterpart of the ANN family (similarity.py) —
together they form the two retrieval modes a RAG / training-data
pipeline needs (reference analog: the sentence-embeddings pipeline
`src/pipelines/sentence_embeddings/` covers the dense mode; BM25 is
the classic sparse mode, Robertson & Zaragoza 2009).

Scale shape (the part that matters at 100 TB):

- **Index build is one streaming pass**: documents → per-doc term
  counts (tf) + doc length, written as hive-partitioned parquet with
  ``bucket = crc32(term) % B`` — every posting for a given term lands
  in exactly ONE bucket directory.  ``doclen`` is denormalized onto
  each posting row so query-time scoring needs NO join against a doc-
  length table.  A second tiny pass computes corpus stats (N, total
  length) as scalar partials — KB-scale exchange.
- **Queries read only the probed buckets** (the ANN index pruning
  pattern): a q-term query touches ≤ q of B partitions regardless of
  corpus size.  df comes from counting the term's postings inside
  those same partitions — exact, no extra global state.
- The per-doc score sum + global top-k use the streaming-prune `topk`
  (O(n) over pruned rows, no all-to-all sort).

Index layout: ``/tmp/rbr_bm25/<sf-tag>/postings-v{V}/data/bucket=K/``
plus ``meta.json`` (source fingerprint, n_docs, total_len) —
fingerprint-invalidated exactly like the ANN indexes.
"""

from __future__ import annotations

import json
import math
import os
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from rust_bert_ray.functions.util import round_ha, topk

INDEX_ROOT = "/tmp/rbr_bm25"
INDEX_VERSION = 1
N_BUCKETS = 32
K1 = 1.2
B = 0.75

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _read_documents(sf_dir: str, columns):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def _term_bucket(term: str) -> int:
    return zlib.crc32(term.encode()) % N_BUCKETS


class PostingsBuilder:
    """documents → one posting row per (doc, term): tf + denormalized
    doclen, bucketed by term hash.

    Vectorized (STATS.md microbench: 2.6× over the per-doc dict loop on
    sf0.1, identical output): Arrow lowercase + regex split + flatten,
    then dictionary-encode terms so per-(doc, term) tf is ONE
    ``np.unique`` over packed int keys and the crc bucket loop runs per
    DISTINCT term (vocab-sized), not per posting."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(t.column("text"))
        lists = pc.split_pattern_regex(texts, "[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        parent = parents.filter(mask).to_numpy()
        doclen_per_doc = np.bincount(parent, minlength=t.num_rows)
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        codes = d.indices.to_numpy()
        dict_vals = d.dictionary
        nterms = max(len(dict_vals), 1)
        keys = parent.astype(np.int64) * nterms + codes.astype(np.int64)
        uk, tf = np.unique(keys, return_counts=True)
        u_parent = (uk // nterms).astype(np.int64)
        u_code = (uk % nterms).astype(np.int64)
        vocab_buckets = np.array(
            [zlib.crc32(s.encode()) % N_BUCKETS for s in dict_vals.to_pylist()],
            dtype=np.int64,
        ) if len(dict_vals) else np.empty(0, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    t.column("doc_id").to_numpy(zero_copy_only=False)[u_parent],
                    type=pa.int64(),
                ),
                "term": pc.cast(dict_vals.take(pa.array(u_code)), pa.string()),
                "tf": pa.array(tf, type=pa.int64()),
                "doclen": pa.array(doclen_per_doc[u_parent], type=pa.int64()),
                "bucket": pa.array(vocab_buckets[u_code], type=pa.int64()),
            }
        )


def _source_fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"{st.st_size}-{int(st.st_mtime)}"


def ensure_bm25_index(sf_dir: str) -> tuple[str, dict]:
    """Build (once, idempotent, fingerprint-invalidated) the postings
    index.  Same tmp-dir + rename discipline as similarity._ensure_index
    so a lost concurrent-build race just uses the winner's index."""
    sf_tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}-"
        f"{zlib.crc32(os.path.abspath(sf_dir).encode()) & 0xFFFFFFFF:08x}"
    )
    base = os.path.join(INDEX_ROOT, sf_tag, f"postings-v{INDEX_VERSION}")
    meta_path = os.path.join(base, "meta.json")
    fp = _source_fingerprint(sf_dir)
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return base, meta
    tmp = base + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    # repartition bounds the file count: each map task × each bucket
    # value becomes a file (64 read blocks × 32 buckets ≈ 2k tiny
    # files otherwise — the incremental-dedup index lesson); postings
    # rows are compact, the move is cheap
    docs.map_batches(
        PostingsBuilder(), batch_format="pyarrow", batch_size=None
    ).repartition(4).write_parquet(
        os.path.join(tmp, "data"), partition_cols=["bucket"]
    )

    # corpus stats: scalar partials per batch, summed on the driver
    def stats_partial(t: pa.Table) -> pa.Table:
        lens = [
            len(_TOKEN_RE.findall(x.lower()))
            for x in t.column("text").to_pylist()
        ]
        with_toks = [n for n in lens if n > 0]
        return pa.Table.from_pydict(
            {
                "n_docs": pa.array([len(with_toks)], type=pa.int64()),
                "total_len": pa.array([sum(with_toks)], type=pa.int64()),
            }
        )

    stats = (
        _read_documents(sf_dir, ["text"])
        .map_batches(stats_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    meta = {
        "fingerprint": fp,
        "n_docs": int(stats["n_docs"].sum()),
        "total_len": int(stats["total_len"].sum()),
    }
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    try:
        if os.path.exists(base):
            import shutil

            shutil.rmtree(base)
        os.replace(tmp, base)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return base, meta


def _probed_files(base: str, buckets) -> list[str]:
    import glob

    files = []
    for b in sorted(set(int(x) for x in buckets)):
        d = os.path.join(base, "data", f"bucket={b}")
        if os.path.isdir(d):
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files


def _empty_hits():
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    )


def _exact_idf(postings, term_set: set, n_docs: int) -> dict:
    """Pass 1 shared by :func:`bm25_search` and :func:`bm25_search_many`:
    exact per-term document frequency over the probed postings (tiny
    result to the driver) → BM25 idf per term.  Empty dict when no query
    term appears in the index — keeping this in ONE place guarantees the
    batched path's idf is computed identically to the single-query path
    it promises to match."""

    def df_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["term"].isin(term_set)]
        g = df.groupby("term", as_index=False).agg(pdf=("doc_id", "size"))
        return pa.Table.from_pydict(
            {
                "term": pa.array(g["term"], type=pa.string()),
                "pdf": pa.array(g["pdf"], type=pa.int64()),
            }
        )

    df_rows = postings.map_batches(
        df_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if df_rows.empty:
        return {}
    dfs = df_rows.groupby("term")["pdf"].sum().to_dict()
    return {
        t: math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in dfs.items()
    }


DEFAULT_QUERY = "customer join dup scan"


def bm25_search(sf_dir: str, query: str = DEFAULT_QUERY, k: int = 10):
    """Top-k documents by BM25(k1=1.2, b=0.75) for ``query``.

    Two pruned passes over only the query terms' bucket partitions:
    (1) exact per-term df (postings rows per term — (term, doc) rows
    are unique by construction), collected as a ≤|q|-row broadcast;
    (2) per-posting score contributions → per-doc groupby sum →
    streaming top-k by (score desc, doc_id).  idf uses the
    Robertson-Sparck-Jones '+1' form: ln((N - df + 0.5)/(df + 0.5) + 1).
    """
    terms = sorted(set(_TOKEN_RE.findall(query.lower())))
    if not terms:
        return _empty_hits()
    base, meta = ensure_bm25_index(sf_dir)
    n_docs = meta["n_docs"]
    avgdl = meta["total_len"] / n_docs if n_docs else 1.0
    files = _probed_files(base, [_term_bucket(t) for t in terms])
    if not files:
        return _empty_hits()
    term_set = set(terms)

    postings = ray.data.read_parquet(files, columns=["doc_id", "term", "tf", "doclen"])

    # pass 1: exact df per query term (tiny result → driver → broadcast)
    idf = _exact_idf(postings, term_set, n_docs)
    if not idf:
        return _empty_hits()
    idf_ref = ray.put(idf)

    class ScorePartial:
        def __init__(self, ref):
            self.idf = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["term"].isin(self.idf)]
            if df.empty:
                return pa.Table.from_pydict(
                    {
                        "doc_id": pa.array([], type=pa.int64()),
                        "p_score": pa.array([], type=pa.float64()),
                    }
                )
            tf = df["tf"].to_numpy(dtype=np.float64)
            dl = df["doclen"].to_numpy(dtype=np.float64)
            w = df["term"].map(self.idf).to_numpy(dtype=np.float64) * (
                tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
            )
            g = (
                pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "p_score": w})
                .groupby("doc_id", as_index=False)["p_score"]
                .sum()
            )
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(g["doc_id"], type=pa.int64()),
                    "p_score": pa.array(g["p_score"], type=pa.float64()),
                }
            )

    from ray.data.aggregate import Sum

    scored = (
        postings.map_batches(
            ScorePartial(idf_ref), batch_format="pyarrow", batch_size=None
        )
        .groupby("doc_id", num_partitions=8)
        .aggregate(Sum("p_score", alias_name="raw_score"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "score": pa.array(
                    round_ha(t.column("raw_score").to_numpy(), 6),
                    type=pa.float64(),
                ),
            }
        )

    return topk(
        scored.map_batches(finalize, batch_format="pyarrow"),
        ["score", "doc_id"],
        [True, False],
        k,
    )


def bm25_scan_fraction(sf_dir: str, query: str = DEFAULT_QUERY) -> dict:
    """Probed-partition row fraction for the default query (pruning
    evidence, mirrors similarity.ann_scan_report)."""
    import pyarrow.dataset as pads

    terms = sorted(set(_TOKEN_RE.findall(query.lower())))
    base, _meta = ensure_bm25_index(sf_dir)
    probed = _probed_files(base, [_term_bucket(t) for t in terms])
    total = pads.dataset(os.path.join(base, "data")).count_rows()
    rows = sum(pads.dataset(f).count_rows() for f in probed) if probed else 0
    return {"probed_rows": rows, "total_rows": total,
            "fraction": rows / total if total else 0.0}


BM25_SEARCH_SQL_TEMPLATE = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n, AVG(len) AS avgdl FROM dl),
qterms AS (SELECT unnest([{terms}]) AS term),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         SUM(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1)
           * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * dl.len / stats.avgdl))
         ) AS score
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 6) AS score
FROM scores
ORDER BY score DESC, doc_id
LIMIT {k}
"""


def bm25_search_sql(query: str = DEFAULT_QUERY, k: int = 10) -> str:
    terms = sorted(set(_TOKEN_RE.findall(query.lower())))
    quoted = ", ".join("'" + t + "'" for t in terms)
    return BM25_SEARCH_SQL_TEMPLATE.format(terms=quoted, k1=K1, b=B, k=k)


MANY_QUERIES = {
    0: DEFAULT_QUERY,
    1: "window merge batch order",
    2: "stream filter slow query",
    3: "table column value agg",
}


def bm25_search_many(sf_dir: str, queries: dict[int, str] | None = None, k: int = 10):
    """Batched multi-query BM25: ONE pruned pass over the postings index
    scores a whole query TABLE — n queries share the index read instead
    of n per-call scans (the serving amortization, mirror of
    ``ann_pq_topk_many``).

    Probed buckets are the UNION of all queries' term buckets; df/idf is
    computed once per distinct term (query-independent).  The score pass
    computes each posting row's BM25 contribution ONCE, then fans it out
    to the queries containing the term via a broadcast (term → query_id)
    table — per-batch partial sums keyed by a packed
    ``query_id·2^42 + doc_id`` int64 keep the exchange to one small
    groupby; :func:`grouped_topk` finishes with ≤ |queries|×k rows.
    Per-query scoring algebra is IDENTICAL to :func:`bm25_search`.
    Output: (query_id, doc_id, score)."""
    from rust_bert_ray.functions.util import grouped_topk

    qs = MANY_QUERIES if queries is None else queries
    # the packed qd_key (query_id·2^42 + doc_id) silently corrupts
    # attribution outside these ranges — fail fast on the contract
    for qid in qs:
        if not 0 <= int(qid) < (1 << 21):
            raise ValueError(
                f"query_id {qid} outside the packable range [0, 2^21)"
            )
    qterms = {
        int(qid): sorted(set(_TOKEN_RE.findall(q.lower())))
        for qid, q in qs.items()
    }
    all_terms = sorted(set().union(*qterms.values()) if qterms else set())
    empty = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    )
    if not all_terms:
        return empty
    base, meta = ensure_bm25_index(sf_dir)
    n_docs = meta["n_docs"]
    avgdl = meta["total_len"] / n_docs if n_docs else 1.0
    files = _probed_files(base, [_term_bucket(t) for t in all_terms])
    if not files:
        return empty
    term_set = set(all_terms)

    postings = ray.data.read_parquet(files, columns=["doc_id", "term", "tf", "doclen"])

    # pass 1: exact df per distinct term across ALL queries (tiny)
    idf = _exact_idf(postings, term_set, n_docs)
    if not idf:
        return empty
    # broadcast: idf + the (term, query_id) fan-out table
    expand = pd.DataFrame(
        [(t, qid) for qid, ts in sorted(qterms.items()) for t in ts if t in idf],
        columns=["term", "query_id"],
    )
    bcast = ray.put((idf, expand))

    class ScoreManyPartial:
        def __init__(self, ref):
            self.idf, self.expand = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["term"].isin(self.idf)]
            out_empty = pa.Table.from_pydict(
                {
                    "qd_key": pa.array([], type=pa.int64()),
                    "p_score": pa.array([], type=pa.float64()),
                }
            )
            if df.empty:
                return out_empty
            tf = df["tf"].to_numpy(dtype=np.float64)
            dl = df["doclen"].to_numpy(dtype=np.float64)
            # per-row contribution, computed ONCE (query-independent)
            df = df.assign(
                w=df["term"].map(self.idf).to_numpy(dtype=np.float64)
                * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl)))
            )
            j = df.merge(self.expand, on="term")
            if j.empty:
                return out_empty
            doc_np = j["doc_id"].to_numpy(dtype=np.int64)
            if int(doc_np.max()) >= (1 << 42) or int(doc_np.min()) < 0:
                raise ValueError(
                    "doc_id outside the packable range [0, 2^42)"
                )
            g = (
                pd.DataFrame(
                    {
                        "qd_key": j["query_id"].to_numpy(dtype=np.int64)
                        * (1 << 42)
                        + doc_np,
                        "p_score": j["w"].to_numpy(),
                    }
                )
                .groupby("qd_key", as_index=False)["p_score"]
                .sum()
            )
            return pa.Table.from_pydict(
                {
                    "qd_key": pa.array(g["qd_key"], type=pa.int64()),
                    "p_score": pa.array(g["p_score"], type=pa.float64()),
                }
            )

    from ray.data.aggregate import Sum

    scored = (
        postings.map_batches(
            ScoreManyPartial(bcast), batch_format="pyarrow", batch_size=None
        )
        .groupby("qd_key", num_partitions=8)
        .aggregate(Sum("p_score", alias_name="raw_score"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        key = t.column("qd_key").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(key >> 42, type=pa.int64()),
                "doc_id": pa.array(key & ((1 << 42) - 1), type=pa.int64()),
                "score": pa.array(
                    round_ha(t.column("raw_score").to_numpy(), 6),
                    type=pa.float64(),
                ),
            }
        )

    return grouped_topk(
        scored.map_batches(finalize, batch_format="pyarrow"),
        "query_id",
        ["score", "doc_id"],
        [True, False],
        k,
    )


def bm25_search_many_sql(queries: dict[int, str] | None = None, k: int = 10) -> str:
    """Oracle: the single-query BM25 CTE per query, tagged and unioned —
    each branch is the independently-derived native-SQL scorer."""
    qs = MANY_QUERIES if queries is None else queries
    parts = [
        f"SELECT CAST({int(qid)} AS BIGINT) AS query_id, doc_id, score "
        f"FROM ({bm25_search_sql(q, k)})"
        for qid, q in sorted(qs.items())
    ]
    return " UNION ALL ".join(parts)


RRF_C = 60
HYBRID_POOL = 10


def hybrid_search(sf_dir: str, query: str | None = None, k: int = 10):
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    of the sparse (BM25 postings) and dense (RAG chunk-embedding)
    retrievers over the SAME query text.

    Scale shape: ALL heavy work happens inside the two partition-pruned
    searches (each reads only its probed index buckets); fusion itself
    sees two ≤``HYBRID_POOL``-row ranked lists, so the driver-side merge
    is O(k) regardless of corpus size — the canonical two-tower serving
    topology.  Doc-level dense rank is the rank of the doc's BEST chunk
    under rag_search's total order (cos desc, doc_id, chunk_idx);
    sparse rank follows bm25_search's (score desc, doc_id).  RRF score
    = Σ 1/(C + rank) over the lists containing the doc (≤2 terms —
    two-term float addition is order-exact, so SQL SUM parity is
    bit-safe)."""
    from rust_bert_ray.pipelines.rag import RAG_QUERY, rag_search

    q = RAG_QUERY if query is None else query
    dense = (
        rag_search(sf_dir, query=q, k=HYBRID_POOL)
        .to_pandas()
        .sort_values(["cos", "doc_id", "chunk_idx"], ascending=[False, True, True])
    )
    sparse = (
        bm25_search(sf_dir, query=q, k=HYBRID_POOL)
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
    )
    fused = _rrf_fuse(dense["doc_id"].tolist(), sparse["doc_id"].tolist(), k)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([d for d, _ in fused], type=pa.int64()),
            "rrf": pa.array([s for _, s in fused], type=pa.float64()),
        }
    )


def _rrf_fuse(
    dense_doc_ids: list[int], sparse_doc_ids: list[int], k: int
) -> list[tuple[int, float]]:
    """The shared RRF algebra (both hybrid paths MUST go through this —
    the batched/single-query equality tests assert they agree): dense
    rank is the doc's FIRST appearance in the chunk-sorted list, sparse
    rank is positional; score = Σ 1/(C + rank), ties break by doc_id."""
    rrf: dict[int, float] = {}
    seen: set[int] = set()
    r = 0
    for doc_id in dense_doc_ids:
        if doc_id in seen:
            continue
        seen.add(doc_id)
        r += 1
        rrf[doc_id] = rrf.get(doc_id, 0.0) + 1.0 / (RRF_C + r)
    for r, doc_id in enumerate(sparse_doc_ids, start=1):
        rrf[doc_id] = rrf.get(doc_id, 0.0) + 1.0 / (RRF_C + r)
    return sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


HYBRID_SEARCH_SQL_TEMPLATE = """
WITH bm25 AS ({bm25_sql}),
sparse_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r FROM bm25
),
dense_chunks AS (SELECT * FROM read_parquet('{dense_parquet}'){dense_where}),
dense_best AS (
  SELECT doc_id, MIN(cr) AS mr FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id, chunk_idx) AS cr
    FROM dense_chunks
  ) GROUP BY doc_id
),
dense_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY mr) AS r FROM dense_best
),
fused AS (
  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         COALESCE(1.0 / ({c} + s.r), 0) + COALESCE(1.0 / ({c} + d.r), 0) AS rrf
  FROM sparse_rank s
  FULL OUTER JOIN dense_rank d ON s.doc_id = d.doc_id
)
SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT {k}
"""


def hybrid_search_sql(dense_parquet: str, k: int = 10) -> str:
    """Oracle: native BM25 CTE + the independently-verified expected
    dense table, fused with the same RRF algebra."""
    from rust_bert_ray.pipelines.rag import RAG_QUERY

    return HYBRID_SEARCH_SQL_TEMPLATE.format(
        bm25_sql=bm25_search_sql(RAG_QUERY, k=HYBRID_POOL).strip(),
        dense_parquet=dense_parquet,
        dense_where="",
        c=RRF_C,
        k=k,
    )


def hybrid_search_many(sf_dir: str, queries: dict[int, str] | None = None, k: int = 10):
    """Batched hybrid retrieval: the RRF fusion of :func:`hybrid_search`
    applied per query over the two BATCHED retrievers — one pruned
    postings scan (``bm25_search_many``) and one pruned chunk-index scan
    (``rag_search_many``) serve the whole query table, then the
    driver-side merge fuses two ≤``HYBRID_POOL``-row lists per query
    (O(nq·k) regardless of corpus size).  Per-query results equal
    :func:`hybrid_search` on the same query text (tested).
    Output: (query_id, doc_id, rrf)."""
    from rust_bert_ray.pipelines.rag import rag_search_many

    qs = MANY_QUERIES if queries is None else queries
    dense_all = rag_search_many(sf_dir, qs, k=HYBRID_POOL).to_pandas()
    sparse_all = bm25_search_many(sf_dir, qs, k=HYBRID_POOL).to_pandas()
    out_q, out_d, out_r = [], [], []
    for qid in sorted(int(q) for q in qs):
        dense = dense_all[dense_all["query_id"] == qid].sort_values(
            ["cos", "doc_id", "chunk_idx"], ascending=[False, True, True]
        )
        sparse = sparse_all[sparse_all["query_id"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        fused = _rrf_fuse(dense["doc_id"].tolist(), sparse["doc_id"].tolist(), k)
        out_q.extend(qid for _ in fused)
        out_d.extend(d for d, _ in fused)
        out_r.extend(sc for _, sc in fused)
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(np.asarray(out_q, dtype=np.int64), type=pa.int64()),
            "doc_id": pa.array(np.asarray(out_d, dtype=np.int64), type=pa.int64()),
            "rrf": pa.array(np.asarray(out_r, dtype=np.float64), type=pa.float64()),
        }
    )


def hybrid_search_many_sql(
    dense_many_parquet: str, queries: dict[int, str] | None = None, k: int = 10
) -> str:
    """Oracle: the single-query hybrid CTE (the SAME shared template —
    one fusion-SQL source of truth) per query — native BM25 branch per
    query text + the independently-verified expected dense table
    filtered to that query_id — tagged and unioned."""
    qs = MANY_QUERIES if queries is None else queries
    parts = [
        "SELECT CAST({qid} AS BIGINT) AS query_id, doc_id, rrf FROM (\n{branch}\n)".format(
            qid=int(qid),
            branch=HYBRID_SEARCH_SQL_TEMPLATE.format(
                bm25_sql=bm25_search_sql(q, k=HYBRID_POOL).strip(),
                dense_parquet=dense_many_parquet,
                dense_where=f" WHERE query_id = {int(qid)}",
                c=RRF_C,
                k=k,
            ).strip(),
        )
        for qid, q in sorted(qs.items())
    ]
    return " UNION ALL ".join(parts)


RERANK_POOL = 20


class CrossEncoderStage:
    """Joint (query, passage) reranker — the retrieve-then-rerank serving
    topology's second stage, with the exact deployment shape of a real
    cross-encoder (reference seq-classification head applied to a PAIR
    input, sequence_classification.rs single-forward-per-pair): a batch
    of pair texts → ONE joint forward → one scalar per pair.

    Deterministic stand-in semantics: the pair is encoded as a SINGLE
    text (``query ⊕ " [SEP] " ⊕ passage``) through the shared
    HashEmbedder — a joint encoding, not two tower vectors, so a real
    backend's query–passage attention has somewhere to live — and scored
    by cosine against the query embedding.  ``round_ha(…, 5)`` for
    driver value-hash stability.

    Scale shape: candidates per query are ≤ pool (tiny); the stage is a
    map_batches over the candidate stream so reranking many queries ×
    pools batches onto GPUs exactly like the NER actor pools.  Trivial
    init → pass an INSTANCE (task pool, CLAUDE.md fact #11).
    """

    def __init__(self, query: str):
        from rust_bert_ray.functions.util import round_ha
        from rust_bert_ray.pipelines.rag import _embedder

        self.embedder = _embedder()
        self.query = query
        qv = self.embedder.embed(query).astype(np.float64)
        self.qhat = qv / max(np.linalg.norm(qv), 1e-300)
        self._round_ha = round_ha

    def score_batch(self, texts) -> np.ndarray:
        """(n,) float64 scores for [(query, text)] pairs — the seam a
        torch/ONNX cross-encoder replaces with one padded forward."""
        pairs = [f"{self.query} [SEP] {t}" for t in texts]
        V = self.embedder.embed_batch(pairs).astype(np.float64)
        norms = np.maximum(np.linalg.norm(V, axis=1), 1e-300)
        return self._round_ha((V @ self.qhat) / norms, 5)

    def __call__(self, t: pa.Table) -> pa.Table:
        scores = self.score_batch(t.column("chunk_text").to_pylist())
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "chunk_idx": t.column("chunk_idx"),
                "ce_score": pa.array(scores, pa.float64()),
            }
        )


def rerank_search(
    sf_dir: str, query: str | None = None, k: int = 10, pool: int = RERANK_POOL
):
    """Retrieve-then-rerank: dense first-stage retrieval (partition-pruned
    rag_search) widened to ``pool`` candidates, then cross-encoder
    rescoring of every (query, chunk) pair and a streaming top-k on the
    joint score.

    Scale shape: stage 1 reads only the probed index partitions; stage 2
    touches ``pool`` rows per query — constant work per query regardless
    of corpus size, which is precisely why production rerankers afford a
    joint forward per pair."""
    from rust_bert_ray.functions.util import topk
    from rust_bert_ray.pipelines.rag import RAG_QUERY, rag_search

    q = RAG_QUERY if query is None else query
    cands = rag_search(sf_dir, query=q, k=pool)
    scored = cands.map_batches(
        CrossEncoderStage(q), batch_format="pyarrow", batch_size=None
    )
    return topk(scored, ["ce_score", "doc_id", "chunk_idx"], [True, False, False], k)


class CrossEncoderManyStage:
    """Multi-query cross-encoder: one stage holding a per-query joint
    kernel; each candidate row is rescored against ITS OWN query.

    Parity contract: the per-query kernel IS :class:`CrossEncoderStage`
    (same instance type, same ``score_batch`` float path), and rows are
    scored in query-partitioned sub-batches — the HashEmbedder is
    row-independent and the matvec's row dot products don't see other
    rows, so batched scores are bit-identical to the single-query stage
    (asserted in tests).  Trivial init (one query embed per entry) →
    pass an INSTANCE (task pool)."""

    def __init__(self, queries: dict[int, str]):
        self.stages = {int(qid): CrossEncoderStage(q) for qid, q in queries.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        qid = t.column("query_id").to_numpy(zero_copy_only=False)
        texts = t.column("chunk_text").to_pylist()
        scores = np.empty(len(texts), dtype=np.float64)
        for q in np.unique(qid):
            idx = np.flatnonzero(qid == q)
            scores[idx] = self.stages[int(q)].score_batch(
                [texts[i] for i in idx]
            )
        return pa.Table.from_pydict(
            {
                "query_id": t.column("query_id"),
                "doc_id": t.column("doc_id"),
                "chunk_idx": t.column("chunk_idx"),
                "ce_score": pa.array(scores, pa.float64()),
            }
        )


def rerank_search_many(
    sf_dir: str,
    queries: dict[int, str] | None = None,
    k: int = 10,
    pool: int = RERANK_POOL,
):
    """Batched retrieve-then-rerank: ONE union-probed chunk-index scan
    (:func:`rag_search_many`) widens every query in the table to its
    ``pool`` candidates, the cross-encoder stage rescores each
    (query, chunk) pair against its own query, and a grouped streaming
    top-k finishes per query — completing the batched ``_many`` family
    for the full serving topology (lexical, dense, hybrid, rerank).

    Scale shape: stage 1 amortizes the index read across the query
    table (n queries share one pruned scan instead of n per-call
    scans); stage 2 touches nq×pool rows total — constant joint
    forwards per query regardless of corpus size, and batching many
    queries' pools into shared map_batches calls is exactly how a GPU
    cross-encoder wants its input.  Per-query results equal
    :func:`rerank_search` on the same query text (tested).
    Output: (query_id, doc_id, chunk_idx, ce_score)."""
    from rust_bert_ray.functions.util import grouped_topk
    from rust_bert_ray.pipelines.rag import rag_search_many

    qs = {
        int(qid): q
        for qid, q in (MANY_QUERIES if queries is None else queries).items()
    }
    if not qs:
        # typed empty (the bm25_search_many contract): downstream sees a
        # real schema, not a schema-less zero-block dataset
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "chunk_idx": pa.array([], type=pa.int64()),
                    "ce_score": pa.array([], type=pa.float64()),
                }
            )
        )
    cands = rag_search_many(sf_dir, qs, k=pool)
    scored = cands.map_batches(
        CrossEncoderManyStage(qs), batch_format="pyarrow", batch_size=None
    )
    return grouped_topk(
        scored,
        "query_id",
        ["ce_score", "doc_id", "chunk_idx"],
        [True, False, False],
        k,
    )
