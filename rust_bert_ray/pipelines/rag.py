"""RAG ingest + semantic search over the documents table.

The reference's poster sentence-embeddings use case
(sentence_embeddings/pipeline.rs: embed → cosine retrieval), composed
Ray-Data-first into the modern retrieval pipeline:

    chunk (context windows, functions/text.q_chunk_docs)
      → embed per chunk (HashEmbedder, the deterministic
        sentence-embeddings analog — swap a real scorer in production)
      → SRP-bucket each vector and WRITE a bucket-partitioned parquet
        index (hive layout, fingerprint-invalidated — same shape as the
        ANN indexes in functions/similarity.py)
    search: embed the query once on the driver, probe only the
      Hamming-≤1 bucket partitions (I/O-side pruning: non-probed
      partitions are never read), exact cosine rerank + streaming top-k.

Scale shape: ingest is map-only + one partitioned write; search reads
(n_probe / 2^n_bits) of the index bytes.  At 100 TB, raise ``n_bits``
so partitions stay ~single-block sized, and ingest incrementally per
corpus snapshot (the index directory is append-per-snapshot like
functions/dedup._seen_digest_index).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rust_bert_ray.functions.util import embedding_matrix

RAG_INDEX_ROOT = "/tmp/rbr_rag_index"
RAG_VERSION = 1
RAG_N_BITS = 6
# deterministic benchmark query over the corpus vocabulary
RAG_QUERY = "customer query table join"


def _embedder():
    from rust_bert_ray.scorers import HashEmbedder

    return HashEmbedder(dim=64, pooling="mean")


class _ChunkEmbedStage:
    """chunk rows → + (embedding, bucket).  Trivial init → task pool."""

    def __init__(self, n_bits: int = RAG_N_BITS):
        from rust_bert_ray.functions.similarity import _srp_hash, _srp_planes

        self.embedder = _embedder()
        self.planes = _srp_planes(self.embedder.out_dim, n_bits)
        self._hash = _srp_hash

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("chunk_text").to_pylist()
        # batch-in/batch-out: a real embedder does ONE forward pass here
        V = self.embedder.embed_batch(texts)
        buckets = self._hash(self.planes, V.astype(np.float64))
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "chunk_idx": t.column("chunk_idx"),
                "chunk_text": t.column("chunk_text"),
                "embedding": pa.array(
                    [v for v in V], pa.list_(pa.float32())
                ),
                "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
            }
        )


def _fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"{st.st_size}-{int(st.st_mtime)}"


def ensure_rag_index(
    sf_dir: str, chunk_words: int = 32, overlap: int = 8, n_bits: int = RAG_N_BITS
) -> str:
    """Build (once) the bucket-partitioned chunk-vector index; idempotent
    via a fingerprinted meta file, concurrency-safe via tmp+rename."""
    sf_tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}-"
        f"{zlib.crc32(os.path.abspath(sf_dir).encode()) & 0xFFFFFFFF:08x}"
    )
    base = os.path.join(RAG_INDEX_ROOT, sf_tag, f"v{RAG_VERSION}-b{n_bits}")
    meta_path = os.path.join(base, "meta.json")
    fp = _fingerprint(sf_dir)
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            if json.load(f).get("fingerprint") == fp:
                return base
    import shutil

    from rust_bert_ray.functions.text import q_chunk_docs

    tmp = base + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    chunks = q_chunk_docs(sf_dir, chunk_words=chunk_words, overlap=overlap)
    # repartition bounds the hive file count (map tasks × 2^n_bits
    # buckets otherwise — the incremental-dedup index lesson); probed
    # reads also touch fewer files per bucket
    chunks.map_batches(
        _ChunkEmbedStage(n_bits), batch_format="pyarrow", batch_size=None
    ).repartition(4).write_parquet(
        os.path.join(tmp, "data"), partition_cols=["bucket"]
    )
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump({"fingerprint": fp, "n_bits": n_bits}, f)
    shutil.rmtree(base, ignore_errors=True)
    try:
        os.replace(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost a build race: use winner
    return base


def rag_search(sf_dir: str, query: str = RAG_QUERY, k: int = 10):
    """Partition-pruned semantic top-k over the chunk index."""
    from rust_bert_ray.functions.similarity import (
        _probed_partitions,
        _srp_hash,
        _srp_planes,
    )
    from rust_bert_ray.functions.util import round_ha, topk

    base = ensure_rag_index(sf_dir)
    emb = _embedder()
    qv = emb.embed(query).astype(np.float64)
    planes = _srp_planes(emb.out_dim, RAG_N_BITS)
    q_bucket = int(_srp_hash(planes, qv[None, :])[0])
    near = {q_bucket} | {q_bucket ^ (1 << b) for b in range(RAG_N_BITS)}
    dirs = _probed_partitions(os.path.join(base), near)
    if not dirs:  # no probed bucket materialized on disk (tiny corpus)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        )
    qhat = qv / max(np.linalg.norm(qv), 1e-300)

    def score(t: pa.Table) -> pa.Table:
        A = embedding_matrix(t.column("embedding"))
        norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
        cos = round_ha((A @ qhat) / norms, 5)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "chunk_idx": t.column("chunk_idx"),
                "cos": pa.array(cos, pa.float64()),
                "chunk_text": t.column("chunk_text"),
            }
        )

    ds = ray.data.read_parquet(
        dirs, columns=["doc_id", "chunk_idx", "chunk_text", "embedding"]
    )
    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return topk(scored, ["cos", "doc_id", "chunk_idx"], [True, False, False], k)


def rag_search_many(sf_dir: str, queries: dict[int, str] | None = None, k: int = 10):
    """Batched multi-query dense retrieval: ONE scan of the UNION of all
    queries' Hamming-≤1 probed buckets scores a whole query TABLE (the
    serving amortization, completing the batched family next to
    ``bm25_search_many`` / ``ann_pq_topk_many``).

    The union's probed FILES are read in one flat ``read_parquet`` (file
    pruning by path selection — never one Dataset per bucket); each
    row's SRP bucket is recomputed CONTENT-side from its stored
    embedding (hive partition values are path-only; the hash input is
    the identical float32 vector the index build hashed), so every
    query scores ONLY rows from ITS probe set.  Per-query cosines use
    the single-query matvec expression (bit parity with
    :func:`rag_search`, asserted in tests); the exchange carries ≤ nq×k
    local-top-k rows per block into ``grouped_topk``.
    Output: (query_id, doc_id, chunk_idx, cos, chunk_text)."""
    from rust_bert_ray.functions.search import MANY_QUERIES
    from rust_bert_ray.functions.similarity import (
        _probed_partitions,
        _srp_hash,
        _srp_planes,
    )
    from rust_bert_ray.functions.util import grouped_topk

    qs = MANY_QUERIES if queries is None else queries
    base = ensure_rag_index(sf_dir)
    emb = _embedder()
    planes = _srp_planes(emb.out_dim, RAG_N_BITS)
    qids = sorted(int(q) for q in qs)
    qhats, nears = [], []
    for qid in qids:
        qv = emb.embed(qs[qid]).astype(np.float64)
        qb = int(_srp_hash(planes, qv[None, :])[0])
        nears.append({qb} | {qb ^ (1 << b) for b in range(RAG_N_BITS)})
        qhats.append(qv / max(np.linalg.norm(qv), 1e-300))
    union = sorted(set().union(*nears))
    dirs = _probed_partitions(base, union)
    if not dirs:
        return ray.data.from_arrow(_many_empty_table())
    bcast = ray.put(
        (
            np.asarray(qids, dtype=np.int64),
            [np.asarray(sorted(n), dtype=np.int64) for n in nears],
            np.stack(qhats),
            planes,
        )
    )
    ds = ray.data.read_parquet(
        dirs, columns=["doc_id", "chunk_idx", "chunk_text", "embedding"]
    )
    scored = ds.map_batches(
        _ScoreMany(bcast, k), batch_format="pyarrow", batch_size=8192
    )
    return grouped_topk(
        scored, "query_id", ["cos", "doc_id", "chunk_idx"], [True, False, False], k
    )


def _many_empty_table() -> pa.Table:
    """The one source of truth for rag_search_many's output schema."""
    return pa.Table.from_pydict(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )


class _ScoreMany:
    """Per-block multi-query scorer (task pool — trivial ``__init__``,
    passed as an instance).  The broadcast (qids, probe sets, qhat
    matrix, SRP planes) tuple is resolved from the object store once
    per task, not once per batch."""

    def __init__(self, bcast, k: int):
        self._bcast, self._k, self._resolved = bcast, k, None

    def __call__(self, t: pa.Table) -> pa.Table:
        from rust_bert_ray.functions.similarity import _srp_hash
        from rust_bert_ray.functions.util import round_ha

        if self._resolved is None:
            self._resolved = ray.get(self._bcast)
        q_arr, near_arr, Qh, pl = self._resolved
        k = self._k
        A = embedding_matrix(t.column("embedding"))
        # content-side bucket recompute: identical float32 input to the
        # index build's hash, so buckets match the hive partitioning
        buckets = _srp_hash(pl, A.astype(np.float64))
        norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        ci = t.column("chunk_idx").to_numpy(zero_copy_only=False)
        cols = {"query_id": [], "doc_id": [], "chunk_idx": [], "cos": []}
        take_idxs = []
        for i, qid in enumerate(q_arr):
            mask = np.isin(buckets, near_arr[i])
            if not mask.any():
                continue
            # the single-query matvec expression over this query's rows
            cos = round_ha((A[mask] @ Qh[i]) / norms[mask], 5)
            dv, cv = doc[mask], ci[mask]
            order = np.lexsort((cv, dv, -cos))[:k]
            take_idxs.append(np.flatnonzero(mask)[order])
            cols["query_id"].append(np.full(len(order), qid, dtype=np.int64))
            cols["doc_id"].append(dv[order])
            cols["chunk_idx"].append(cv[order])
            cols["cos"].append(cos[order])
        if not cols["query_id"]:
            return _many_empty_table()
        # one Arrow take for the ≤ nq×k kept strings — never materialize
        # the whole batch's chunk_text as Python objects
        texts = t.column("chunk_text").take(pa.array(np.concatenate(take_idxs)))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(np.concatenate(cols["query_id"]), pa.int64()),
                "doc_id": pa.array(np.concatenate(cols["doc_id"]), pa.int64()),
                "chunk_idx": pa.array(np.concatenate(cols["chunk_idx"]), pa.int64()),
                "cos": pa.array(np.concatenate(cols["cos"]), pa.float64()),
                "chunk_text": texts.combine_chunks()
                if isinstance(texts, pa.ChunkedArray)
                else texts,
            }
        )
