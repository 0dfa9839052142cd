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
