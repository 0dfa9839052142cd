"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k — the exactness baseline.  The
  query matrix is broadcast once; each batch does one matmul.  Scales
  linearly in corpus size (every vector is scanned once, streaming).
- ``ann_lsh_topk``: sign-random-projection LSH variant — the scale path.
  Vectors are bucketed by an 8-bit hash per batch; only buckets within
  Hamming distance ≤ 1 of the query's bucket are scanned (~1/28 of the
  corpus in expectation), trading recall for a ~25× scan reduction.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rust_bert_ray.functions.util import round_ha


def _read_embeddings(sf_dir: str):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """Fetch ONE row by key with predicate pushdown — row-group statistics
    prune the scan; the table is never materialized on the driver."""
    import pyarrow.dataset as pads

    ds = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"))
    t = ds.to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") == query_vec_id,
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id {query_vec_id} not found")
    return np.array(t.column("embedding")[0].as_py(), dtype=np.float64)


class CosineScore:
    """Per-batch cosine vs a broadcast query vector."""

    def __init__(self, q_ref, exclude_id: int):
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.q = q / max(np.linalg.norm(q), 1e-300)
        self.exclude_id = exclude_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        A = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
        cos = round_ha((A @ self.q) / norms, 5)
        mask = ids != self.exclude_id
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[mask], type=pa.int64()),
                "cos": pa.array(cos[mask], type=pa.float64()),
            }
        )


def ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Exact cosine top-k for one query vector (brute-force baseline)."""
    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)
    emb = _read_embeddings(sf_dir)
    scored = emb.map_batches(
        CosineScore,
        fn_constructor_kwargs={"q_ref": q_ref, "exclude_id": query_vec_id},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    from rust_bert_ray.functions.util import topk

    return topk(scored, ["cos", "vec_id"], [True, False], k)


ANN_TOPK_SQL = """
SELECT b.vec_id AS vec_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 5) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id = 0 AND b.vec_id != 0
ORDER BY cos DESC, b.vec_id
LIMIT 10
"""


def _srp_planes(dim: int, n_bits: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _srp_hash(planes: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


def ann_lsh_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_bits: int = 8):
    """Approximate top-k: scan only LSH buckets near the query's bucket."""
    q = _query_vector(sf_dir, query_vec_id)
    dim = q.shape[0]
    planes = _srp_planes(dim, n_bits)
    q_bucket = int(_srp_hash(planes, q[None, :])[0])
    # buckets within Hamming distance 1 of the query bucket
    near = {q_bucket} | {q_bucket ^ (1 << b) for b in range(n_bits)}
    state_ref = ray.put((q, planes, near))

    class BucketScore:
        def __init__(self, ref, exclude_id):
            q, planes, near = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.q = q / max(np.linalg.norm(q), 1e-300)
            self.planes = planes
            self.near = near
            self.exclude_id = exclude_id

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            A = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            buckets = _srp_hash(self.planes, A)
            keep = np.array(
                [b in self.near and i != self.exclude_id for b, i in zip(buckets, ids)]
            )
            if not keep.any():
                return pa.Table.from_pydict(
                    {
                        "vec_id": pa.array([], type=pa.int64()),
                        "cos": pa.array([], type=pa.float64()),
                    }
                )
            A, ids = A[keep], ids[keep]
            norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
            cos = round_ha((A @ self.q) / norms, 5)
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "cos": pa.array(cos, type=pa.float64()),
                }
            )

    emb = _read_embeddings(sf_dir)
    scored = emb.map_batches(
        BucketScore,
        fn_constructor_kwargs={"ref": state_ref, "exclude_id": query_vec_id},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    from rust_bert_ray.functions.util import topk

    return topk(scored, ["cos", "vec_id"], [True, False], k)


def kmeans_centroids(X: np.ndarray, k: int, n_iter: int = 5) -> np.ndarray:
    """Deterministic Lloyd's k-means on L2-normalized rows (spherical
    k-means: cosine assignment, mean + renormalize update).  Init = first
    k sample rows — seeded and reproducible across processes."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    C = Xn[:k].copy()
    for _ in range(n_iter):
        assign = (Xn @ C.T).argmax(axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    return C


def ann_ivf_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_rows: int = 256,
):
    """IVF-style approximate top-k: coarse-quantize vectors to centroids,
    scan only the ``n_probe`` centroids nearest to the query.

    Centroids come from a seeded spherical k-means over a BOUNDED head
    sample (``dataset.head(sample_rows)`` touches only the leading row
    group(s), never the full table).  The centroid table is broadcast;
    assignment happens per batch with one matmul.  Expected scan
    fraction ≈ n_probe/n_centroids.
    """
    import pyarrow.dataset as pads

    q = _query_vector(sf_dir, query_vec_id)
    t = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).head(
        sample_rows, columns=["vec_id", "embedding"]
    )
    sample = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    C = kmeans_centroids(sample, n_centroids)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = set(np.argsort(-(C @ qn))[:n_probe].tolist())
    state_ref = ray.put((qn, C, probe))

    class IvfScore:
        def __init__(self, ref, exclude_id):
            self.q, self.C, self.probe = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )
            self.exclude_id = exclude_id

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            A = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
            An = A / norms[:, None]
            assign = (An @ self.C.T).argmax(axis=1)
            keep = np.array(
                [a in self.probe and i != self.exclude_id for a, i in zip(assign, ids)]
            )
            if not keep.any():
                return pa.Table.from_pydict(
                    {
                        "vec_id": pa.array([], type=pa.int64()),
                        "cos": pa.array([], type=pa.float64()),
                    }
                )
            cos = round_ha(An[keep] @ self.q, 5)
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids[keep], type=pa.int64()),
                    "cos": pa.array(cos, type=pa.float64()),
                }
            )

    emb = _read_embeddings(sf_dir)
    scored = emb.map_batches(
        IvfScore,
        fn_constructor_kwargs={"ref": state_ref, "exclude_id": query_vec_id},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    from rust_bert_ray.functions.util import topk

    return topk(scored, ["cos", "vec_id"], [True, False], k)
