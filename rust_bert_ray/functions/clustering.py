"""Embedding clustering + semantic dedup over the ``embeddings`` table.

- ``q_embed_clusters``: distributed k-means in **integer fixed point**.
  Vectors are quantized to micro-units (``round_ha(x * 1e6)``), so every
  per-cluster sum is an exact int64 and the centroid update is a floor
  division — the result is bit-identical regardless of batch boundaries,
  partial-sum order, or parallelism.  That is what lets the oracle be a
  genuinely *independent* single-process reimplementation (expected.py)
  instead of a shared float kernel.
- ``dedup_semantic``: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) —
  k-means first, then pairwise cosine ONLY within each cluster, so the
  O(n²) comparison never crosses cluster boundaries.

Scale shape at 100 TB:

- each k-means iteration is one **map-only pass** emitting k partial
  (count, sum-vector) rows per block; the driver reduces k×d integers
  (a few KB) and broadcasts the next centroids via ``ray.put`` — the
  classic mini-batch-free distributed Lloyd layout with zero shuffle;
- the deterministic init is a streaming top-k by a doc-hash (an
  order-statistic sample — NOT a head sample; it spans the table);
- SemDeDup's pair stage shuffles only (vec_id, cluster, quantized
  vector) rows grouped by cluster; with k scaled ~n/target_cluster_size
  the per-group matmul stays bounded, and a skewed cluster is capped
  (``cluster_cap``) exactly like the LSH bucket caps in dedup.py.

Embedding values are bounded (|x| < 1 for normalized embeddings, and
the synthetic table is within [-0.6, 0.6]), so micro-unit integers are
< 2^21 and every distance/dot term below stays < 2^53 — exact in the
float64 kernels used for speed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from rust_bert_ray.functions.util import embedding_matrix, round_ha

QUANT_SCALE = 1_000_000  # micro-units
KMEANS_K = 8
KMEANS_ITERS = 4
_INIT_MULT = np.uint64(2654435761)  # Knuth multiplicative hash
_INIT_MOD = np.uint64(4294967296)
SEMANTIC_THRESHOLD = 0.38


def _read_embeddings(sf_dir: str):
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _quantize_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """float32 embeddings → exact integer micro-units held in float64
    (half away from zero, matching util.round_ha / DuckDB ROUND)."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    x = embedding_matrix(batch.column("embedding")) * QUANT_SCALE
    xq = np.copysign(np.floor(np.abs(x) + 0.5), x)  # ints as float64, exact
    return ids, xq


def _init_hash(ids: np.ndarray) -> np.ndarray:
    u = ids.astype(np.uint64)
    return (u % _INIT_MOD) * _INIT_MULT % _INIT_MOD


def _assign(xq: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared L2 in exact integer-valued float64;
    ties break to the lowest cluster id (argmin)."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
    cross = xq @ cent.T  # exact: |terms| < 2^53
    cnorm = (cent * cent).sum(axis=1)
    return np.argmin(cnorm[None, :] - 2.0 * cross, axis=1)


def kmeans_fit(ds, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> np.ndarray:
    """Deterministic distributed Lloyd's algorithm → (k, d) int-valued
    float64 centroid matrix."""

    def seed_rows(batch: pa.Table) -> pd.DataFrame:
        ids, xq = _quantize_batch(batch)
        return pd.DataFrame(
            {
                "h": _init_hash(ids),
                "vec_id": ids,
                "q": [row.astype(np.int64).tobytes() for row in xq],
            }
        )

    from rust_bert_ray.functions.util import topk

    seeds = topk(
        ds.map_batches(seed_rows, batch_format="pyarrow", batch_size=65536),
        keys=["h", "vec_id"],
        descending=[False, False],
        k=k,
    ).to_pandas()
    cent = np.stack(
        [
            np.frombuffer(b, dtype=np.int64).astype(np.float64)
            for b in seeds.sort_values(["h", "vec_id"])["q"]
        ]
    )

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partials(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
            c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
            _, xq = _quantize_batch(batch)
            a = _assign(xq, c)
            rows = []
            for j in range(len(c)):
                m = a == j
                if m.any():
                    rows.append(
                        (j, int(m.sum()), xq[m].sum(axis=0).astype(np.int64))
                    )
            if not rows:
                return pa.Table.from_pydict(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "count": pa.array([], pa.int64()),
                        "vec_sum": pa.array([], pa.list_(pa.int64())),
                    }
                )
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array([r[0] for r in rows], pa.int64()),
                    "count": pa.array([r[1] for r in rows], pa.int64()),
                    "vec_sum": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
                }
            )

        part = ds.map_batches(
            partials, batch_format="pyarrow", batch_size=65536
        ).to_pandas()  # ≤ k rows per block — a few KB on the driver
        new = cent.copy()
        for j in range(len(cent)):
            rows = part[part["cluster"] == j]
            if len(rows):
                n = int(rows["count"].sum())  # exact integer reduction
                s = np.sum(np.stack(rows["vec_sum"].to_numpy()), axis=0)
                new[j] = np.floor_divide(s, n)  # floor toward -inf, both sides
        cent = new
    return cent


def q_embed_clusters(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Final (vec_id, cluster) assignment after ``iters`` exact-integer
    Lloyd iterations from the hash-sampled deterministic init."""
    ds = _read_embeddings(sf_dir)
    cent = kmeans_fit(ds, k=k, iters=iters)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self, cent_ref):
            self.c = (
                ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, xq = _quantize_batch(batch)
            a = _assign(xq, self.c)
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "cluster": pa.array(a.astype(np.int64), pa.int64()),
                }
            )

    return ds.map_batches(
        Assign,
        fn_constructor_kwargs={"cent_ref": cent_ref},
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=2,
    )


def dedup_semantic(
    sf_dir: str,
    threshold: float = SEMANTIC_THRESHOLD,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    cluster_cap: int = 100_000,
    num_partitions: int = 8,
):
    """SemDeDup: near-duplicate pairs by cosine ≥ ``threshold``, compared
    ONLY within a document's k-means cluster (cross-cluster pairs are
    pruned by design — that is the point of the method).

    Output: (vec_a, vec_b, cluster, cos) with vec_a < vec_b; ``cos`` is
    computed from the exact quantized integers with a fixed expression,
    so the independent expected-table oracle reproduces it bit-for-bit.
    """
    ds = _read_embeddings(sf_dir)
    cent = kmeans_fit(ds, k=k, iters=iters)
    cent_ref = ray.put(cent)

    def tag(batch: pa.Table, cent_ref=cent_ref) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        ids, xq = _quantize_batch(batch)
        a = _assign(xq, c)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "q": pa.array(
                    [row.astype(np.int64).tobytes() for row in xq], pa.binary()
                ),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
                "cos": pd.Series(dtype="float64"),
            }
        )
        if len(df) < 2:
            return empty
        df = df.sort_values("vec_id").head(cluster_cap)
        ids = df["vec_id"].to_numpy()
        X = np.stack(
            [np.frombuffer(b, dtype=np.int64) for b in df["q"]]
        ).astype(np.float64)
        G = X @ X.T  # exact integer dots (< 2^53)
        n = (X * X).sum(axis=1)
        cos = round_ha(G / np.sqrt(np.outer(n, n)), 5)
        iu, ju = np.triu_indices(len(ids), k=1)
        m = cos[iu, ju] >= threshold
        if not m.any():
            return empty
        return pd.DataFrame(
            {
                "vec_a": ids[iu[m]].astype(np.int64),
                "vec_b": ids[ju[m]].astype(np.int64),
                "cluster": np.full(int(m.sum()), df["cluster"].iat[0], np.int64),
                "cos": cos[iu, ju][m],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
    return tagged.groupby("cluster", num_partitions=num_partitions).map_groups(
        pairs, batch_format="pandas"
    )
