"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k — the exactness baseline.  The
  query matrix is broadcast once; each batch does one matmul.  Scales
  linearly in corpus size (every vector is scanned once, streaming).
- ``ann_lsh_topk``: sign-random-projection LSH variant — the scale path.
  Vectors are bucketed by an 8-bit SRP hash into a PERSISTED
  bucket-partitioned parquet index (built once, idempotent, fingerprint
  invalidated); a query reads ONLY the partitions within Hamming
  distance ≤ 1 of its bucket (9/256 of the data in expectation), so the
  pruning is I/O-side, not compute-side.
- ``ann_ivf_topk``: IVF variant — vectors coarse-quantized to spherical
  k-means centroids (trained on a STRIDED row-group sample spanning the
  whole table, not a head sample) and persisted partitioned by centroid;
  a query reads only the ``n_probe`` nearest centroid partitions.

At 100 TB the index build is the one full pass (embarrassingly parallel
map + partitioned write; repartition by bucket first to avoid
file-per-task-per-bucket fragmentation); every query after that touches
``n_probe/n_centroids`` (or ~9/256) of the bytes.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from rust_bert_ray.functions.util import embedding_matrix, round_ha

INDEX_ROOT = "/tmp/rbr_ann_index"
# bump whenever the hashing/centroid algebra changes — a stale persisted
# index must not survive a code change (same trap expected.VERSION guards)
INDEX_VERSION = 1


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
        A = embedding_matrix(batch.column("embedding"))
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


def ann_filtered_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10, label: int = 3):
    """Hybrid (filtered) search: exact cosine top-k restricted to a
    metadata predicate (``label``), with the predicate pushed into the
    Parquet scan (`filter=` → row-group statistics pruning) — vectors
    failing the filter never enter the object store.  Scoring kernel and
    top-k identical to :func:`ann_topk`."""
    import pyarrow.dataset as pads

    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=(pads.field("label") == label),
    )
    scored = emb.map_batches(
        CosineScore,
        fn_constructor_kwargs={"q_ref": q_ref, "exclude_id": query_vec_id},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    from rust_bert_ray.functions.util import topk

    return topk(scored, ["cos", "vec_id"], [True, False], k)


ANN_FILTERED_TOPK_SQL = """
SELECT b.vec_id AS vec_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 5) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id = 0 AND b.vec_id != 0 AND b.label = 3
ORDER BY cos DESC, b.vec_id
LIMIT 10
"""


ANN_TOPK_SQL = """
SELECT b.vec_id AS vec_id,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 5) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id = 0 AND b.vec_id != 0
ORDER BY cos DESC, b.vec_id
LIMIT 10
"""


# ------------------------------------------------- persisted bucket index

def _source_fingerprint(sf_dir: str) -> str:
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return f"{st.st_size}-{int(st.st_mtime)}"


def _ensure_index(sf_dir: str, key: str, add_bucket) -> tuple[str, dict]:
    """Build (once) a bucket-partitioned copy of the embeddings table.

    Layout: ``<INDEX_ROOT>/<sf-hash>/<key>/data/bucket=<b>/*.parquet`` +
    ``meta.json`` carrying the source fingerprint and total row count.
    Idempotent and concurrency-safe: built into a tmp dir, renamed into
    place; a lost rename race just uses the winner's index.
    """
    sf_tag = f"{os.path.basename(os.path.normpath(sf_dir))}-" \
             f"{zlib.crc32(os.path.abspath(sf_dir).encode()) & 0xFFFFFFFF:08x}"
    base = os.path.join(INDEX_ROOT, sf_tag, f"{key}-v{INDEX_VERSION}")
    meta_path = os.path.join(base, "meta.json")
    fp = _source_fingerprint(sf_dir)
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return base, meta
    import pyarrow.dataset as pads

    total = pads.dataset(os.path.join(sf_dir, "embeddings.parquet")).count_rows()
    tmp = base + f".tmp-{os.getpid()}"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    emb = _read_embeddings(sf_dir)
    # repartition bounds the hive file count (files = tasks × bucket
    # values — CLAUDE.md fact 19; the seen-index 4k-tiny-files incident)
    emb.map_batches(
        add_bucket, batch_format="pyarrow", batch_size=8192
    ).repartition(4).write_parquet(
        os.path.join(tmp, "data"), partition_cols=["bucket"]
    )
    meta = {"fingerprint": fp, "total_rows": int(total)}
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    try:
        if os.path.exists(base):
            import shutil

            shutil.rmtree(base)
        os.replace(tmp, base)
    except OSError:
        # concurrent builder won the rename; its index is equivalent
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return base, meta


def _probed_partitions(base: str, buckets) -> list[str]:
    """Parquet FILES under the probed bucket partitions (this Ray
    version's read_parquet rejects directory paths inside a list)."""
    import glob

    files = []
    for b in sorted(buckets):
        d = os.path.join(base, "data", f"bucket={int(b)}")
        if os.path.isdir(d):
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    return files


def _empty_topk():
    """Empty result with the topk schema — a Dataset, matching the
    normal path's return type."""
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": pa.array([], type=pa.int64()),
             "cos": pa.array([], type=pa.float64())}
        )
    )


def _partition_rows(dirs: list[str]) -> int:
    import pyarrow.dataset as pads

    return sum(pads.dataset(d).count_rows() for d in dirs) if dirs else 0


def _scored_topk(emb, q, exclude_id: int, k: int):
    scored = emb.map_batches(
        CosineScore(  # trivial __init__ → task pool, not actor pool
            q_ref=q, exclude_id=exclude_id
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )
    from rust_bert_ray.functions.util import topk

    return topk(scored, ["cos", "vec_id"], [True, False], k)


def _srp_planes(dim: int, n_bits: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _srp_hash(planes: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


def ensure_lsh_index(sf_dir: str, n_bits: int = 8) -> tuple[str, dict]:
    """Persist embeddings partitioned by their SRP bucket (build once)."""
    dim = len(_query_vector(sf_dir, 0))
    planes = _srp_planes(dim, n_bits)

    def add_bucket(t: pa.Table) -> pa.Table:
        A = embedding_matrix(t.column("embedding"))
        return t.append_column(
            "bucket", pa.array(_srp_hash(planes, A), type=pa.int64())
        )

    return _ensure_index(sf_dir, f"lsh-{n_bits}", add_bucket)


def ann_lsh_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_bits: int = 8):
    """Approximate top-k reading ONLY the LSH partitions near the query.

    Pruning is I/O-side: the persisted index is partitioned by bucket,
    and the probed set (Hamming ≤ 1 of the query bucket → 9 of 2^n_bits
    partitions) is the only data read.  Candidate set is identical to
    hashing every vector and filtering — verified by the expected-table
    oracle."""
    base, _meta = ensure_lsh_index(sf_dir, n_bits)
    q = _query_vector(sf_dir, query_vec_id)
    planes = _srp_planes(q.shape[0], n_bits)
    q_bucket = int(_srp_hash(planes, q[None, :])[0])
    near = {q_bucket} | {q_bucket ^ (1 << b) for b in range(n_bits)}
    dirs = _probed_partitions(base, near)
    if not dirs:
        return _empty_topk()
    emb = ray.data.read_parquet(dirs, columns=["vec_id", "embedding"])
    return _scored_topk(emb, q, query_vec_id, k)


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


def strided_sample_indices(
    path: str, sample_rows: int = 256, n_slices: int = 8
) -> list[int]:
    """Row indices of a distribution-spanning sample: the leading rows of
    ``n_slices`` row groups spread evenly across the file.  Reads only
    parquet METADATA — no data scan — yet, unlike ``head(n)``, the
    sample covers the whole table (a head sample misfits any corpus
    whose distribution drifts over write order)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    n_rg = md.num_row_groups
    picks = sorted(set(np.linspace(0, n_rg - 1, min(n_slices, n_rg)).astype(int).tolist()))
    starts = np.cumsum([0] + [md.row_group(i).num_rows for i in range(n_rg)])
    per = max(1, sample_rows // len(picks))
    out: list[int] = []
    for i in picks:
        out.extend(range(int(starts[i]), int(min(starts[i] + per, starts[i + 1]))))
    return out[:sample_rows]


def _sample_matrix(sf_dir: str, sample_rows: int) -> np.ndarray:
    """(sample_rows, dim) float64 matrix of the strided row-group sample
    — metadata-pruned row-group reads only, never a full scan."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    idxs = strided_sample_indices(path, sample_rows)
    pf = pq.ParquetFile(path)
    md = pf.metadata
    starts = np.cumsum(
        [0] + [md.row_group(i).num_rows for i in range(md.num_row_groups)]
    )
    rows: list = []
    idx_arr = np.asarray(idxs)
    for rg in range(md.num_row_groups):
        sel = idx_arr[(idx_arr >= starts[rg]) & (idx_arr < starts[rg + 1])]
        if len(sel):
            t = pf.read_row_group(rg, columns=["embedding"])
            local = (sel - starts[rg]).tolist()
            col = t.column("embedding")
            rows.extend(col[j].as_py() for j in local)
    return np.asarray(rows, dtype=np.float64)


def _ivf_centroids(sf_dir: str, n_centroids: int, sample_rows: int) -> np.ndarray:
    return kmeans_centroids(_sample_matrix(sf_dir, sample_rows), n_centroids)


def ensure_ivf_index(
    sf_dir: str, n_centroids: int = 32, sample_rows: int = 256
) -> tuple[str, dict, np.ndarray]:
    """Persist embeddings partitioned by nearest-centroid (build once).

    Centroids come from a seeded spherical k-means over a STRIDED
    row-group sample spanning the table (not ``head`` — a head sample
    is not a distribution sample)."""
    C = _ivf_centroids(sf_dir, n_centroids, sample_rows)

    def add_bucket(t: pa.Table) -> pa.Table:
        A = embedding_matrix(t.column("embedding"))
        norms = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
        assign = ((A / norms[:, None]) @ C.T).argmax(axis=1)
        return t.append_column("bucket", pa.array(assign, type=pa.int64()))

    base, meta = _ensure_index(
        sf_dir, f"ivf-{n_centroids}-{sample_rows}", add_bucket
    )
    return base, meta, C


def ann_ivf_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 4,
    sample_rows: int = 256,
):
    """IVF approximate top-k reading ONLY the probed centroid partitions.

    The persisted index is partitioned by nearest centroid; a query
    reads the ``n_probe`` partitions whose centroids are closest —
    scan fraction ≈ n_probe/n_centroids of the BYTES, not just of the
    compute."""
    base, _meta, C = ensure_ivf_index(sf_dir, n_centroids, sample_rows)
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = np.argsort(-(C @ qn))[:n_probe].tolist()
    dirs = _probed_partitions(base, probe)
    if not dirs:
        return _empty_topk()
    emb = ray.data.read_parquet(dirs, columns=["vec_id", "embedding"])
    return _scored_topk(emb, q, query_vec_id, k)


# ------------------------------------------------- product quantization

PQ_M = 8  # subspaces (64-dim embedding → 8-dim subvectors)
PQ_K = 16  # centroids per subspace → 4-bit codes, 8 B/vector packed
PQ_SAMPLE = 256


def _lloyd_l2(X: np.ndarray, k: int, n_iter: int = 5) -> np.ndarray:
    """Deterministic plain-L2 Lloyd for one PQ subspace (ADC ranks by
    squared L2 on the unit sphere, so training minimizes the same
    metric — spherical k-means would mis-train 8-dim subvectors whose
    norms carry signal).  Init = first k sample rows; argmin breaks
    ties toward the lowest index.  Per-row distances are computed with
    the broadcast-subtract form, whose float order depends only on the
    row and the codebook — never on batch size (CLAUDE.md fact #13)."""
    C = X[:k].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def pq_codebooks(
    sf_dir: str, m: int = PQ_M, k: int = PQ_K, sample_rows: int = PQ_SAMPLE
) -> list[np.ndarray]:
    """Per-subspace codebooks trained on the strided row-group sample.
    Driver-side and deterministic — the Ray encode stage and the
    expected-table oracle builder share THIS function (the documented
    float-kernel-sharing pattern), while candidate ranking logic is
    re-derived independently on each side."""
    S = _sample_matrix(sf_dir, sample_rows)
    Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-300)
    d = Sn.shape[1] // m
    return [_lloyd_l2(Sn[:, j * d : (j + 1) * d], k) for j in range(m)]


def pq_encode(A: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """Pack each (pre-normalized) row's per-subspace nearest-centroid
    ids into ONE int64 (4 bits × m) — the 8 B/vector representation the
    index ships instead of 256 B of floats."""
    m = len(books)
    # the 4-bit packing convention lives HERE and in pq_adc_scores —
    # wider codebooks would silently alias centroid ids
    if any(len(C) > 16 for C in books) or m > 16:
        raise ValueError(
            "pq_encode packs 4-bit centroid ids (≤16 centroids/subspace, "
            "≤16 subspaces); retrain with n_centroids ≤ 16 or widen the "
            "packing"
        )
    d = A.shape[1] // m
    codes = np.zeros(A.shape[0], dtype=np.int64)
    for j, C in enumerate(books):
        sub = A[:, j * d : (j + 1) * d]
        d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        codes |= d2.argmin(axis=1).astype(np.int64) << (4 * j)
    return codes


def pq_adc_scores(codes: np.ndarray, tables: list[np.ndarray]) -> np.ndarray:
    """Asymmetric distance: Σ_j table_j[code_j] in FIXED subspace order
    (explicit left-to-right adds — float-sum order must not depend on
    implementation details, CLAUDE.md fact #13)."""
    s = tables[0][codes & 15]
    for j in range(1, len(tables)):
        s = s + tables[j][(codes >> (4 * j)) & 15]
    return s


def ensure_pq_index(
    sf_dir: str, m: int = PQ_M, k: int = PQ_K, sample_rows: int = PQ_SAMPLE
) -> tuple[str, dict]:
    """Persist the (vec_id, code) PQ code table (build once,
    fingerprint-invalidated).  8 B/vector: at the north rule's 10^12
    documents the whole search index is ~8 TB — scannable map-only —
    where raw float32 vectors would be 256 TB.  Codebooks are NOT
    persisted: retraining from the strided sample is deterministic and
    costs a metadata-pruned read of 256 rows."""
    books = pq_codebooks(sf_dir, m, k, sample_rows)

    def encode(t: pa.Table) -> pa.Table:
        A = embedding_matrix(t.column("embedding")).astype(np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        return pa.Table.from_pydict(
            {
                "vec_id": t.column("vec_id"),
                "code": pa.array(pq_encode(An, books), type=pa.int64()),
            }
        )

    sf_tag = f"{os.path.basename(os.path.normpath(sf_dir))}-" \
             f"{zlib.crc32(os.path.abspath(sf_dir).encode()) & 0xFFFFFFFF:08x}"
    base = os.path.join(INDEX_ROOT, sf_tag, f"pq-{m}-{k}-{sample_rows}-v{INDEX_VERSION}")
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
    # bounded file count (the incremental-dedup index lesson): tiny rows,
    # the repartition moves ~12 B/row
    _read_embeddings(sf_dir).map_batches(
        encode, batch_format="pyarrow", batch_size=8192
    ).repartition(4).write_parquet(os.path.join(tmp, "data"))
    meta = {"fingerprint": fp}
    with open(os.path.join(tmp, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f)
    try:
        if os.path.exists(base):
            import shutil

            shutil.rmtree(base)
        os.replace(tmp, base)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # concurrent builder won
    return base, meta


def ann_pq_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    n_centroids: int = PQ_K,
    sample_rows: int = PQ_SAMPLE,
):
    """Product-quantization approximate top-k (Jégou et al. 2011):
    asymmetric distance over the persisted 8 B/vector code table.

    The memory-bound ANN scale path: IVF/LSH prune WHICH partitions are
    read; PQ shrinks WHAT a scan ships 32× (the two compose — an
    IVF-PQ variant partitions this code table by coarse centroid).  The
    query precomputes m×k distance tables driver-side, broadcast to a
    map-only scan doing pure integer unpack + table lookups; the
    exchange carries (vec_id, dist) prune survivors only.

    Production serving widens ``k`` into a shortlist and exact-reranks
    the survivors against their true vectors (point lookups) — on
    unclusterable vectors ADC ranking alone has bounded recall; the
    widen-then-rerank path restores it (tests assert monotone lift)."""
    import glob

    from rust_bert_ray.functions.util import round_ha, topk

    base, _meta = ensure_pq_index(sf_dir, m, n_centroids, sample_rows)
    books = pq_codebooks(sf_dir, m, n_centroids, sample_rows)
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-300)
    d = len(qn) // m
    tables = [
        ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    tables_ref = ray.put(tables)
    exclude = query_vec_id

    def score(t: pa.Table) -> pa.Table:
        tabs = ray.get(tables_ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = t.column("code").to_numpy(zero_copy_only=False)
        dist = round_ha(pq_adc_scores(codes, tabs), 5)
        mask = ids != exclude
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[mask], type=pa.int64()),
                "dist": pa.array(dist[mask], type=pa.float64()),
            }
        )

    files = sorted(glob.glob(os.path.join(base, "data", "*.parquet")))
    ds = ray.data.read_parquet(files, columns=["vec_id", "code"])
    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return topk(scored, ["dist", "vec_id"], [False, False], k)


MANY_QUERY_VEC_IDS = (0, 7, 21, 42)


def _query_matrix(sf_dir: str, query_vec_ids) -> np.ndarray:
    """Fetch a SMALL batch of query vectors by key with ONE predicate-
    pushdown read (row-group pruning), returned in ``query_vec_ids``
    order — the batched analog of :func:`_query_vector`."""
    import pyarrow.dataset as pads

    ids = [int(x) for x in query_vec_ids]
    ds = pads.dataset(os.path.join(sf_dir, "embeddings.parquet"))
    t = ds.to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(ids),
    )
    found = {
        int(v): np.array(e, dtype=np.float64)
        for v, e in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist())
    }
    missing = [i for i in ids if i not in found]
    if missing:
        raise KeyError(f"vec_ids not found: {missing}")
    return np.stack([found[i] for i in ids])


def ann_pq_topk_many(
    sf_dir: str,
    query_vec_ids=MANY_QUERY_VEC_IDS,
    k: int = 10,
    m: int = PQ_M,
    n_centroids: int = PQ_K,
    sample_rows: int = PQ_SAMPLE,
):
    """Batched multi-query PQ top-k: ONE scan of the packed code table
    scores a whole query TABLE (the serving amortization the per-call
    API can't give — n queries reuse the same index read instead of n
    scans).

    Per-query ADC tables (m × n_centroids doubles each) are precomputed
    driver-side with EXACTLY the single-query kernel expressions (same
    float-op order → per-query results are bit-identical to
    ``ann_pq_topk``, asserted in tests) and broadcast once via
    ``ray.put``.  Each batch task scores all queries against its codes
    (an (nq, batch) table-lookup sum), applies each query's
    self-exclusion, and emits only its LOCAL per-query top-k — the
    exchange carries ≤ nq×k rows per block into :func:`grouped_topk`.
    At 10^12 vectors the cost is one 8 B/vector scan total, not per
    query.  Output: (query_vec_id, vec_id, dist)."""
    import glob

    from rust_bert_ray.functions.util import grouped_topk, round_ha

    base, _meta = ensure_pq_index(sf_dir, m, n_centroids, sample_rows)
    books = pq_codebooks(sf_dir, m, n_centroids, sample_rows)
    qids = [int(x) for x in query_vec_ids]
    Q = _query_matrix(sf_dir, qids)
    d = Q.shape[1] // m
    # per-query tables with the single-query expression (bit parity),
    # stacked per subspace: tabs[j] is (nq, n_centroids)
    tabs = []
    for j in range(m):
        rows = []
        for i in range(len(qids)):
            qn = Q[i] / max(np.linalg.norm(Q[i]), 1e-300)
            rows.append(
                ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
            )
        tabs.append(np.stack(rows))
    bcast = ray.put((np.asarray(qids, dtype=np.int64), tabs))

    def score(t: pa.Table) -> pa.Table:
        q_arr, tables = ray.get(bcast)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = t.column("code").to_numpy(zero_copy_only=False)
        # (nq, n) ADC sums via THE single-query kernel per query row —
        # the unpacking convention lives only in pq_encode/pq_adc_scores
        # (bit parity with ann_pq_topk by shared code, not re-derivation)
        dist = np.stack(
            [
                pq_adc_scores(codes, [tab[i] for tab in tables])
                for i in range(len(q_arr))
            ]
        )
        dist = round_ha(dist, 5)
        out_q, out_v, out_d = [], [], []
        for i, qid in enumerate(q_arr):
            mask = ids != qid
            dv, vv = dist[i][mask], ids[mask]
            # local per-query prune: total order (dist asc, vec_id asc)
            order = np.lexsort((vv, dv))[:k]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(vv[order])
            out_d.append(dv[order])
        return pa.Table.from_pydict(
            {
                "query_vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "dist": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    files = sorted(glob.glob(os.path.join(base, "data", "*.parquet")))
    ds = ray.data.read_parquet(files, columns=["vec_id", "code"])
    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return grouped_topk(scored, "query_vec_id", ["dist", "vec_id"], [False, False], k)


def ensure_ivfpq_index(
    sf_dir: str,
    n_centroids: int = 32,
    sample_rows: int = PQ_SAMPLE,
    m: int = PQ_M,
    k: int = PQ_K,
) -> tuple[str, dict, np.ndarray, list[np.ndarray]]:
    """IVF ∘ PQ: the packed code table partitioned by coarse centroid —
    a query reads n_probe/n_centroids of ~8 B/vector files (both
    prunings compose: WHICH partitions × WHAT each row ships).
    Codebooks/centroids retrain deterministically from the strided
    sample (not persisted).  Residual coding (quantize x − centroid) is
    the documented refinement; plain coding keeps the oracle shared
    with ann_pq_topk's kernels."""
    C = _ivf_centroids(sf_dir, n_centroids, sample_rows)
    books = pq_codebooks(sf_dir, m, k, sample_rows)

    def add_codes(t: pa.Table) -> pa.Table:
        A = embedding_matrix(t.column("embedding")).astype(np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        cid = (An @ C.T).argmax(axis=1)
        return pa.Table.from_pydict(
            {
                "vec_id": t.column("vec_id"),
                "code": pa.array(pq_encode(An, books), type=pa.int64()),
                # cid = the partition value DENORMALIZED into the file
                # (the BM25-doclen pattern): hive partition columns are
                # path-only, and multi-query scans over a probed-file
                # UNION need each row's coarse cell content-side
                "cid": pa.array(cid, type=pa.int64()),
                "bucket": pa.array(cid, type=pa.int64()),
            }
        )

    base, meta = _ensure_index(
        sf_dir, f"ivfpq-cid-{n_centroids}-{m}-{k}-{sample_rows}", add_codes
    )
    return base, meta, C, books


def ann_ivfpq_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 8,
    m: int = PQ_M,
    pq_k: int = PQ_K,
    sample_rows: int = PQ_SAMPLE,
):
    """IVF-PQ approximate top-k: probe the ``n_probe`` nearest coarse
    partitions of the PACKED code table and ADC-score only those rows.
    At the north rule's 10^12 vectors: IVF prunes the scan to
    n_probe/n_centroids of the bytes AND PQ shrinks those bytes 32× —
    the standard billion-scale serving index (widen-then-exact-rerank
    applies on top, as in ann_pq_topk)."""
    import glob as _glob

    from rust_bert_ray.functions.util import round_ha, topk

    base, _meta, C, books = ensure_ivfpq_index(
        sf_dir, n_centroids, sample_rows, m, pq_k
    )
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = np.argsort(-(C @ qn))[:n_probe].tolist()
    dirs = _probed_partitions(base, probe)
    if not dirs:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"vec_id": pa.array([], type=pa.int64()),
                 "dist": pa.array([], type=pa.float64())}
            )
        )
    d = len(qn) // m
    tables = [
        ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    tables_ref = ray.put(tables)
    exclude = query_vec_id

    def score(t: pa.Table) -> pa.Table:
        tabs = ray.get(tables_ref)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = t.column("code").to_numpy(zero_copy_only=False)
        dist = round_ha(pq_adc_scores(codes, tabs), 5)
        mask = ids != exclude
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[mask], type=pa.int64()),
                "dist": pa.array(dist[mask], type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(dirs, columns=["vec_id", "code"])
    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return topk(scored, ["dist", "vec_id"], [False, False], k)


def ann_ivfpq_topk_many(
    sf_dir: str,
    query_vec_ids=MANY_QUERY_VEC_IDS,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 8,
    m: int = PQ_M,
    pq_k: int = PQ_K,
    sample_rows: int = PQ_SAMPLE,
):
    """Batched multi-query IVF-PQ: ONE scan of the UNION of all queries'
    probed coarse partitions scores the whole query table — the two
    prunings (IVF partition selection × PQ payload compression) compose
    with the serving amortization of :func:`ann_pq_topk_many`.

    The union's probed FILES are read in ONE flat read_parquet (file
    pruning by path selection — never one Dataset per bucket, the r5
    plan lesson); each row carries the ``cid`` coarse-cell column the
    index denormalizes into the files (hive partition values are
    path-only), so a query scores ONLY rows from ITS probed partitions
    (mask before ADC — per-row ADC values are independent of which
    other rows share the batch, so per-query results are bit-identical
    to :func:`ann_ivfpq_topk`, asserted in tests).  Exchange: ≤ nq×k
    local-top-k rows per block into :func:`grouped_topk`.
    Output: (query_vec_id, vec_id, dist)."""
    from rust_bert_ray.functions.util import grouped_topk, round_ha

    base, _meta, C, books = ensure_ivfpq_index(
        sf_dir, n_centroids, sample_rows, m, pq_k
    )
    qids = [int(x) for x in query_vec_ids]
    Q = _query_matrix(sf_dir, qids)
    d = Q.shape[1] // m
    probes: list[list[int]] = []
    tabs: list[list[np.ndarray]] = []
    for i in range(len(qids)):
        # same probe-selection and ADC-table expressions as the
        # single-query path (bit parity by shared spec)
        qn = Q[i] / max(np.linalg.norm(Q[i]), 1e-300)
        probes.append(np.argsort(-(C @ qn))[:n_probe].tolist())
        tabs.append(
            [
                ((qn[j * d : (j + 1) * d][None, :] - books[j]) ** 2).sum(axis=1)
                for j in range(m)
            ]
        )
    union = sorted({int(b) for p in probes for b in p})
    files = _probed_partitions(base, union)
    empty = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "query_vec_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "dist": pa.array([], type=pa.float64()),
            }
        )
    )
    if not files:
        return empty
    bcast = ray.put(
        (np.asarray(qids, dtype=np.int64),
         [set(p) for p in probes],
         tabs)
    )

    def score(t: pa.Table) -> pa.Table:
        q_arr, probe_sets, tables = ray.get(bcast)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = t.column("code").to_numpy(zero_copy_only=False)
        buckets = t.column("cid").to_numpy(zero_copy_only=False)
        out_q, out_v, out_d = [], [], []
        for i, qid in enumerate(q_arr):
            mask = np.isin(buckets, list(probe_sets[i])) & (ids != qid)
            if not mask.any():
                continue
            dv = round_ha(pq_adc_scores(codes[mask], tables[i]), 5)
            vv = ids[mask]
            order = np.lexsort((vv, dv))[:k]
            out_q.append(np.full(len(order), qid, dtype=np.int64))
            out_v.append(vv[order])
            out_d.append(dv[order])
        if not out_q:
            return pa.Table.from_pydict(
                {
                    "query_vec_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        return pa.Table.from_pydict(
            {
                "query_vec_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "dist": pa.array(np.concatenate(out_d), type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(files, columns=["vec_id", "code", "cid"])
    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
    return grouped_topk(scored, "query_vec_id", ["dist", "vec_id"], [False, False], k)


def ann_pq_rerank_topk(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 64,
    m: int = PQ_M,
    n_centroids: int = PQ_K,
    sample_rows: int = PQ_SAMPLE,
):
    """The widen-then-exact-rerank serving topology ann_pq_topk's
    docstring promises: ADC over the 8 B/vector code table produces a
    ``shortlist``-sized candidate set, whose TRUE vectors are then
    point-read (predicate pushdown on vec_id — row-group pruning, not a
    second full scan) and exactly cosine-reranked with the same kernel
    as ann_topk.  Constant driver state (the shortlist ids); exact
    scores on whatever the shortlist recalls — at 10^12 vectors the
    read cost is the PQ scan + ``shortlist`` point lookups."""
    import pyarrow.dataset as pads

    short = (
        ann_pq_topk(sf_dir, query_vec_id, shortlist, m, n_centroids, sample_rows)
        .to_pandas()
    )
    ids = [int(v) for v in short["vec_id"]]
    q = _query_vector(sf_dir, query_vec_id)
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(ids),
    )
    return _scored_topk(emb, q, query_vec_id, k)


def ann_scan_report(sf_dir: str, query_vec_id: int = 0) -> dict:
    """Scanned-fraction evidence for the partition-pruned ANN variants."""
    out: dict = {}
    base, meta = ensure_lsh_index(sf_dir)
    q = _query_vector(sf_dir, query_vec_id)
    planes = _srp_planes(q.shape[0])
    qb = int(_srp_hash(planes, q[None, :])[0])
    near = {qb} | {qb ^ (1 << b) for b in range(8)}
    rows = _partition_rows(_probed_partitions(base, near))
    out["lsh"] = {
        "probed_partitions": len(near),
        "scanned_rows": rows,
        "total_rows": meta["total_rows"],
        "scanned_fraction": round(rows / max(meta["total_rows"], 1), 4),
    }
    base, meta, C = ensure_ivf_index(sf_dir)
    qn = q / max(np.linalg.norm(q), 1e-300)
    probe = np.argsort(-(C @ qn))[:4].tolist()
    rows = _partition_rows(_probed_partitions(base, probe))
    out["ivf"] = {
        "probed_partitions": 4,
        "scanned_rows": rows,
        "total_rows": meta["total_rows"],
        "scanned_fraction": round(rows / max(meta["total_rows"], 1), 4),
    }
    return out
