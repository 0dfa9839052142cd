"""ANN units: k-means determinism, IVF/LSH recall vs brute force.

Uses the Ray-free expected builders so no cluster is needed.
"""

import numpy as np

from rust_bert_ray.expected import ann_ivf_topk, ann_lsh_topk, _ann_common, _topk_table
from rust_bert_ray.functions.similarity import kmeans_centroids
from rust_bert_ray.functions.util import round_ha

SF = "/root/testdata/sf0.001"


def _exact_topk(k=10):
    ids, M, q = _ann_common(SF, 0)
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    cos = round_ha((M @ qn) / norms, 5)
    mask = ids != 0
    return set(_topk_table(ids[mask], cos[mask], k).column("vec_id").to_pylist())


def test_kmeans_deterministic_and_normalized():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((200, 16))
    C1 = kmeans_centroids(X, 8)
    C2 = kmeans_centroids(X, 8)
    assert np.array_equal(C1, C2)
    assert C1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)


def test_ivf_recall_vs_bruteforce():
    exact = _exact_topk()
    ivf = set(ann_ivf_topk(SF, "", n_probe=4).column("vec_id").to_pylist())
    # 4/16 probes: the true neighbors are concentrated near the query's
    # centroid, so recall should be well above the 25% scan fraction
    assert len(ivf & exact) >= 5, (ivf, exact)


def test_lsh_candidates_are_exact_cosines():
    # every LSH hit must carry the exact cosine the brute-force assigns
    ids, M, q = _ann_common(SF, 0)
    qn = q / max(np.linalg.norm(q), 1e-300)
    norms = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    cos_by_id = dict(zip(ids.tolist(), round_ha((M @ qn) / norms, 5).tolist()))
    t = ann_lsh_topk(SF, "")
    for vid, c in zip(t.column("vec_id").to_pylist(), t.column("cos").to_pylist()):
        assert cos_by_id[vid] == c


def test_ann_index_partition_pruning(ray_session):
    """LSH/IVF queries read only probed partitions of the persisted
    index; scanned fraction is a strict subset of the corpus."""
    from rust_bert_ray.functions.similarity import ann_scan_report

    rep = ann_scan_report("/root/testdata/sf0.001")
    for kind in ("lsh", "ivf"):
        assert 0 < rep[kind]["scanned_rows"] <= rep[kind]["total_rows"]
        assert rep[kind]["scanned_fraction"] < 0.6  # tiny sf: loose bound
    # at sf0.01 the real target applies
    rep = ann_scan_report("/root/testdata/sf0.01")
    assert rep["lsh"]["scanned_fraction"] < 0.2
    assert rep["ivf"]["scanned_fraction"] < 0.2


def test_ann_index_fingerprint_invalidation(ray_session, tmp_path):
    """A changed source table invalidates the persisted index."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_bert_ray.functions import similarity as S

    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((64, 8))
    t = pa.Table.from_pydict(
        {"vec_id": pa.array(range(64), type=pa.int64()),
         "embedding": pa.array(emb.tolist(),
                               type=pa.list_(pa.float64()))}
    )
    pq.write_table(t, sf / "embeddings.parquet")
    base1, meta1 = S.ensure_lsh_index(str(sf))
    assert meta1["total_rows"] == 64
    # rewrite the table (new fingerprint) → index rebuilds
    t2 = t.slice(0, 32)
    pq.write_table(t2, sf / "embeddings.parquet")
    import os, time
    os.utime(sf / "embeddings.parquet", (time.time() + 5, time.time() + 5))
    base2, meta2 = S.ensure_lsh_index(str(sf))
    assert meta2["total_rows"] == 32 and meta2 != meta1
    shutil.rmtree(base2, ignore_errors=True)


def test_ann_filtered_topk_respects_predicate(ray_session):
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.similarity import ann_filtered_topk, ann_topk

    sf = "/root/testdata/sf0.001"
    out = ann_filtered_topk(sf, label=3).to_pandas()
    lab = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "label"]).to_pandas()
    allowed = set(lab.loc[lab.label == 3, "vec_id"])
    assert len(out) > 0 and set(out.vec_id) <= allowed
    # scores agree with the unfiltered scorer on the shared kernel
    full = ann_topk(sf, k=10_000).to_pandas().set_index("vec_id")["cos"]
    for r in out.itertuples():
        assert full.loc[r.vec_id] == r.cos


def test_pq_encode_is_batch_invariant(ray_session):
    """Codes are a pure per-row function of (row, codebooks): encoding in
    one batch equals encoding in ragged splits — the property that makes
    the distributed code table deterministic under any partitioning."""
    import numpy as np

    from rust_bert_ray.functions.similarity import pq_codebooks, pq_encode
    from rust_bert_ray.functions.util import embedding_matrix

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(sf + "/embeddings.parquet", columns=["embedding"])
    A = embedding_matrix(t.column("embedding")).astype(np.float64)
    An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
    books = pq_codebooks(sf)
    whole = pq_encode(An, books)
    split = np.concatenate(
        [pq_encode(An[s], books) for s in (slice(0, 7), slice(7, 20), slice(20, None))]
    )
    assert (whole == split).all()
    # 4-bit fields: every unpacked centroid id is < 16
    for j in range(8):
        assert (((whole >> (4 * j)) & 15) < 16).all()


def test_pq_topk_recall_vs_exact(ray_session):
    """PQ is approximate; its top-10 must beat random retrieval by a
    wide margin.  The synthetic embeddings are near-random (no cluster
    structure — PQ's worst case, and the exact top-10 cosines are
    tightly bunched), so recall@10 sits around 3-5 of 10 across (m, k)
    configs vs a random expectation of 10·10/N ≈ 2 at N=50; production
    recall comes from the shortlist→exact-rerank topology the docstring
    documents.  The ORACLE (ann_pq_topk expected table) is the exactness
    gate for the ADC algebra itself."""
    from rust_bert_ray.functions.similarity import ann_pq_topk, ann_topk

    sf = "/root/testdata/sf0.001"
    exact = set(ann_topk(sf, k=10).to_pandas().vec_id)
    pq_ids = set(ann_pq_topk(sf, k=10).to_pandas().vec_id)
    assert len(exact & pq_ids) >= 3
    # widening the shortlist monotonically lifts recall (the rerank path)
    wide = set(ann_pq_topk(sf, k=40).to_pandas().vec_id)
    assert len(exact & wide) >= len(exact & pq_ids)


def test_ivfpq_probes_prune_and_match_pq_distances(ray_session):
    """IVF-PQ reads only the probed coarse partitions, and every
    returned distance equals the flat PQ scan's distance for the same
    vec_id (same codebooks/ADC — IVF only changes WHICH rows are
    scanned)."""
    from rust_bert_ray.functions.similarity import (
        _probed_partitions,
        ann_ivfpq_topk,
        ann_pq_topk,
        ensure_ivfpq_index,
    )

    sf = "/root/testdata/sf0.001"
    base, meta, C, books = ensure_ivfpq_index(sf)
    out = ann_ivfpq_topk(sf, n_probe=8).to_pandas()
    # 8/32 probed partitions of a 50-vector table may hold under k rows
    assert 0 < len(out) <= 10
    # pruning: probing all centroids reads strictly more files
    some = _probed_partitions(base, range(8))
    every = _probed_partitions(base, range(len(C)))
    assert len(some) < len(every)
    flat = ann_pq_topk(sf, k=10_000).to_pandas().set_index("vec_id")["dist"]
    for r in out.itertuples():
        assert flat.loc[r.vec_id] == r.dist


def test_pq_rerank_restores_exact_scores(ray_session):
    """Widen-then-rerank: every returned score equals the brute-force
    cosine for that id, and recall@10 is at least the flat ADC
    ranking's (the rerank can only fix ordering inside the shortlist)."""
    from rust_bert_ray.functions.similarity import (
        ann_pq_rerank_topk,
        ann_pq_topk,
        ann_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = ann_topk(sf, k=10_000).to_pandas().set_index("vec_id")["cos"]
    out = ann_pq_rerank_topk(sf, k=10, shortlist=40).to_pandas()
    assert 0 < len(out) <= 10
    for r in out.itertuples():
        assert exact.loc[r.vec_id] == r.cos
    top10 = set(exact.sort_values(ascending=False).head(10).index)
    flat = set(ann_pq_topk(sf, k=10).to_pandas().vec_id)
    assert len(set(out.vec_id) & top10) >= len(flat & top10)


def test_ann_pq_topk_many_equals_per_query(ray_session):
    """One code-table scan for a query batch returns, per query,
    bit-identical rows to the single-query ann_pq_topk (same ADC table
    expressions, same exclusion and (dist, vec_id) total order)."""
    from rust_bert_ray.functions.similarity import (
        MANY_QUERY_VEC_IDS,
        ann_pq_topk,
        ann_pq_topk_many,
    )

    sf = "/root/testdata/sf0.001"
    got = ann_pq_topk_many(sf, k=5).to_pandas()
    assert list(got.columns) == ["query_vec_id", "vec_id", "dist"]
    for qid in MANY_QUERY_VEC_IDS:
        g = got[got["query_vec_id"] == qid].reset_index(drop=True)
        want = ann_pq_topk(sf, query_vec_id=qid, k=5).to_pandas()
        assert g["vec_id"].tolist() == want["vec_id"].tolist()
        assert g["dist"].tolist() == want["dist"].tolist()
        # self-exclusion holds per query
        assert qid not in set(g["vec_id"])


def test_ann_ivfpq_topk_many_equals_per_query(ray_session):
    """One scan of the UNION of all queries' probed partitions returns,
    per query, bit-identical rows to the single-query ann_ivfpq_topk
    (each query masked to ITS probed cells via the denormalized cid
    column; same probe-selection/ADC expressions and total order)."""
    from rust_bert_ray.functions.similarity import (
        MANY_QUERY_VEC_IDS,
        _probed_partitions,
        ann_ivfpq_topk,
        ann_ivfpq_topk_many,
        ensure_ivfpq_index,
    )

    sf = "/root/testdata/sf0.001"
    got = ann_ivfpq_topk_many(sf, k=5).to_pandas()
    assert list(got.columns) == ["query_vec_id", "vec_id", "dist"]
    for qid in MANY_QUERY_VEC_IDS:
        g = got[got["query_vec_id"] == qid].reset_index(drop=True)
        want = ann_ivfpq_topk(sf, query_vec_id=qid, k=5).to_pandas()
        assert g["vec_id"].tolist() == want["vec_id"].tolist()
        assert g["dist"].tolist() == want["dist"].tolist()
        assert qid not in set(g["vec_id"])
    # the union scan still prunes: the queries' probed-bucket union maps
    # to strictly fewer files than the full table (the single-query
    # pruning property, preserved under batching)
    import numpy as np

    from rust_bert_ray.functions.similarity import _query_matrix

    base, _meta, C, _books = ensure_ivfpq_index(sf)
    Q = _query_matrix(sf, list(MANY_QUERY_VEC_IDS))
    probed = set()
    for i in range(Q.shape[0]):
        qn = Q[i] / max(np.linalg.norm(Q[i]), 1e-300)
        probed.update(np.argsort(-(C @ qn))[:8].tolist())
    union_files = _probed_partitions(base, sorted(probed))
    all_files = _probed_partitions(base, range(len(C)))
    assert 0 < len(union_files) < len(all_files)
