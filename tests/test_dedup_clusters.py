"""Connected-components / cluster-assignment unit tests (hash-to-min)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from rust_bert_ray.functions.dedup import connected_components


def _pairs_ds(pairs):
    t = pa.Table.from_pydict(
        {
            "doc_a": pa.array([a for a, _ in pairs], type=pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


def _labels(pairs):
    df = connected_components(_pairs_ds(pairs)).to_pandas()
    return dict(zip(df["doc_id"], df["cluster_id"]))


def test_chain_collapses_to_min(ray_session):
    # 1-2-3-4-5 chain: min-label propagation needs > 1 round
    lab = _labels([(1, 2), (2, 3), (3, 4), (4, 5)])
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components(ray_session):
    lab = _labels([(10, 11), (11, 12), (20, 21)])
    assert lab == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_path_converges(ray_session):
    # path of length 40 — stresses the O(log d) round bound
    pairs = [(i, i + 1) for i in range(40)]
    lab = _labels(pairs)
    assert set(lab.values()) == {0}
    assert len(lab) == 41


def test_star_and_clique(ray_session):
    pairs = [(5, i) for i in range(6, 12)] + [(100, 101), (101, 102), (100, 102)]
    lab = _labels(pairs)
    assert all(lab[i] == 5 for i in range(5, 12))
    assert all(lab[i] == 100 for i in (100, 101, 102))


def test_labels_only_cover_paired_docs(ray_session):
    lab = _labels([(3, 7)])
    assert set(lab) == {3, 7}


def test_driver_finish_matches_distributed_loop(ray_session):
    # same graphs through both paths: the default driver finish and the
    # star-contraction loop (forced with driver_finish_limit=0) must be
    # row- and dtype-identical
    pairs = (
        [(i, i + 1) for i in range(40)]
        + [(5, i) for i in range(6, 12)]
        + [(100, 101), (101, 102), (100, 102), (200, 300)]
    )

    def run(**kw):
        return (
            connected_components(_pairs_ds(pairs), **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    assert run().equals(run(driver_finish_limit=0))


def test_empty_pairs_yield_empty_typed_labels(ray_session):
    # Dataset-level schema must survive the empty case (to_pandas() on an
    # empty Ray dataset drops columns, so assert on the schema itself)
    ds = connected_components(_pairs_ds([]))
    assert ds.count() == 0
    schema = ds.schema()
    assert schema.names == ["doc_id", "cluster_id"]
    assert all(str(t) == "int64" for t in schema.types)


# ------------------------------------------------ sharded (join) paths

SF = "/root/testdata/sf0.001"


def test_dedup_exact_join_path_matches_broadcast(ray_session):
    from rust_bert_ray.functions.dedup import dedup_exact

    a = dedup_exact(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = (
        dedup_exact(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(b.columns) == ["doc_id", "text"]
    assert a.equals(b[a.columns])


def test_cluster_keep_list_join_path_matches_broadcast(ray_session):
    from rust_bert_ray.functions.dedup import dedup_jaccard_pairs, _cluster_keep_list

    a = (
        _cluster_keep_list(SF, dedup_jaccard_pairs(SF, 0.9))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        _cluster_keep_list(SF, dedup_jaccard_pairs(SF, 0.9), broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a[["doc_id", "cluster_id", "keep"]].equals(
        b[["doc_id", "cluster_id", "keep"]]
    )


def test_dedup_span_marks_semantics(ray_session, tmp_path):
    """Cross-doc duplicated 8-gram runs merge into maximal spans;
    within-doc-only repeats are not marked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data
    from rust_bert_ray.functions.dedup import dedup_span_marks

    shared = "one two three four five six seven eight nine ten"  # 10 words
    docs = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    f"prefix {shared} suffix tail words here",
                    f"other start {shared} different ending now",
                    # within-doc repeat only — must NOT be marked
                    "a b c d e f g h a b c d e f g h",
                    "completely unrelated text with nothing shared at all ok",
                ]
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    out = (
        dedup_span_marks(str(sf))
        .to_pandas()
        .sort_values(["doc_id", "span_start"], ignore_index=True)
    )
    assert set(out["doc_id"]) == {1, 2}
    r1 = out[out.doc_id == 1].iloc[0]
    # doc 1: shared starts at word 1, 10 words → grams at pos 1..3,
    # span covers words 1..(3+7)=10
    assert (r1.span_start, r1.span_end, r1.n_words) == (1, 10, 10)
    r2 = out[out.doc_id == 2].iloc[0]
    assert (r2.span_start, r2.span_end, r2.n_words) == (2, 11, 10)


def test_dedup_contamination_semantics(ray_session, tmp_path):
    """Training docs overlapping a benchmark doc's 8-grams are flagged
    with exact per-position hit counts; bench docs never appear; clean
    docs never appear."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.dedup import dedup_contamination

    bench_txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pa.Table.from_pydict(
        {
            # bench_mod=10, bench_rem=3 → doc 3 and 13 are the benchmark
            "doc_id": pa.array([3, 13, 1, 2, 4], type=pa.int64()),
            "text": pa.array(
                [
                    bench_txt,  # 10 words → 3 distinct 8-grams
                    "totally separate benchmark document with eight more words padding",
                    # doc 1: contains the full bench_txt → all 3 bench grams
                    f"lead {bench_txt} trail",
                    # doc 2: shares only a 7-gram (one word short) → clean
                    "beta gamma delta epsilon zeta eta theta X Y Z",
                    # doc 4: contains the first bench 8-gram twice
                    f"{' '.join(bench_txt.split()[:8])} mid {' '.join(bench_txt.split()[:8])}",
                ]
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    out = (
        dedup_contamination(str(sf))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 4]
    d1 = out[out.doc_id == 1].iloc[0]
    assert (d1.n_grams, d1.n_hits) == (5, 3)  # 12 words → 5 grams, 3 hits
    d4 = out[out.doc_id == 4].iloc[0]
    # 17 words → 10 grams; positions 0 and 9 reproduce the bench gram
    assert (d4.n_grams, d4.n_hits) == (10, 2)


def test_gram_hash_pairs_matches_string_grams(ray_session):
    """The rolling 128-bit gram hash is injective on real gram strings:
    equal grams ⇒ equal (h1,h2); distinct grams ⇒ distinct pairs."""
    import pyarrow as pa

    from rust_bert_ray.functions.dedup import _gram_hash_pairs

    texts = pa.array(
        [
            "a b c d e f g h i j",
            "z y a b c d e f g h i j",  # shares grams with row 0, shifted
            "a b c d e f g h",  # exactly one gram, equals row 0 pos 0
            "short text",  # < 8 tokens → no grams
        ]
    )
    h1, h2, row_idx, g = _gram_hash_pairs(texts, 8)
    assert g.tolist() == [3, 5, 1, 0]
    # brute-force string grams
    grams = []
    for t in texts.to_pylist():
        w = t.split(" ")
        grams += [" ".join(w[i : i + 8]) for i in range(max(len(w) - 7, 0))]
    assert len(grams) == len(h1)
    seen = {}
    for s, pair in zip(grams, zip(h1.tolist(), h2.tolist())):
        if s in seen:
            assert seen[s] == pair
        else:
            assert pair not in seen.values()
            seen[s] = pair
    # the equal grams really did collide (same string, same pair)
    assert grams[0] == grams[5] == grams[8]
    assert h1[0] == h1[5] == h1[8] and h2[0] == h2[5] == h2[8]


def test_dedup_incremental_semantics(ray_session, tmp_path):
    """Arriving docs colliding with the seen snapshot (doc_id % 5 == 0)
    drop; within-snapshot duplicates both survive (NOT EXISTS
    semantics); the persisted digest index is reused on a second call."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_bert_ray.functions.dedup import (
        _seen_digest_index,
        dedup_incremental,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([5, 10, 1, 2, 7, 12], pa.int64()),
            "text": pa.array(
                [
                    "seen alpha",  # snapshot
                    "seen beta",   # snapshot
                    "seen alpha",  # collides with seen → dropped
                    "fresh one",   # kept
                    "fresh twin",  # kept (duplicate only within arriving)
                    "fresh twin",  # kept too — cross-snapshot op only
                ]
            ),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")

    out = dedup_incremental(str(sf)).to_pandas()
    assert sorted(out.doc_id) == [2, 7, 12]

    # index is fingerprint-stable: second call reuses it and agrees
    base = _seen_digest_index(str(sf))
    mtime = os.path.getmtime(os.path.join(base, "meta.json"))
    out2 = dedup_incremental(str(sf)).to_pandas()
    assert sorted(out2.doc_id) == [2, 7, 12]
    assert os.path.getmtime(os.path.join(base, "meta.json")) == mtime


def test_exact_allpairs_guards_trip(ray_session):
    """The O(N²) exact baselines fail fast above their documented bounds
    (pointing at the LSH scale paths) instead of OOMing a worker."""
    import pytest

    from rust_bert_ray.functions import dedup as d

    with pytest.raises(ValueError, match="dedup_minhash_pairs"):
        d.dedup_jaccard_pairs(SF, max_rows=1)
    with pytest.raises(ValueError, match="dedup_embedding_lsh_pairs"):
        d.dedup_embedding_pairs(SF, max_rows=1)
