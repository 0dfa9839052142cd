"""Hot-band cap on the incremental MinHash index (the round-4 verdict's
quadratic-join risk): a boilerplate cluster must never put more than
``band_cap`` seen rows into one (band, band_hash) bucket, and below the
cap the query's results must be identical to the uncapped semantics."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rust_bert_ray.functions.dedup import (
    _SNAP_MOD,
    _SNAP_REM,
    _seen_minhash_index,
    dedup_incremental_minhash,
)

BOILER = (
    "click here to accept cookies and continue to the site "
    "terms of service apply to all visitors of this page"
)


@pytest.fixture(scope="module")
def hot_band_dir(ray_session, tmp_path_factory):
    """60 docs; every doc carrying the SAME boilerplate text → one giant
    near-dup cluster, so every (band, band_hash) bucket of the seen
    snapshot holds all 12 seen docs."""
    root = str(tmp_path_factory.mktemp("hot_band_sf"))
    ids = list(range(60))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array([BOILER] * 60)}),
        os.path.join(root, "documents.parquet"),
    )
    return root


def _bucket_sizes(base: str) -> dict[tuple[int, int], int]:
    sizes: dict[tuple[int, int], int] = {}
    for f in glob.glob(os.path.join(base, "data", "band=*", "*.parquet")):
        band = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        t = pq.read_table(f, columns=["band_hash", "doc_id"])
        for bh in t.column("band_hash").to_pylist():
            sizes[(band, bh)] = sizes.get((band, bh), 0) + 1
    return sizes


def test_index_buckets_bounded_and_deterministic(hot_band_dir):
    base = _seen_minhash_index(hot_band_dir, band_cap=3)
    sizes = _bucket_sizes(base)
    assert sizes, "index is empty"
    assert max(sizes.values()) <= 3
    # the retained representatives are the LOWEST seen doc_ids
    kept = set()
    for f in glob.glob(os.path.join(base, "data", "band=*", "*.parquet")):
        kept.update(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
    seen_ids = [i for i in range(60) if i % _SNAP_MOD == _SNAP_REM]
    assert kept == set(sorted(seen_ids)[:3])


def test_uncapped_bucket_would_have_been_hot(hot_band_dir):
    """Sanity: without the cap the same corpus fills buckets with all 12
    seen docs (i.e. the cap is doing real work in the other test)."""
    base = _seen_minhash_index(hot_band_dir, band_cap=200)
    sizes = _bucket_sizes(base)
    assert max(sizes.values()) == 12


def test_capped_query_matches_uncapped_on_identical_cluster(hot_band_dir):
    capped = (
        dedup_incremental_minhash(hot_band_dir, band_cap=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    uncapped = (
        dedup_incremental_minhash(hot_band_dir, band_cap=200)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every arriving doc is an exact dup of the cluster → flagged at 1.0
    arriving = [i for i in range(60) if i % _SNAP_MOD != _SNAP_REM]
    assert capped["doc_id"].tolist() == arriving
    assert (capped["max_sim"] == 1.0).all()
    assert capped.equals(uncapped)


def test_join_rows_bounded_by_cap(hot_band_dir):
    """The quadratic-join guard itself: with 48 arriving docs × 16 bands
    the capped index can emit at most 48 × 16 × band_cap candidate rows
    (uncapped would be 48 × 16 × 12)."""
    import ray

    from rust_bert_ray.functions.dedup import MinHashStage, _read_documents

    base = _seen_minhash_index(hot_band_dir, band_cap=3)
    files = sorted(glob.glob(os.path.join(base, "data", "band=*", "*.parquet")))
    seen = ray.data.read_parquet(files, columns=["band_hash", "doc_id"])
    n_seen_rows = seen.count()
    # 16 bands × ≤3 rows per bucket; identical docs → 16 buckets total
    assert n_seen_rows <= 16 * 3
