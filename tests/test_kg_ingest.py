"""Incremental KG ingestion (pipelines/kg.py ingest_kg_increment).

The append-only operating model: extraction runs only over the new
shard; global canonicalize re-runs over all checkpointed triples; the
final graph must equal a from-scratch run over the full corpus.
"""

import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from rust_bert_ray.corpus import generate
from rust_bert_ray.pipelines import checkpoint as ckpt
from rust_bert_ray.pipelines.kg import ingest_kg_increment, run_kg_pipeline

N_BASE, N_INC = 150, 50


@pytest.fixture(scope="module")
def split_runs(ray_session, tmp_path_factory):
    docs, _ = generate(N_BASE + N_INC, seed=13)
    root = tmp_path_factory.mktemp("kg_ingest")
    base_dir = os.path.join(root, "base_docs")
    inc_dir = os.path.join(root, "inc_docs")
    full_dir = os.path.join(root, "full_docs")
    os.makedirs(base_dir), os.makedirs(inc_dir), os.makedirs(full_dir)
    for start, rows, d, name in (
        (0, 75, base_dir, "part-00000"),
        (75, 75, base_dir, "part-00001"),
        (N_BASE, N_INC, inc_dir, "part-00000"),
    ):
        pq.write_table(docs.slice(start, rows), os.path.join(d, f"{name}.parquet"))
    for start, rows, name in ((0, 100, "part-00000"), (100, 100, "part-00001")):
        pq.write_table(docs.slice(start, rows), os.path.join(full_dir, f"{name}.parquet"))

    out_split = str(root / "out_split")
    out_full = str(root / "out_full")
    base_summary = run_kg_pipeline(base_dir, out_split, n_groups=2)
    ingest_summary = ingest_kg_increment(inc_dir, out_split)
    full_summary = run_kg_pipeline(full_dir, out_full, n_groups=2)
    return {
        "root": root,
        "inc_dir": inc_dir,
        "out_split": out_split,
        "out_full": out_full,
        "base_summary": base_summary,
        "ingest_summary": ingest_summary,
        "full_summary": full_summary,
    }


def _rows(out_dir: str, table: str) -> set:
    t = pads.dataset(os.path.join(out_dir, table)).to_table()
    cols = sorted(t.column_names)

    def freeze(v):
        return tuple(sorted(map(str, v))) if isinstance(v, list) else v

    return set(
        zip(*([freeze(v) for v in t.column(c).to_pylist()] for c in cols))
    )


def test_ingest_equals_full_rebuild(split_runs):
    """base + ingest produces the IDENTICAL graph to a from-scratch run
    over the concatenated corpus (triples, nodes, edges)."""
    for table in ("triples", "nodes", "edges"):
        assert _rows(split_runs["out_split"], table) == _rows(
            split_runs["out_full"], table
        ), table


def test_ingest_processes_only_increment(split_runs):
    s = split_runs["ingest_summary"]
    assert s["input_rows"] == N_INC
    assert len(s["partitions"]) == 1
    assert s["partitions"][0].startswith("ing-")


def test_reingest_is_noop(split_runs, ray_session):
    s2 = ingest_kg_increment(split_runs["inc_dir"], split_runs["out_split"])
    assert s2["partitions"] == []
    assert s2["resumed"] == split_runs["ingest_summary"]["partitions"] + ["final"]


def test_base_resume_keeps_ingest_partitions(split_runs, ray_session):
    """Re-running the base pipeline (fully resumed) must NOT sweep the
    ingest partitions as orphans."""
    import glob

    base_dir = os.path.join(split_runs["root"], "base_docs")
    s = run_kg_pipeline(base_dir, split_runs["out_split"], n_groups=2)
    assert s["partitions"] == []  # fully resumed
    ing = split_runs["ingest_summary"]["partitions"][0]
    assert os.path.isdir(
        ckpt.partition_dir(split_runs["out_split"], "triples", ing)
    )
    # graph still equals the full rebuild after the resume pass
    assert _rows(split_runs["out_split"], "edges") == _rows(
        split_runs["out_full"], "edges"
    )


def test_two_increments_equal_full_rebuild(ray_session, tmp_path):
    """Successive ingests compose: base + increment A + increment B
    produces the identical graph to a from-scratch run over all three
    shards (the append-only operating model applied repeatedly)."""
    docs, _ = generate(120, seed=29)
    dirs = {}
    for name, start, rows in (
        ("base", 0, 60),
        ("inc1", 60, 30),
        ("inc2", 90, 30),
        ("full", 0, 120),
    ):
        d = tmp_path / f"{name}_docs"
        d.mkdir()
        pq.write_table(docs.slice(start, rows), d / "part-00000.parquet")
        dirs[name] = str(d)

    out_split = str(tmp_path / "out_split")
    out_full = str(tmp_path / "out_full")
    run_kg_pipeline(dirs["base"], out_split, n_groups=1)
    s1 = ingest_kg_increment(dirs["inc1"], out_split)
    s2 = ingest_kg_increment(dirs["inc2"], out_split)
    assert s1["input_rows"] == 30 and s2["input_rows"] == 30
    # the second ingest resumes nothing from the first (disjoint tags)
    assert s1["partitions"] != s2["partitions"]
    # stage B: first ingest builds the bucket state (no prior state),
    # the second merges into it incrementally
    assert s1["stage_b"]["mode"] == "full"
    assert s2["stage_b"]["mode"] == "incremental"
    assert 1 <= s2["stage_b"]["nodes"]["touched_buckets"] <= 32
    run_kg_pipeline(dirs["full"], out_full, n_groups=1)
    # edges compare INCLUDING the doc_ids provenance sample: it is
    # min-cap at every layer since round 5, so ingest ≡ rebuild holds
    # for the full row
    for table in ("triples", "nodes", "edges"):
        assert _rows(out_split, table) == _rows(out_full, table), table


def test_kill_mid_ingest_resumes(split_runs, ray_session):
    """Simulate a crash BETWEEN ingest stage A and stage B: the ing-*
    triples partition landed but the final manifest never did.  A
    re-run of the same ingest resumes the landed partition (no
    re-extraction) and re-runs only the canonicalize, restoring the
    full-rebuild-equal graph."""
    import shutil

    out = split_runs["out_split"]
    ing = split_runs["ingest_summary"]["partitions"][0]
    # "kill": stage B output + final manifest lost; the ingest partition
    # and its manifest survived (atomic rename landed first)
    os.remove(ckpt.manifest_path(out, "final"))
    shutil.rmtree(os.path.join(out, "nodes"))
    shutil.rmtree(os.path.join(out, "edges"))
    s = ingest_kg_increment(split_runs["inc_dir"], out)
    assert s["partitions"] == []  # no re-extraction
    assert ing in s["resumed"]
    assert ckpt.is_partition_complete(out, "final")
    for table in ("nodes", "edges"):
        got = pads.dataset(os.path.join(out, table)).count_rows()
        want = pads.dataset(os.path.join(split_runs["out_full"], table)).count_rows()
        assert got == want, table


def test_state_bucket_recompute_matches_hive_partition(split_runs, ray_session):
    """_read_state_buckets recomputes _bucket from row content (crc of
    node_id / subj|pred|obj) instead of attaching it from the file path
    — assert the recomputed value equals the hive partition each row
    was read from, for every persisted bucket of both tables."""
    import glob
    import json

    from rust_bert_ray.pipelines.kg import (
        _EDGE_STATE_COLS,
        _NODE_STATE_COLS,
        _read_state_buckets,
        _state_pointer_path,
        _state_root,
    )

    out = split_runs["out_split"]
    with open(_state_pointer_path(out), encoding="utf-8") as f:
        state_dir = os.path.join(_state_root(out), json.load(f)["dir"])
    for table, cols in (("nodes", _NODE_STATE_COLS), ("edges", _EDGE_STATE_COLS)):
        table_dir = os.path.join(state_dir, f"{table}_state")
        buckets = sorted(
            int(os.path.basename(d).split("=", 1)[1])
            for d in glob.glob(os.path.join(table_dir, "bucket=*"))
        )
        assert buckets, table_dir
        # one pruned single-bucket read, then one multi-bucket read
        # covering everything (keeps the test at 2 executions/table)
        df1 = _read_state_buckets(table_dir, buckets[:1], cols).to_pandas()
        assert len(df1) > 0 and set(df1["_bucket"]) == {buckets[0]}
        df = _read_state_buckets(table_dir, buckets, cols).to_pandas()
        assert set(df["_bucket"]) == set(buckets), table
        # per-row: recomputed bucket == the hive dir the row came from
        import pyarrow.dataset as pads

        hive = pads.dataset(table_dir, partitioning="hive").to_table().to_pandas()
        key = (
            hive["node_id"]
            if table == "nodes"
            else hive["subj_id"] + "|" + hive["pred"] + "|" + hive["obj_id"]
        )
        from rust_bert_ray.stages.canonicalize import _crc_bucket

        assert (_crc_bucket(key, 32) == hive["bucket"].astype(int)).all(), table
