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
