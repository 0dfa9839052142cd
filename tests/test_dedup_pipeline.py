"""Resumable dedup pipeline: keep-list correctness + kill-and-resume."""

import os
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from rust_bert_ray.pipelines import checkpoint as ckpt
from rust_bert_ray.pipelines.dedup_pipeline import run_dedup_pipeline


@pytest.fixture(scope="module")
def sharded_docs(ray_session, tmp_path_factory):
    """documents.parquet split into 4 shards (the pipeline's file groups)."""
    src = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    root = str(tmp_path_factory.mktemp("docs_shards"))
    n = src.num_rows
    step = (n + 3) // 4
    for i, start in enumerate(range(0, n, step)):
        pq.write_table(src.slice(start, step), os.path.join(root, f"s{i}.parquet"))
    return root, src


@pytest.fixture(scope="module")
def dedup_run(sharded_docs, tmp_path_factory):
    root, src = sharded_docs
    out = str(tmp_path_factory.mktemp("dedup_out"))
    summary = run_dedup_pipeline(root, out, n_groups=4)
    return {"root": root, "src": src, "out": out, "summary": summary}


def test_keep_list_matches_query_operator(dedup_run, ray_session):
    """Pipeline keep-list == the dedup_clusters_minhash query's keep flags."""
    import __ray_entry__ as e

    q = e.queries()["dedup_clusters_minhash"]("/root/testdata/sf0.01").to_pandas()
    expected_drop = set(q.loc[q["keep"] == 0, "doc_id"])
    kept = pads.dataset(os.path.join(dedup_run["out"], "corpus_dedup")).to_table()
    kept_ids = set(kept.column("doc_id").to_pylist())
    all_ids = set(dedup_run["src"].column("doc_id").to_pylist())
    assert kept_ids == all_ids - expected_drop
    assert dedup_run["summary"]["dropped"] == len(expected_drop)
    assert dedup_run["summary"]["kept_rows"] == len(kept_ids)


def test_kept_rows_carry_all_columns(dedup_run):
    kept = pads.dataset(os.path.join(dedup_run["out"], "corpus_dedup")).to_table()
    assert set(dedup_run["src"].schema.names) <= set(kept.schema.names)


def test_manifests_and_resume(dedup_run, ray_session):
    out = dedup_run["out"]
    parts = ckpt.completed_partitions(out)
    assert {"0", "1", "2", "3", "final"} <= set(parts)
    s2 = run_dedup_pipeline(dedup_run["root"], out, n_groups=4)
    assert s2["partitions"] == []
    assert set(s2["resumed"]) == {0, 1, 2, 3, "final"}
    assert s2["kept_rows"] == dedup_run["summary"]["kept_rows"]


def test_kill_and_resume_recomputes_only_missing(dedup_run, ray_session):
    out = dedup_run["out"]
    before = pads.dataset(os.path.join(out, "corpus_dedup")).count_rows()
    # "kill": lose stage-A partition 2 + the final stage
    shutil.rmtree(os.path.join(out, "banded", "part=2"))
    os.remove(ckpt.manifest_path(out, 2))
    os.remove(ckpt.manifest_path(out, "final"))
    s = run_dedup_pipeline(dedup_run["root"], out, n_groups=4)
    assert s["partitions"] == [2]
    assert {0, 1, 3} <= set(s["resumed"])
    after = pads.dataset(os.path.join(out, "corpus_dedup")).count_rows()
    assert after == before


def test_regroup_invalidates_downstream(dedup_run, ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dedup_regroup"))
    s1 = run_dedup_pipeline(dedup_run["root"], out, n_groups=4)
    s2 = run_dedup_pipeline(dedup_run["root"], out, n_groups=2)
    assert s2["partitions"] == [0, 1]
    assert "final" not in s2["resumed"]
    assert sorted(os.listdir(os.path.join(out, "banded"))) == ["part=0", "part=1"]
    assert s2["kept_rows"] == s1["kept_rows"]


def test_all_unique_corpus_drops_nothing(ray_session, tmp_path_factory):
    """Zero near-dup pairs (the common case for a clean corpus): empty
    labels checkpoint, empty drop-list, corpus passes through intact."""
    import pyarrow as pa

    root = str(tmp_path_factory.mktemp("unique_docs"))
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(400)]
    t = pa.Table.from_pydict(
        {
            "doc_id": list(range(40)),
            "text": [
                " ".join(rng.choice(vocab, size=12, replace=False))
                for _ in range(40)
            ],
        }
    )
    pq.write_table(t, os.path.join(root, "docs.parquet"))
    out = str(tmp_path_factory.mktemp("unique_out"))
    s = run_dedup_pipeline(root, out, n_groups=1)
    assert s["dropped"] == 0
    assert s["kept_rows"] == 40


def test_param_change_invalidates_resume(dedup_run, ray_session, tmp_path_factory):
    """A rerun with a different threshold must recompute, not serve the
    old keep-list."""
    out = str(tmp_path_factory.mktemp("dedup_params"))
    s1 = run_dedup_pipeline(dedup_run["root"], out, n_groups=2, threshold=0.7)
    s2 = run_dedup_pipeline(dedup_run["root"], out, n_groups=2, threshold=0.95)
    assert s2["partitions"] == [0, 1]  # stage A recomputed (params changed)
    assert "final" not in s2["resumed"]
    assert s2["dropped"] <= s1["dropped"]  # stricter threshold drops fewer
