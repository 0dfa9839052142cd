"""End-to-end KG pipeline: triple P/R, span-sequence invariant, resume.

BASELINE.md targets: triple P/R ≥ 0.95 vs expected triples derived from
the reference-test templates; per-row span-sequence (kind, text,
media_ref, order) exact equality; resume from per-partition checkpoints.
"""

import os
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from rust_bert_ray.corpus import write_corpus
from rust_bert_ray.pipelines import checkpoint as ckpt
from rust_bert_ray.pipelines.kg import run_kg_pipeline

N_DOCS = 150


@pytest.fixture(scope="module")
def kg_run(ray_session, tmp_path_factory):
    corp = str(tmp_path_factory.mktemp("corpus"))
    out = str(tmp_path_factory.mktemp("kg_out"))
    docs_dir = write_corpus(corp, N_DOCS, shard_rows=50)
    summary = run_kg_pipeline(docs_dir, out, n_groups=2)
    return {"corp": corp, "docs_dir": docs_dir, "out": out, "summary": summary}


def _triple_sets(kg):
    tri = pads.dataset(os.path.join(kg["out"], "triples")).to_table()
    exp = pq.read_table(os.path.join(kg["corp"], "expected_triples.parquet"))
    got = set(
        zip(
            tri.column("doc_id").to_pylist(),
            tri.column("subj_canonical").to_pylist(),
            tri.column("pred").to_pylist(),
            tri.column("obj_canonical").to_pylist(),
        )
    )
    want = set(
        zip(
            exp.column("doc_id").to_pylist(),
            exp.column("subj").to_pylist(),
            exp.column("pred").to_pylist(),
            exp.column("obj").to_pylist(),
        )
    )
    return got, want


def test_triple_precision_recall(kg_run):
    got, want = _triple_sets(kg_run)
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_span_sequence_invariant(kg_run):
    """Output span sequence (kind, text, media_ref, order) == input, per row."""
    inp = pads.dataset(kg_run["docs_dir"]).to_table()
    out = pads.dataset(os.path.join(kg_run["out"], "docs_enriched")).to_table()
    in_spans = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in zip(
            inp.column("doc_id").to_pylist(), inp.column("spans").to_pylist()
        )
    }
    out_spans = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in zip(
            out.column("doc_id").to_pylist(), out.column("spans").to_pylist()
        )
    }
    assert in_spans == out_spans


def test_variant_surface_linked_to_canonical_node(kg_run):
    """ANN path end-to-end: "New York City" mentions land on the New York node."""
    tri = pads.dataset(os.path.join(kg_run["out"], "triples")).to_table()
    rows = tri.to_pylist()
    variants = [r for r in rows if r["subj"] == "New York City"]
    assert variants, "corpus should contain New York City mentions"
    assert all(r["subj_id"] == "ent:LOC:new_york" for r in variants)


def test_nodes_merge_aliases(kg_run):
    nodes = pads.dataset(os.path.join(kg_run["out"], "nodes")).to_table().to_pylist()
    by_id = {n["node_id"]: n for n in nodes}
    ny = by_id.get("ent:LOC:new_york")
    assert ny is not None
    assert "new york city" in ny["aliases"]
    assert ny["n_mentions"] >= 1
    # node ids are unique after canonicalization
    assert len(by_id) == len(nodes)


def test_edges_deduplicated(kg_run):
    edges = pads.dataset(os.path.join(kg_run["out"], "edges")).to_table().to_pylist()
    keys = [(e["subj_id"], e["pred"], e["obj_id"]) for e in edges]
    assert len(keys) == len(set(keys))
    assert all(e["n_obs"] >= 1 and len(e["doc_ids"]) >= 1 for e in edges)


def test_manifests_written(kg_run):
    parts = ckpt.completed_partitions(kg_run["out"])
    assert "0" in parts and "1" in parts and "final" in parts
    m = ckpt.read_manifest(kg_run["out"], 0)
    assert m["input_rows"] > 0
    assert m["output_rows"]["triples"] >= 0
    assert m["lineage"] and m["metrics"]["sec"] > 0


def test_resume_skips_completed_partitions(kg_run):
    summary2 = run_kg_pipeline(kg_run["docs_dir"], kg_run["out"], n_groups=2)
    assert summary2["partitions"] == []
    assert set(summary2["resumed"]) == {0, 1, "final"}


def test_kill_and_resume_recomputes_only_missing(kg_run, ray_session):
    """Simulate a mid-run kill: partition 1 + final results lost."""
    out = kg_run["out"]
    before = pads.dataset(os.path.join(out, "triples")).to_table()
    # "kill": partition 1 and the final stage never completed
    shutil.rmtree(os.path.join(out, "triples", "part=1"))
    os.remove(ckpt.manifest_path(out, 1))
    os.remove(ckpt.manifest_path(out, "final"))
    summary = run_kg_pipeline(kg_run["docs_dir"], out, n_groups=2)
    assert summary["partitions"] == [1]
    assert 0 in summary["resumed"]
    after = pads.dataset(os.path.join(out, "triples")).to_table()
    assert after.num_rows == before.num_rows
    assert ckpt.is_partition_complete(out, "final")


def test_resume_invalidates_on_input_change(kg_run, ray_session, tmp_path_factory):
    """A completed manifest from a DIFFERENT input grouping must not be
    silently reused — the partition recomputes."""
    out = str(tmp_path_factory.mktemp("kg_out_regroup"))
    summary1 = run_kg_pipeline(kg_run["docs_dir"], out, n_groups=2)
    assert summary1["partitions"] == [0, 1]
    # same output dir, different grouping → manifests reference stale files
    summary2 = run_kg_pipeline(kg_run["docs_dir"], out, n_groups=1)
    assert summary2["partitions"] == [0]
    assert summary2.get("invalidated") == [0]
    # orphaned part dirs from the old grouping must be gone: the stage-B
    # read would otherwise include part=1's triples twice
    assert sorted(os.listdir(os.path.join(out, "triples"))) == ["part=0"]
    # stage B must have re-run (not "resumed" off the stale final manifest)
    assert "final" not in summary2["resumed"]
    # nodes/edges must equal a from-scratch n_groups=1 run byte-for-value
    fresh = str(tmp_path_factory.mktemp("kg_out_fresh"))
    run_kg_pipeline(kg_run["docs_dir"], fresh, n_groups=1)

    def table_rows(root, table):
        rows = pads.dataset(os.path.join(root, table)).to_table().to_pylist()
        for r in rows:
            for k, v in list(r.items()):
                if isinstance(v, list):
                    r[k] = tuple(v)
        return sorted(map(tuple, (sorted(r.items()) for r in rows)))

    assert table_rows(out, "nodes") == table_rows(fresh, "nodes")
    assert table_rows(out, "edges") == table_rows(fresh, "edges")
