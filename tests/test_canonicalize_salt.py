"""Salt-invariance of canonicalization: the salted two-phase merge must
produce byte-identical nodes/edges for any salt (merges are
associative+commutative)."""

import pandas as pd
import pytest

from rust_bert_ray.corpus import write_corpus
from rust_bert_ray.pipelines.kg import extract_and_link
from rust_bert_ray.stages.canonicalize import build_edges, build_nodes


@pytest.fixture(scope="module")
def linked_ds(ray_session, tmp_path_factory):
    import ray.data

    corp = str(tmp_path_factory.mktemp("salt_corpus"))
    docs_dir = write_corpus(corp, 120, shard_rows=40)
    docs = ray.data.read_parquet(docs_dir, columns=["doc_id", "spans"])
    return extract_and_link(docs).materialize()


def _norm_nodes(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["aliases"] = df["aliases"].map(lambda a: tuple(a))
    return df.sort_values("node_id", ignore_index=True)


def _norm_edges(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["doc_ids"] = df["doc_ids"].map(lambda a: tuple(a))
    return df.sort_values("edge_id", ignore_index=True)


def test_nodes_salt_invariant(linked_ds):
    a = _norm_nodes(build_nodes(linked_ds, salt=1).to_pandas())
    b = _norm_nodes(build_nodes(linked_ds, salt=8).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_edges_salt_invariant(linked_ds):
    a = _norm_edges(build_edges(linked_ds, salt=1).to_pandas())
    b = _norm_edges(build_edges(linked_ds, salt=8).to_pandas())
    # doc_ids included: the min-cap sample (sorted before truncation at
    # every layer, round 5) is salt/batch/merge-order invariant
    a = a.assign(doc_ids=a["doc_ids"].map(tuple))
    b = b.assign(doc_ids=b["doc_ids"].map(tuple))
    pd.testing.assert_frame_equal(
        a[["edge_id", "subj_id", "pred", "obj_id", "n_obs", "score", "doc_ids"]],
        b[["edge_id", "subj_id", "pred", "obj_id", "n_obs", "score", "doc_ids"]],
    )
